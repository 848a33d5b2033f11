"""Behavioral tests for the events-table as-of join and range join.

The DuckDB oracles check these at testdata scale; here the PINNED edge
semantics are exercised on a constructed events table:

* as-of: a view AT the click's own timestamp matches; same-(user, ts)
  view ties resolve to the max event_id; a click with no prior view
  survives null-extended.
* range join: the interval is (err, err+600s] — a click exactly at the
  error's ts is out, exactly at +600 s is in, one microsecond past is
  out; an error whose bucket-mates are all out of range must still
  emit its zero-count row (the join-condition-vs-post-filter
  regression); a match in the interval's SECOND time bucket is found.
"""
from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkharvester.registry import all_queries


def _ts(h, m, s, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rows = [
        # --- as-of fixtures (users 1-2) ---
        (1, _ts(10, 0, 0), 1, "view", 1.0),
        (2, _ts(10, 5, 0), 1, "view", 2.0),
        (3, _ts(10, 5, 0), 1, "view", 3.0),   # same-ts tie: max id wins
        (4, _ts(10, 5, 0), 1, "click", 0.0),  # same-ts view must match
        (5, _ts(10, 1, 0), 1, "click", 0.0),  # plain most-recent-prior
        (6, _ts(10, 0, 0), 2, "click", 0.0),  # no view at all
        # --- range-join fixtures (users 3-5) ---
        (7, _ts(11, 0, 0), 3, "error", 0.0),
        (8, _ts(11, 0, 0), 3, "click", 8.0),          # == err ts: OUT
        (9, _ts(11, 10, 0), 3, "click", 9.0),         # exactly +600 s: IN
        (10, _ts(11, 10, 0, 1), 3, "click", 10.0),    # +600 s + 1 us: OUT
        (11, _ts(11, 5, 0), 3, "click", 11.0),        # interior: IN
        (12, _ts(11, 0, 0), 4, "error", 0.0),
        (13, _ts(11, 11, 40), 4, "click", 13.0),      # +700 s: OUT — but
        #   the error's zero-count row must still exist (regression:
        #   a post-join range filter would delete the error entirely)
        (14, _ts(11, 9, 59), 5, "error", 0.0),
        (15, _ts(11, 19, 58), 5, "click", 15.0),      # IN, and lands in
        #   the NEXT 600 s bucket — exercises the 2-bucket explode
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("rel_events")
    pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))
    return str(d)


def test_asof_join_semantics(spark, events_dir):
    out = all_queries()["rel_asof_join"].build(spark, events_dir).collect()
    by_click = {r["click_id"]: r for r in out}
    # one output row per click, including the range-join fixture clicks
    # (users 3-5, who have no views -> null-extended)
    assert {4, 5, 6} <= set(by_click)
    for cid in set(by_click) - {4, 5, 6}:
        assert by_click[cid]["view_id"] is None
    assert by_click[4]["view_id"] == 3          # same-ts, max-id tie rule
    assert by_click[4]["view_value"] == 3.0
    assert by_click[5]["view_id"] == 1          # most recent prior view
    assert by_click[6]["view_id"] is None       # no view: null-extended
    assert by_click[6]["view_value"] is None


def test_range_join_semantics(spark, events_dir):
    out = all_queries()["rel_range_join"].build(spark, events_dir).collect()
    by_err = {r["error_id"]: r for r in out}
    assert set(by_err) == {7, 12, 14}
    # (err, err+600]: id 8 (== ts) and id 10 (+600 s + 1 us) excluded,
    # id 9 (exactly +600 s) and id 11 included
    assert by_err[7]["n_clicks"] == 2
    assert by_err[7]["click_value"] == pytest.approx(20.0)
    # all candidate clicks out of range -> zero row, NOT a missing row
    assert by_err[12]["n_clicks"] == 0
    assert by_err[12]["click_value"] is None
    # the in-range click sits in the interval's second time bucket
    assert by_err[14]["n_clicks"] == 1
    assert by_err[14]["click_value"] == pytest.approx(15.0)
