"""2-point scaling probe for the incremental seen-sketch (round 6,
VERDICT r5 task #2 "Done" criterion): show the per-round sketch cost
is FLAT in |seen| when only the round's delta is merged, vs the old
full rebuild whose cost grows with |seen|.

Usage: python tools/sketch_scaling.py
Prints one JSON line with per-size timings (median of 3).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sparkharvester.seen import build_bloom  # noqa: E402
from sparkharvester.session import get_spark  # noqa: E402

DELTA = 100_000          # per-round new-URL count (held constant)
SEENS = (1_000_000, 4_000_000)   # accumulated seen-set sizes
CAPACITY = 4 * SEENS[-1]


def med3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return sorted(ts)[1]


def main() -> None:
    spark = get_spark("sketch_scaling", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"delta": DELTA, "capacity": CAPACITY, "points": []}
    # fixed geometry, as the incremental path uses
    ref = build_bloom(spark.range(10).selectExpr("concat('w', id) k"),
                      "k", expected_items=CAPACITY)
    params = (ref.n_bits, ref.k)
    for n_seen in SEENS:
        seen = spark.range(n_seen).selectExpr("concat('u', id) AS k")
        delta = spark.range(n_seen, n_seen + DELTA) \
            .selectExpr("concat('u', id) AS k").coalesce(4)
        full_s = med3(lambda: build_bloom(seen, "k",
                                          expected_items=CAPACITY))
        delta_s = med3(lambda: build_bloom(delta, "k", expected_items=1,
                                           params=params))
        out["points"].append({
            "n_seen": n_seen,
            "full_rebuild_sec": round(full_s, 3),
            "delta_build_sec": round(delta_s, 3),
        })
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
