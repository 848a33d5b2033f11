"""RFC 9309 robots.txt matching (Allow/Disallow precedence).

The reference only has a static blacklist (extractor.py:40-43); the
north rule's robots gate previously modelled multi-rule Disallow
prefix sets (any-match).  This module upgrades the gate to real RFC
9309 §2.2.2 semantics:

 - a rule is ``(pattern, allow)``; patterns support ``*`` wildcards
   and a trailing ``$`` end-of-path anchor, otherwise prefix match;
 - among MATCHING rules the longest pattern (octet length of the raw
   pattern string, wildcards included — the common crawler convention)
   wins;
 - on a length tie the LEAST RESTRICTIVE rule (Allow) wins;
 - no matching rule → allowed.

The same precedence is expressed three ways that must agree:
``decide_blocked`` (pure-Python reference used by tests and the
oracle generator), ``attach_robots_blocked`` (the Spark gate used by
frontier.py), and q_crawl.crawl_robots_precedence's DuckDB oracle.
All three reduce the winner selection to one integer:
``score = 2 * len(pattern) + int(allow)`` over matching rules —
``max(score)`` picks longest-then-allow, and the page is blocked iff
a rule matched and the max score is even (winner was a Disallow).
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_regex(pattern: str) -> str:
    """Translate an RFC 9309 path pattern into an anchored regex that
    behaves identically under Java regex (Spark RLIKE) and RE2
    (DuckDB regexp_matches): only literal escapes, ``.*`` and anchors
    are emitted."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    body = ".*".join(re.escape(part) for part in core.split("*"))
    return "^" + body + ("$" if anchored else "")


def normalize_rules(rules) -> list[tuple[str, bool]]:
    """Accept a mixed list of ``str`` (legacy Disallow prefix) and
    ``(pattern, allow)`` tuples; return uniform tuples."""
    out = []
    for r in rules:
        if isinstance(r, str):
            out.append((r, False))
        else:
            pattern, allow = r
            out.append((str(pattern), bool(allow)))
    return out


def rule_score(pattern: str, allow: bool) -> int:
    return 2 * len(pattern) + int(allow)


def decide_blocked(path: str, rules) -> bool:
    """Pure-Python reference decision (tests + oracle generation)."""
    best = None
    for pattern, allow in normalize_rules(rules):
        if re.search(rule_regex(pattern), path):
            s = rule_score(pattern, allow)
            best = s if best is None else max(best, s)
    return best is not None and best % 2 == 0


def add_regex_column(rules_table: DataFrame) -> DataFrame:
    """Attach the translated regex to a (host, pattern, allow) rules
    table.  The table is host-sized (one row per robots rule), so the
    Arrow pass is off the candidate hot path; NULL patterns (empty-
    robots cache sentinels) stay NULL."""
    @F.pandas_udf("string")
    def _rx(p: pd.Series) -> pd.Series:
        return p.map(lambda x: rule_regex(x) if x is not None else None)

    return rules_table.withColumn("regex", _rx(F.col("pattern")))


def match_score() -> Column:
    """Per-(candidate, rule) score column over the attached
    ``__robots_path``/``pattern``/``regex``/``allow`` columns: NULL
    when the rule does not match (or the host has no rules), else
    2*len(pattern)+allow.  ``max`` over this column ignores NULLs, so
    the grouped winner is exactly RFC 9309 longest-match with Allow
    tie-break."""
    # rlike with a column pattern needs the expression form
    # (Column.rlike only takes a literal string in the Python API)
    matched = F.col("pattern").isNotNull() & F.expr(
        "__robots_path rlike regex"
    )
    return F.when(
        matched,
        F.length("pattern") * 2 + F.col("allow").cast("int"),
    )


def attach_robots_blocked(
    cand: DataFrame, rules_table: DataFrame, path_col: Column,
    group_cols: list[str],
) -> DataFrame:
    """Broadcast-join the host-keyed rules table onto the candidate
    set and reduce to one ``robots_blocked`` decision per candidate.

    Shape at 100 TB: the rules table is |hosts·rules|-sized (tiny next
    to the frontier), so the join is a broadcast hash join with no
    shuffle of the candidate side; the groupBy re-aggregates on the
    candidate key, which the planner collapses onto the same exchange
    the downstream fetch repartition needs anyway."""
    rules = add_regex_column(rules_table)
    return (
        cand.withColumn("__robots_path", path_col)
        .join(F.broadcast(rules), "host", "left")
        .withColumn("__robots_score", match_score())
        .groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.max("__robots_score") % 2 == 0, F.lit(False)
            ).alias("robots_blocked")
        )
    )
