"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (per-site intelligence rollup, the
Spark equivalent of the reference's report aggregation pipeline,
report.py:562-580) over /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` — the full operator catalog from
sparkharvester.registry: one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline ops (dedup, similarity,
text analysis).  Entries without oracle SQL are non-SQL-expressible
(iterative BFS crawl, exact-urllib UDF, IVF ANN) and get the driver's
rows-only check; their semantics are verified against the Python
oracle in tests/ instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkharvester.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["a7_site_rollup"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query.

    Lazy oracles (registry.Query.oracle callables) resolve here: the
    ANN recall oracles export their deterministic shortlist as a
    VALUES CTE computed at registry.ORACLE_SF_DIR (= the driver's
    sf0.01 comparison directory)."""
    return {
        name: q.oracle_sql() for name, q in all_queries().items()
        if q.oracle
    }
