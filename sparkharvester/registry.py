"""Query registry — the single catalog behind __spark_entry__.queries().

Each entry pairs a Spark DataFrame builder with (optionally) an
equivalent DuckDB oracle SQL string.  Builders take (spark, sf_dir).
Entries without oracle SQL are non-SQL-expressible (iterative crawl,
UDF-exact ops) and get the driver's rows-only check.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None
    doc: str = ""
    bench: bool = False           # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "",
             bench: bool = False):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc,
                               bench=bench)
        return fn
    return wrap


def all_queries() -> dict[str, Query]:
    # import side-effect modules lazily to avoid circular imports
    from . import (  # noqa: F401
        q_intel, q_text, q_dedup, q_sim, q_rel, q_url, q_crawl, q_more,
        q_img,
    )
    return REGISTRY
