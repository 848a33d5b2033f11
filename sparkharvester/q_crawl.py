"""Crawl-engine queries for the driver contract (rows-only checks —
iterative BFS is not SQL-expressible; parity is proven by the pytest
oracle suite, tests/test_crawl_parity.py)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frontier import CrawlConfig, run_crawl
from .images import check_invariants, make_images_df
from .registry import register
from .synth import SynthConfig, seed_urls

_SYNTH = SynthConfig(n_hosts=4, pages_per_host=20)
_CFG = CrawlConfig(max_depth=2, max_pages=15)
_MEMO: dict[str, object] = {}
_MEMO_CAP = 4


def _crawl(spark: SparkSession):
    # memoized per session: crawl_bfs and crawl_metrics share one run.
    # Keyed by applicationId (stable for a live session, never reused the
    # way id() can be after GC — ADVICE r1) and capped so a long-lived
    # driver process can't grow it unboundedly.
    key = spark.sparkContext.applicationId
    if key not in _MEMO:
        if len(_MEMO) >= _MEMO_CAP:
            _MEMO.clear()
        _MEMO[key] = run_crawl(spark, seed_urls(_SYNTH), _SYNTH, _CFG)
    return _MEMO[key]


@register(
    "crawl_bfs",
    oracle=None,
    doc="full BFS crawl over the seeded synthetic host graph (I1-I7); "
        "oracle-parity proven in tests/test_crawl_parity.py",
    bench=False,
)
def crawl_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _crawl(spark).pages.select(
        "seed_id", "url", "title", "content_hash", "depth",
        "links_found", "site", "seq",
    )


@register(
    "crawl_metrics",
    oracle=None,
    doc="per-round lineage/metrics rollup from the crawl (CrawlStats analog)",
)
def crawl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _crawl(spark)
    return eng.metrics.groupBy("run_id", "round").agg(
        F.sum("pages_crawled").alias("pages_crawled"),
        F.sum("pages_failed").alias("pages_failed"),
        F.sum("pages_skipped").alias("pages_skipped"),
        F.sum("pages_deduplicated").alias("pages_deduplicated"),
        F.countDistinct("partition_id").alias("n_partitions"),
    )


@register(
    "images_invariants",
    oracle=None,
    doc="image+caption payload invariants (input_hint): decoded-pixel "
        "equality, PSNR>=40dB, caption byte-equality, phash reproducibility",
)
def images_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = make_images_df(spark, n=64)
    return check_invariants(imgs)
