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


# sf_dir the driver's correctness gate compares at; LAZY oracles (see
# Query.oracle) that must export data-dependent literals (the ANN
# recall shortlists) compute them against this directory.
# tools/compare.py points it at its own sf argument.
ORACLE_SF_DIR = "/root/testdata/sf0.01"


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    # str = static SQL; 0-arg callable = LAZY oracle, resolved when the
    # driver/compare asks for the SQL (for oracles that embed an
    # exported deterministic artifact, e.g. the ANN recall shortlist —
    # VERDICT r4 task #7); None = rows-only check.
    oracle: Optional[object] = None
    doc: str = ""
    bench: bool = False           # include in bench.py headline set

    def oracle_sql(self) -> Optional[str]:
        return self.oracle() if callable(self.oracle) else self.oracle


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, doc: str = "",
             bench: bool = False):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc,
                               bench=bench)
        return fn
    return wrap


# ---------------------------------------------------------------------------
# Attestation slate.
#
# The correctness driver records at most 50 rows per round, in the
# iteration order of __spark_entry__.queries().  With >50 registered
# queries, ORDER decides which queries get a driver-attested
# CORRECTNESS row, so we pin it explicitly instead of inheriting
# import order (VERDICT r4 task #1: seven r3-green queries plus the
# whole q_img family silently fell out of the window when new q_text
# entries were appended mid-chain).
#
# Policy (documented in STATUS.md "Attestation rotation"):
#   * ATTEST_FIRST — queries that MUST land inside the 50-row window
#     this round: never-attested entries, entries whose implementation
#     changed this round, and brand-new entries.
#   * ATTEST_PARKED — long-green, low-risk entries rotated OUT this
#     round; they re-enter the window next round so every query has a
#     driver row within a 2-round cycle.
#   * Everything else keeps registration order between the two lists.
# A test (tests/test_properties.py) asserts the two lists are disjoint,
# name every query exactly once or not at all, and that len(all) -
# len(parked) <= 50 whenever the registry exceeds the window.

ATTEST_WINDOW = 50

# Rotated to the FRONT for round 6: every query whose implementation
# the optimization round touched (the driver must re-attest the new
# plans produce identical results) PLUS all 27 entries parked in r5,
# which are due back under the 2-round rotation contract.
ATTEST_FIRST: list[str] = [
    # dedup family — fused shingle+sig Arrow pass, size-bounded verify,
    # CDC chunker/window rework (round-6 optimization)
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "dedup_components",
    "dedup_multimodal",
    "dedup_cdc_passages",
    # text/curation — fused language/quality scores UDF, seq input
    # caching, nondeterministic-UDF filter fixes
    "text_langid",
    "text_quality",
    "text_quality_buckets",
    "text_corpus_stats",
    "curate_sample",
    "curate_training_set",
    "curate_shards",
    "curate_final",
    "text_repetition",
    # intel/viz — lean ioc_total, shared threat frame
    "a4_risk_histogram",
    "a7_site_rollup",
    "viz_graph_layout",
    # url/sim/rel/crawl — scan spreading, shuffle-hash joins,
    # per-round crawl caching
    "x1_canonicalize",
    "f_url_filters",
    "x1_canonicalize_exact",
    "sim_cosine_topk",
    "rel_segment_revenue",
    "crawl_robots_precedence",
    "crawl_two_rounds",
    "crawl_three_rounds",
    "crawl_bfs",
    "crawl_metrics",
    "crawl_round_gates",
    "crawl_round_stats",
    "img_dup_pixel_verified",
    # continuation session: img_shards gained the adaptive window path
    # (seq.attach_grouped_prefix known_count) — touched, so re-attest
    "img_shards",
    # r5-parked, unchanged — due back this round (rotation contract)
    "a2_intel_summary",
    "a3_top_categories",
    "a6_distinct_sites",
    "d6_global_iocs",
    "o1_high_risk_topk",
    "x20_keyword_hits",
    "text_tokens",
    "text_fingerprint",
    "dedup_exact",
    "dedup_simhash",
    "rel_pricing_summary",
    "rel_brand_revenue",
    "rel_nation_revenue",
    "events_hourly",
    "x_ioc_extract",
    "events_sessions",
]

# Rotated OUT for round 6 (driver-green in r5 and untouched by the
# optimization round; due back in the round-7 window).
ATTEST_PARKED: list[str] = [
    "img_curate",
    "img_phash_components",
    "img_hamming_knn",
    "j1_left_outer",
    "u1_set_difference",
    "o6_recent_events",
    "d1_window_losers",
    "graph_pagerank",
    "dedup_embedding_pairs",
    "dedup_phash_hamming",
    "sim_ivf_recall",
    "sim_pq_recall",
    "crawl_robots_gate",
    "curate_domain_mix",
    "img_caption_spam",
    "rel_asof_join",
    "rel_range_join",
    "img_aspect_buckets",
    "curate_decontaminate_bloom",
    "audio_invariants",
    "curate_decontaminate",
    "sim_ivf_ann",
    "sim_ivf_exhaustive",
    "sim_pq_refine",
    "sim_pq_exhaustive",
    "rel_small_qty_revenue",
    "images_invariants",
    "crawl_priority_order",
]


def _slate_order(names: list[str]) -> list[str]:
    first = [n for n in ATTEST_FIRST if n in names]
    parked = [n for n in ATTEST_PARKED if n in names]
    middle = [n for n in names if n not in set(first) | set(parked)]
    return first + middle + parked


def all_queries() -> dict[str, Query]:
    # import side-effect modules lazily to avoid circular imports
    from . import (  # noqa: F401
        q_intel, q_text, q_dedup, q_sim, q_rel, q_url, q_crawl, q_more,
        q_img, q_viz,
    )
    return {n: REGISTRY[n] for n in _slate_order(list(REGISTRY))}
