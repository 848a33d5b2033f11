"""Additional operator coverage (SURVEY §2: J1 left-outer, U1 set ops,
O6 recency sort, D1-as-window, embedding-cosine near-dup pairs)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .q_sim import _cosine, _cosine_sql
from .registry import register
from .session import load


# ---------------------------------------------------------------------------
# J1 — left outer join with missing-side handling (storage.py:127-133,
# visualizer.py:238-241: intel lookup may miss → "unknown" path)
# ---------------------------------------------------------------------------

@register(
    "j1_left_outer",
    oracle="""
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       coalesce(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 0.0)
         AS total_spend,
       CASE WHEN count(o.o_orderkey) = 0 THEN 'unknown' ELSE 'known' END AS status
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
    doc="left outer join, missing side -> 'unknown' (J1 semantics)",
)
def j1_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                / F.lit(100.0),
                F.lit(0.0),
            ).alias("total_spend"),
        )
        .withColumn(
            "status",
            F.when(F.col("n_orders") == 0, "unknown").otherwise("known"),
        )
    )


# ---------------------------------------------------------------------------
# U1 — set difference (crawler.py:294: invalid = all − valid)
# ---------------------------------------------------------------------------

@register(
    "u1_set_difference",
    oracle="""
SELECT doc_id FROM documents WHERE source = 'src0'
EXCEPT
SELECT doc_id FROM documents WHERE lang = 'en'
""",
    doc="set difference via EXCEPT / subtract (U1)",
)
def u1_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source") == "src0").select("doc_id")
        .subtract(d.filter(F.col("lang") == "en").select("doc_id"))
    )


# ---------------------------------------------------------------------------
# O6 — recency sort with deterministic tiebreak (README.md:337-340:
# ORDER BY crawled_at DESC)
# ---------------------------------------------------------------------------

@register(
    "o6_recent_events",
    oracle="""
SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch, event_type
FROM events ORDER BY ts DESC, event_id ASC LIMIT 20
""",
    doc="ORDER BY time DESC LIMIT k (O6 showcase sort)",
)
def o6_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(20)
        .select("event_id", F.unix_timestamp("ts").alias("ts_epoch"),
                "event_type")
    )


# ---------------------------------------------------------------------------
# D1 as a relational window: keep-first per content group, emit losers
# (the rows a dedup pass would DROP — complement of dedup_exact)
# ---------------------------------------------------------------------------

@register(
    "d1_window_losers",
    oracle="""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  -- deterministic duplicate injection: every 7th doc re-appears with a
  -- shifted id (the driver's documents table has no exact dups)
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id, winner FROM (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY sha256(text)) AS winner
  FROM docs
) t WHERE doc_id <> winner
""",
    doc="window keep-first dedup: rows that lose to an earlier duplicate (D1)",
)
def d1_window_losers(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    d = base.unionByName(dups).withColumn("h", F.sha2("text", 256))
    w = Window.partitionBy("h")
    return (
        d.withColumn("winner", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("winner"))
        .select("doc_id", "winner")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs (training-data pipeline op): pairwise
# within label buckets, bounded sample, threshold 0.95
# ---------------------------------------------------------------------------

@register(
    "graph_pagerank",
    oracle=None,  # iterative — verified vs a numpy oracle in tests/test_graph.py
    doc="PageRank over a synthetic host graph as an iterative DataFrame "
        "loop with per-iteration lineage truncation (J5/A8 extension)",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import host_edges_synthetic, pagerank

    edges = host_edges_synthetic(spark, n_hosts=100, fanout=3)
    return pagerank(edges, iterations=10).select(
        "node", F.round("rank", 8).alias("rank")
    )


_SIM_T = 0.3    # calibrated: max within-label cosine in the testdata ≈ 0.41
_SAMPLE = 400   # vec_id < _SAMPLE keeps the pair space bounded at any sf


@register(
    "dedup_embedding_pairs",
    oracle=f"""
WITH s AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < {_SAMPLE}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM s a JOIN s b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {_SIM_T}
""",
    doc=f"embedding-cosine near-dup pairs (label-bucketed, cos >= {_SIM_T})",
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _SAMPLE)
    a = e.alias("a")
    b = e.alias("b")
    cos = _cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= _SIM_T)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
    )
