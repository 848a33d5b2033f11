"""Graph analytics over the site→page / host-link tables (J5/A8 and
beyond).

The reference renders a site→page DiGraph (visualizer.py:204-244);
its analytic content (per-site hub attributes) is report.site_rollup.
This module adds the iterative-dataflow capability a crawl-analytics
engine needs at scale: PageRank as a pure DataFrame loop — the same
driver-coordinated iterative-batch shape as the BFS crawl (I1), with
snapshot-style lineage truncation via localCheckpoint.

Scale notes: each iteration is one join (ranks ⋈ edges on src — ranks
is small per host-graph, broadcast when ≤ threshold) + one groupBy sum.
Lineage is truncated every iteration, so 50 iterations cost 50 shuffles,
not an exponentially growing plan.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_edges_synthetic(spark, n_hosts: int = 100, fanout: int = 3,
                         seed: int = 42) -> DataFrame:
    """Deterministic host-level link graph (spark.range — lazy at any
    scale): host i links to (i*k + seed) % n for k in 1..fanout."""
    edges = None
    base = spark.range(n_hosts).select(F.col("id").alias("src"))
    for k in range(1, fanout + 1):
        e = base.select(
            "src",
            ((F.col("src") * (k + 1) + seed) % n_hosts).alias("dst"),
        )
        edges = e if edges is None else edges.unionByName(e)
    return edges.filter(F.col("src") != F.col("dst")).distinct()


def pagerank(edges: DataFrame, damping: float = 0.85,
             iterations: int = 15) -> DataFrame:
    """Standard PageRank with dangling-mass redistribution.

    Returns (node, rank); ranks sum to 1.
    """
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint()
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iterations):
        contribs = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left")
            .withColumn(
                "share",
                F.when(F.col("deg").isNotNull(), F.col("rank") / F.col("deg")),
            )
        )
        # dangling nodes spread their whole rank uniformly
        dangling = contribs.filter(F.col("deg").isNull()) \
                           .agg(F.coalesce(F.sum("rank"), F.lit(0.0))) \
                           .collect()[0][0]
        linked = (
            contribs.filter(F.col("deg").isNotNull())
            .select("node", "share")
            .join(edges, F.col("node") == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("in_mass"))
        )
        ranks = (
            nodes.join(linked, "node", "left")
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("in_mass"), F.lit(0.0))
                   + F.lit(dangling / n)),
            )
            .select("node", "rank")
        ).localCheckpoint()   # truncate lineage per iteration
    return ranks


def pagerank_numpy(edge_list: list[tuple[int, int]], n: int,
                   damping: float = 0.85, iterations: int = 15) -> list[float]:
    """Single-process oracle for tests (same update rule)."""
    import numpy as np

    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        new = np.full(n, (1.0 - damping) / n)
        dangling = rank[out_deg == 0].sum()
        new += damping * dangling / n
        for s, d in edge_list:
            new[d] += damping * rank[s] / out_deg[s]
        rank = new
    return rank.tolist()
