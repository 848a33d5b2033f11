"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

 - ``sim_cosine_topk`` — brute-force cosine top-k vs a pivot query
   vector, with a DuckDB oracle.  Dot products are computed as an
   explicit LEFT FOLD in index order on BOTH engines so doubles are
   bit-identical (IEEE ops are deterministic given operand order).
 - ``sim_ivf_ann`` — IVF-style bucketed ANN: per-label pivot vectors
   (embedding of min vec_id per label) act as centroids; each vector is
   assigned to its nearest pivot, and the query searches only its own
   bucket.  The scale path: at 10^9 vectors the bucket assignment is a
   broadcast join against K pivots (tiny), and search fans to one
   bucket — a partition-pruned scan instead of a full sweep.

Scale notes: brute force is scan + codegen fold + top-k (TakeOrdered,
no full sort).  No shuffle except the final k-row collect.  IVF adds
one broadcast join; never a shuffle of the big side.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .session import load

DIM = 64
TOP_K = 20


def _fold_sum(arr: Column) -> Column:
    """Left fold with 0.0 init — matches DuckDB list_reduce (0.0 + x == x)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = _fold_sum(F.zip_with(ad, bd, lambda x, y: x * y))
    na = F.sqrt(_fold_sum(F.transform(ad, lambda x: x * x)))
    nb = F.sqrt(_fold_sum(F.transform(bd, lambda x: x * x)))
    return dot / (na * nb)


def _cosine_sql(a: str, b: str) -> str:
    dot = (f"list_reduce(list_transform(generate_series(1, {DIM}), "
           f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)")
    na = (f"sqrt(list_reduce(list_transform(generate_series(1, {DIM}), "
          f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (x, y) -> x + y))")
    nb = (f"sqrt(list_reduce(list_transform(generate_series(1, {DIM}), "
          f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y))")
    return f"({dot}) / (({na}) * ({nb}))"


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1
)
SELECT vec_id, round({_cosine_sql('embedding', 'qv')}, 6) AS cos_sim
FROM embeddings, q
WHERE vec_id <> (SELECT min(vec_id) FROM embeddings)
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {TOP_K}
""",
    doc=f"brute-force cosine top-{TOP_K} vs pivot vector (ANN baseline)",
    bench=True,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    pivot = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = F.lit([float(x) for x in pivot["embedding"]])
    return (
        emb.filter(F.col("vec_id") != int(pivot["vec_id"]))
        .select(
            "vec_id",
            F.round(_cosine(F.col("embedding"), qv), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "sim_ivf_ann",
    oracle=None,  # iterative pivot assignment — rows-only check
    doc="IVF-bucketed ANN: nearest-pivot bucket assignment + in-bucket top-k",
)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # per-label pivots: embedding of min vec_id per label (deterministic,
    # order-independent — unlike a float-sum centroid)
    w = F.row_number().over(Window.partitionBy("label").orderBy("vec_id"))
    pivots = (
        emb.withColumn("rn", w).filter(F.col("rn") == 1)
        .select(F.col("label").alias("p_label"), F.col("embedding").alias("p_emb"))
    )
    # assign every vector to its nearest pivot (broadcast join vs K pivots)
    joined = emb.join(F.broadcast(pivots)).withColumn(
        "sim", _cosine(F.col("embedding"), F.col("p_emb"))
    )
    best = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("p_label"))
    )
    assigned = joined.withColumn("rn", best).filter(F.col("rn") == 1) \
                     .select("vec_id", "label", "embedding",
                             F.col("p_label").alias("bucket"))
    # query = pivot of bucket 0; search only bucket 0 (the IVF probe)
    q = assigned.filter(F.col("bucket") == 0) \
                .orderBy("vec_id").limit(1).collect()
    if not q:
        return assigned.limit(0).select("vec_id", F.lit(0.0).alias("cos_sim"))
    qv = F.lit([float(x) for x in q[0]["embedding"]])
    return (
        assigned.filter((F.col("bucket") == 0) & (F.col("vec_id") != int(q[0]["vec_id"])))
        .select("vec_id",
                F.round(_cosine(F.col("embedding"), qv), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )
