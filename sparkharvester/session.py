"""SparkSession factory tuned for this engine.

Defaults chosen for correctness-parity with the DuckDB oracle (UTC
session timezone, ANSI off) and for scale (AQE on with skew-join
handling, shuffle partitions sized for the local test harness but
overridable for a real cluster via normal Spark conf).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkharvester",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/sparkharvester_warehouse"))
        # shuffle/spill to tmpfs: on a real cluster every executor brings
        # its own local NVMe, so shuffle bandwidth scales with executor
        # count; a single shared spinning disk would serialize local[N]
        # shuffles and misrepresent multi-executor scaling
        .config("spark.local.dir",
                os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table.

    Pins the session timezone to UTC: the testdata timestamps are
    timezone-naive (NTZ), and every time-based query must interpret
    them exactly like the DuckDB oracle does, regardless of how the
    caller built the session."""
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:  # noqa: BLE001 — unset/invalid on exotic sessions
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_spread(spark: SparkSession, sf_dir: str, name: str):
    """load() + repartition to the session's parallelism.

    The driver testdata tables are SINGLE parquet files with one row
    group, so Spark scans them as ONE partition — every downstream
    CPU-heavy stage (regex forests, keyword folds, shingling, pandas
    UDFs) would run on one core.  An explicit round-robin repartition
    of the few-MB input costs microseconds and unlocks all cores.  At
    100 TB this is a no-op concern: real tables have thousands of
    splits, and this repartition would simply be omitted (or bounded
    by `spark.sql.files.maxPartitionBytes`)."""
    df = load(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)
