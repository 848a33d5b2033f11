"""Structured Streaming façade (SURVEY.md §2.11).

The reference's crawl loop is a long-running imperative process with an
``on_page_crawled`` callback (crawler.py:96,252-253) and periodic
maintenance.  The rebuild is batch-first (BFS parity needs a round
barrier), but exposes the streaming shape Spark users expect:

 - ``stream_hourly_counts``: file-source readStream over an events
   directory → event-time tumbling window + watermark (late-data
   handling the reference never had) → sink;
 - ``stream_pages_foreachBatch``: the ``on_page_crawled`` analog — a
   foreachBatch hook receiving each micro-batch of crawl results, e.g.
   to run intel scoring incrementally.

Both run with ``Trigger.AvailableNow`` in tests (bounded, exactly-once
over the existing files) and would run continuously against a real
source (Kafka/files) unchanged.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    out_table: str = "stream_hourly",
    watermark: str = "2 hours",
):
    """Windowed streaming agg: count+sum per (1h window, event_type).

    Late rows beyond the watermark are dropped — the streaming analog
    of the batch events_hourly query (same results on a static input).
    """
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        # parquet NTZ timestamps -> event-time type (watermark requires it)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch"),
            "event_type", "n", "total_value",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q


def stream_pages_foreachBatch(
    spark: SparkSession,
    pages_dir: str,
    checkpoint: str,
    on_batch: Callable[[DataFrame, int], None],
):
    """on_page_crawled analog (crawler.py:252-253): invoke *on_batch*
    with every micro-batch of newly committed crawl results."""
    schema = spark.read.parquet(pages_dir).schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q
