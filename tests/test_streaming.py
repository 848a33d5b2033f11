"""Structured Streaming façade tests (SURVEY §2.11)."""
import shutil

from pyspark.sql import functions as F

from sparkharvester.streaming import stream_hourly_counts, stream_pages_foreachBatch


def test_stream_hourly_matches_batch(spark, sf_dir, tmp_path):
    """Streaming windowed agg over a static input == batch result."""
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")
    events_dir = str(events_dir)
    q = stream_hourly_counts(spark, events_dir, str(tmp_path / "ckpt"),
                             out_table="t_stream_hourly")
    q.awaitTermination(120)
    streamed = {
        (r["hour_epoch"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM t_stream_hourly").collect()
    }
    batch = {
        (r["hour_epoch"], r["event_type"]): r["n"]
        for r in spark.read.parquet(events_dir)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
                 "event_type")
        .agg(F.count("*").alias("n")).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_foreach_batch_callback(spark, sf_dir, tmp_path):
    """on_page_crawled analog: every row reaches the callback once."""
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", docs_dir / "part-0.parquet")
    docs_dir = str(docs_dir)
    seen = {"rows": 0, "batches": 0}

    def on_batch(df, epoch_id):
        seen["rows"] += df.count()
        seen["batches"] += 1

    q = stream_pages_foreachBatch(spark, docs_dir, str(tmp_path / "ck2"),
                                  on_batch)
    q.awaitTermination(120)
    assert seen["rows"] == spark.read.parquet(docs_dir).count()
    assert seen["batches"] >= 1
