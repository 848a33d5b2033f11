"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
BASELINE.json headline metric: frontier-processing throughput
(URLs/sec) over a large synthetic URL frontier (canonicalize →
xxhash64 → bloomless anti-join vs seen → per-host politeness window),
all in whole-stage-codegen expressions — no Python on the hot path.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "frontier_urls_per_sec": N, "frontier_urls": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkharvester.registry import all_queries  # noqa: E402
from sparkharvester.session import get_spark  # noqa: E402
from sparkharvester.urlnorm import canonicalize_expr, url_hash64  # noqa: E402


def synth_frontier(spark: SparkSession, n: int, n_hosts: int = 10_000):
    """N messy URLs, generated JVM-side (spark.range + expressions) —
    lazy at any scale, never materialized on the driver."""
    return spark.range(n).select(
        F.concat(
            F.lit("HTTP://"),
            F.rpad(F.translate((F.col("id") % n_hosts).cast("string"),
                               "0123456789", "abcdefghij"), 56, "q"),
            F.lit(".onion/Page/"),
            F.col("id").cast("string"),
            F.when(F.col("id") % 3 == 0, F.lit("?b=2&a=1&empty=")).otherwise(F.lit("")),
            F.when(F.col("id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
        (F.col("id") % n_hosts).alias("host_id"),
    )



def bench_frontier(spark: SparkSession, n: int = 2_000_000,
                   tokens_per_host: int = 200) -> dict:
    """One frontier round, measured: canonicalize + hash + seen
    anti-join + per-host politeness admission — codegen expressions +
    two shuffles (join, window).  The bloom/bucketed variant is
    bench_frontier_bloom (the 10^10 architecture; at bench scale the
    plain exact join is faster, which is exactly why the engine keeps
    the bloom optional)."""
    frontier = synth_frontier(spark, n).withColumn(
        "canon_url", canonicalize_expr(F.col("url"))
    ).withColumn("url_hash", url_hash64(F.col("canon_url")))
    seen = synth_frontier(spark, n // 2).select(
        url_hash64(canonicalize_expr(F.col("url"))).alias("url_hash")
    )
    tmp = f"/tmp/bench_seen_{os.getpid()}"
    seen.write.mode("overwrite").parquet(tmp)
    seen = spark.read.parquet(tmp)

    survivors = (
        frontier.join(seen, "url_hash", "left_anti")
        .withColumn(
            "admitted",
            F.row_number().over(
                Window.partitionBy("host_id").orderBy("canon_url")
            ) <= tokens_per_host,
        )
        .filter(F.col("admitted"))
    )
    # steady-state protocol (round 3): one untimed pass compiles the
    # whole-stage codegen and warms the JIT — one-time JVM cost, not
    # per-round crawl work — then the median of 3 timed passes.
    # BENCH_r02's 555k URLs/s was a single cold pass; the identical plan
    # runs ~1.6x faster warm (tools/microbench_canon.py shows the same
    # cold/warm split).  Per-pass samples ship in the JSON.
    n_out = survivors.count()
    passes = []
    for _ in range(3):
        t0 = time.monotonic()
        n_out = survivors.count()
        passes.append(time.monotonic() - t0)
    elapsed = sorted(passes)[len(passes) // 2]
    return {
        "frontier_urls": n,
        "frontier_survivors": n_out,
        "frontier_sec": round(elapsed, 3),
        "frontier_sec_passes": [round(p, 3) for p in passes],
        "frontier_urls_per_sec": round(n / elapsed, 1),
    }

def bench_round_fetch(spark: SparkSession, n: int = 400_000,
                      tokens_per_host: int = 200) -> dict:
    """Crawl-round throughput with the engine's REAL fetch stage
    (synth.make_fetch_stage — the deterministic stand-in whose per-URL
    cost models fetch+parse work).  Real crawls are fetch-dominated
    (the reference spends its entire wall clock inside requests.get,
    crawler.py:123-153), so this is the faithful job for the
    cluster-size throughput criterion: the fetch stage is an
    embarrassingly parallel mapInPandas over admitted URLs."""
    from sparkharvester.synth import FETCH_SCHEMA, SynthConfig, make_fetch_stage

    cfg = SynthConfig(n_hosts=10_000, pages_per_host=1000)
    fetch = make_fetch_stage(cfg)
    frontier = synth_frontier(spark, n).withColumn(
        "canon_url", canonicalize_expr(F.col("url"))
    ).withColumn("url_hash", url_hash64(F.col("canon_url")))
    seen = synth_frontier(spark, n // 2).select(
        url_hash64(canonicalize_expr(F.col("url"))).alias("url_hash")
    )
    tmp = f"/tmp/bench_seen_{os.getpid()}"
    seen.write.mode("overwrite").parquet(tmp)
    seen = spark.read.parquet(tmp)

    t0 = time.monotonic()
    admitted = (
        frontier.join(seen, "url_hash", "left_anti")
        .withColumn(
            "__adm",
            F.row_number().over(
                Window.partitionBy("host_id").orderBy("canon_url")
            ) <= tokens_per_host,
        )
        .filter(F.col("__adm"))
        .select("canon_url", F.lit(0).alias("seed_id"), F.lit(0).alias("depth"))
    )
    fetched = admitted.mapInPandas(fetch, FETCH_SCHEMA)
    n_links = (
        fetched.select(F.explode("hrefs").alias("href"))
        .select(url_hash64(F.col("href")).alias("h"))
        .distinct()
        .count()
    )
    elapsed = time.monotonic() - t0
    return {
        "fetch_round_urls": n,
        "fetch_round_new_links": n_links,
        "fetch_round_sec": round(elapsed, 3),
        "fetch_round_urls_per_sec": round(n / elapsed, 1),
    }


def bench_round(spark: SparkSession, n: int = 2_000_000,
                tokens_per_host: int = 200, fanout: int = 6) -> dict:
    """The FULL frontier round of SURVEY.md §4.4, measured end to end:

      canonicalize + xxhash64 (codegen) → seen anti-join → per-host
      politeness admission window → vectorized fetch + link extraction
      (Arrow-batched pandas, the north rule's "link-extraction …
      as vectorized pandas/Arrow UDFs") → explode → canonicalize →
      frontier-dedup distinct.

    This is the honest unit of crawl work per URL — the fetch/extract
    stage dominates, runs in parallel Python workers, and is what a
    1000-executor cluster spends its cores on.
    """
    import pandas as pd

    frontier = synth_frontier(spark, n).withColumn(
        "canon_url", canonicalize_expr(F.col("url"))
    ).withColumn("url_hash", url_hash64(F.col("canon_url")))
    seen = synth_frontier(spark, n // 2).select(
        url_hash64(canonicalize_expr(F.col("url"))).alias("url_hash")
    )
    tmp = f"/tmp/bench_seen_{os.getpid()}"
    seen.write.mode("overwrite").parquet(tmp)
    seen = spark.read.parquet(tmp)

    def fast_fetch(batches):
        """Vectorized synthetic fetch+extract: pandas str ops only."""
        for pdf in batches:
            base = pdf["canon_url"].str.extract(r"^(https?://[^/]+)",
                                                expand=False)
            page = pd.util.hash_pandas_object(pdf["canon_url"], index=False)
            text = "body of " + pdf["canon_url"] + " words " \
                + (page % 997).astype(str)
            cols = []
            for k in range(fanout):
                cols.append(base + "/Page/" + ((page + k) % 1000).astype(str)
                            + "?b=2&a=1")
            hrefs = pd.concat(cols, axis=1).to_numpy().tolist()
            yield pd.DataFrame({
                "canon_url": pdf["canon_url"],
                "text": text,
                "hrefs": hrefs,
            })

    admitted = (
        frontier.join(seen, "url_hash", "left_anti")
        .withColumn(
            "__adm",
            F.row_number().over(
                Window.partitionBy("host_id").orderBy("canon_url")
            ) <= tokens_per_host,
        )
        .filter(F.col("__adm"))
        .select("canon_url")
    )
    fetched = admitted.mapInPandas(
        fast_fetch, "canon_url string, text string, hrefs array<string>"
    )
    new_links = (
        fetched.select(F.explode("hrefs").alias("href"))
        .select(canonicalize_expr(F.col("href")).alias("link"))
        .select(url_hash64(F.col("link")).alias("link_hash"))
        .distinct()
    )
    # steady-state protocol (round 3): untimed warm-up pass, then the
    # median of 3 timed passes — same rationale as bench_frontier.
    n_links = new_links.count()
    passes = []
    for _ in range(3):
        t0 = time.monotonic()
        n_links = new_links.count()
        passes.append(time.monotonic() - t0)
    elapsed = sorted(passes)[len(passes) // 2]
    return {
        "round_urls": n,
        "round_new_links": n_links,
        "round_sec": round(elapsed, 3),
        "round_sec_passes": [round(p, 3) for p in passes],
        "round_urls_per_sec": round(n / elapsed, 1),
    }


def bench_frontier_bloom(spark: SparkSession, n: int = 2_000_000,
                         tokens_per_host: int = 200) -> dict:
    """One frontier round at the north-rule's 10^10-scale architecture:

      canonicalize + xxhash64 (codegen) → partitioned-bloom probe
      (broadcast bits, Arrow-vectorized) → definitely-unseen rows BYPASS
      the join → maybe-seen rows take an exact anti-join against a
      BUCKETED seen table (one-sided shuffle: the seen side is
      pre-clustered by url_hash, only the small maybe-seen side moves)
      → per-host politeness admission window.

    State prep (seen table, bloom build) is excluded from the timing —
    at steady state it is incremental (per-round deltas), not per-round
    work.  1/4 of the frontier overlaps the seen set (steady-state
    re-discovery rate; upstream distinct removes intra-round dups).
    """
    from sparkharvester.seen import bloom_probe_udf, build_bloom

    # -- state prep (untimed) -------------------------------------------------
    n_seen = n // 2
    seen = synth_frontier(spark, n_seen).select(
        url_hash64(canonicalize_expr(F.col("url"))).alias("url_hash")
    )
    spark.sql("DROP TABLE IF EXISTS bench_seen")
    # the in-memory catalog forgets tables between JVMs but the files
    # remain — clear the orphaned location
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    import shutil
    shutil.rmtree(os.path.join(wh, "bench_seen"), ignore_errors=True)
    (
        seen.write.mode("overwrite")
        .bucketBy(64, "url_hash").sortBy("url_hash")
        .saveAsTable("bench_seen")
    )
    seen_tbl = spark.table("bench_seen")
    bloom = build_bloom(seen_tbl, "url_hash", expected_items=n_seen, fpp=0.01)
    probe = bloom_probe_udf(spark, bloom)

    # frontier: ids [n_seen, n_seen + n) → first n_seen//2 overlap seen
    frontier = (
        spark.range(n_seen // 2, n_seen // 2 + n)
        .select(
            F.concat(
                F.lit("HTTP://"),
                F.rpad(F.translate((F.col("id") % 10_000).cast("string"),
                                   "0123456789", "abcdefghij"), 56, "q"),
                F.lit(".onion/Page/"),
                F.col("id").cast("string"),
                F.when(F.col("id") % 3 == 0, F.lit("?b=2&a=1&empty="))
                 .otherwise(F.lit("")),
                F.when(F.col("id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
            ).alias("url"),
            (F.col("id") % 10_000).alias("host_id"),
        )
    )

    # -- the measured round ----------------------------------------------------
    t0 = time.monotonic()
    hashed = frontier.withColumn(
        "canon_url", canonicalize_expr(F.col("url"))
    ).withColumn("url_hash", url_hash64(F.col("canon_url"))) \
     .withColumn("__maybe", probe(F.col("url_hash"))) \
     .cache()   # both branches below consume it; cache fill is timed
    unseen_fast = hashed.filter(~F.col("__maybe"))
    checked = hashed.filter(F.col("__maybe")) \
                    .join(seen_tbl, "url_hash", "left_anti")
    survivors = (
        unseen_fast.unionByName(checked)
        .withColumn(
            "admitted",
            F.row_number().over(
                Window.partitionBy("host_id").orderBy("canon_url")
            ) <= tokens_per_host,
        )
        .filter(F.col("admitted"))
    )
    n_out = survivors.count()
    elapsed = time.monotonic() - t0
    hashed.unpersist()
    return {
        "frontier_urls": n,
        "frontier_survivors": n_out,
        "frontier_sec": round(elapsed, 3),
        "frontier_urls_per_sec": round(n / elapsed, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    frontier_n = int(os.environ.get("SPARK_GRAFT_FRONTIER_N", "2000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM/codegen/python-worker spin-up out of the measurements
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # pre-spawn one Arrow python worker per core (~0.3s each, first use)
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s
    spark.range(cpus * 10_000).repartition(cpus) \
        .select(_warm(F.col("id"))).write.format("noop").mode("overwrite").save()
    # steady-state protocol (round 3): run EVERY headline query once at
    # the smallest available SF before timing, so each measurement is
    # the query's work — not its one-time whole-stage-codegen compile +
    # Python UDF import cost (~0.5-2s per distinct plan, belongs to no
    # query in particular; the same rationale as the frontier/round
    # warm-up passes).  Derived from the configured dir, not a
    # hardcoded path (ADVICE r2): fall back to sf_dir itself if the
    # sibling sf0.001 is absent.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    qs = {n: q for n, q in all_queries().items() if q.bench}
    # round-5 additions, timed identically but reported OUTSIDE the
    # headline set (VERDICT r4 #9: keep the 19-query set stable so
    # like-for-like deltas stay readable; new entries listed separately)
    extra_names = [
        "dedup_cdc_passages", "text_quality_buckets", "curate_domain_mix",
        "img_caption_spam", "rel_asof_join", "rel_range_join",
        "viz_graph_layout", "crawl_robots_precedence",
    ]
    extras = {n: all_queries()[n] for n in extra_names}
    for q in list(qs.values()) + list(extras.values()):
        q.build(spark, warm_dir).write.format("noop").mode("overwrite").save()

    def _time(group: dict) -> dict[str, float]:
        t: dict[str, float] = {}
        for name, q in sorted(group.items()):
            t0 = time.monotonic()
            q.build(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            t[name] = round(time.monotonic() - t0, 3)
        return t

    times = _time(qs)
    extra_times = _time(extras)

    fr = bench_frontier(spark, n=frontier_n)
    rd = bench_round(spark, n=frontier_n // 2)

    # crawl-engine throughput: full BFS rounds incl. fetch/dedup/caps
    from sparkharvester.frontier import CrawlConfig, run_crawl
    from sparkharvester.synth import SynthConfig, seed_urls

    synth = SynthConfig(n_hosts=100, pages_per_host=150, fanout=10)
    t0 = time.monotonic()
    eng = run_crawl(spark, seed_urls(synth), synth,
                    CrawlConfig(max_depth=2, max_pages=150, salt_buckets=16))
    crawl_sec = time.monotonic() - t0
    pops = sum(v for k, v in eng.stats.items() if k.startswith("pages"))
    crawl = {
        "crawl_sec": round(crawl_sec, 3),
        "crawl_pages": eng.stats["pages_crawled"],
        "crawl_pages_per_sec": round(eng.stats["pages_crawled"] / crawl_sec, 1),
        "crawl_pops_per_sec": round(pops / crawl_sec, 1),
    }

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline query time at sf + frontier-processing throughput",
        "value": total,
        "unit": "sec",
        "queries": times,
        "extra_queries": extra_times,
        "extra_total_sec": round(sum(extra_times.values()), 3),
        "sf": sf,
        **fr,
        **rd,
        **crawl,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
