"""CLI / spark-submit entry point (S5, §3.1 lifecycle).

Mirrors the reference's flagship CLI path (cli.py:183-361): config →
crawl → intelligence → persist (parquet+json+csv) → report, as one
Spark application.  Run with

    spark-submit --py-files sparkharvester.zip -m sparkharvester.cli ...
or  python -m sparkharvester.cli --hosts 5 --max-depth 2 --out /tmp/out

The ``--cpus`` flag sets local[N] parallelism — the sandbox evidence
path for the north rule's N vs 4N executor scaling (BENCH/BASELINE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sparkharvester")
    p.add_argument("--hosts", type=int, default=3)
    p.add_argument("--pages-per-host", type=int, default=40)
    p.add_argument("--max-depth", type=int, default=2)
    p.add_argument("--max-pages", type=int, default=20)
    p.add_argument("--crawl-delay", type=float, default=7.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bloom", action="store_true")
    p.add_argument("--host-tokens", type=int, default=None)
    p.add_argument("--resume", default=None, help="snapshot root to resume from")
    p.add_argument("--out", default="results")
    p.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    p.add_argument("--report", action="store_true", help="render HTML report")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from .frontier import CrawlConfig, run_crawl
    from .report import analyze_pages, build_aggregates, render_html
    from .session import get_spark
    from .storage import save_all
    from .synth import SynthConfig, seed_urls

    # only stop the session on exit if WE created it (embedders/tests may
    # pass in a live session via getOrCreate reuse)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("sparkharvester", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    synth = SynthConfig(n_hosts=args.hosts, pages_per_host=args.pages_per_host,
                        seed=args.seed)
    cfg = CrawlConfig(
        max_depth=args.max_depth, max_pages=args.max_pages,
        crawl_delay=args.crawl_delay, use_bloom=args.bloom,
        host_tokens_per_round=args.host_tokens,
        checkpoint_dir=os.path.join(args.out, "snapshots"),
    )
    t0 = time.monotonic()
    eng = run_crawl(spark, seed_urls(synth), synth, cfg,
                    resume_from=args.resume)
    elapsed = time.monotonic() - t0

    os.makedirs(args.out, exist_ok=True)
    enriched = analyze_pages(eng.pages)
    paths = save_all(eng.pages, args.out)
    if args.report:
        aggs = build_aggregates(enriched)
        paths["report"] = render_html(
            aggs, os.path.join(args.out, "report.html"))

    summary = {
        "elapsed_sec": round(elapsed, 3),
        "rounds": eng.rounds,
        "stats": eng.stats,
        "pages_per_sec": round(eng.stats["pages_crawled"] / max(elapsed, 1e-9), 2),
        "outputs": paths,
        "snapshots": eng.store_root,
        "cpus": args.cpus,
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
