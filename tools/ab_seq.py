"""Interleaved A/B for the crawl-path finalization (VERDICT r2 #2).

Round 2 attached the canonical ``seq`` with an EAGER
``localCheckpoint`` + a counts job + a renumber pass even when the
crawl output is tiny (seq.py scalable path); round 3 added a
small-output fast path (plain global window, lazy).  This tool
attributes the observed crawl-throughput delta by running the SAME
crawl workload with both shapes in alternating passes in one JVM:

    A = scalable path forced (SEQ_WINDOW_THRESHOLD := -1, the r2 shape)
    B = fast path (default threshold, the r3 shape)

Each run materializes ``pages`` (noop write), so both arms pay their
full finalization cost — A eagerly inside run_crawl, B lazily at the
write.  Prints one JSON line with per-pass samples + medians.

Usage: python tools/ab_seq.py [passes] (default 3)
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from sparkharvester import seq  # noqa: E402
from sparkharvester.frontier import CrawlConfig, run_crawl  # noqa: E402
from sparkharvester.session import get_spark  # noqa: E402
from sparkharvester.synth import SynthConfig, seed_urls  # noqa: E402

SYNTH = SynthConfig(n_hosts=100, pages_per_host=150, fanout=10)  # == bench.py
CFG = dict(max_depth=2, max_pages=150, salt_buckets=16)


def run_once(spark, force_scalable: bool) -> tuple[float, int]:
    default = seq.SEQ_WINDOW_THRESHOLD
    if force_scalable:
        seq.SEQ_WINDOW_THRESHOLD = -1
    try:
        t0 = time.monotonic()
        eng = run_crawl(spark, seed_urls(SYNTH), SYNTH, CrawlConfig(**CFG))
        eng.pages.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0, eng.stats["pages_crawled"]
    finally:
        seq.SEQ_WINDOW_THRESHOLD = default


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_seq", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, False)  # warmup (codegen, python workers)

    a_times, b_times, pages = [], [], None
    for _ in range(passes):
        ta, pa = run_once(spark, True)
        tb, pb = run_once(spark, False)
        assert pa == pb, "arms crawled different page counts"
        pages = pa
        a_times.append(round(ta, 3))
        b_times.append(round(tb, 3))

    med_a, med_b = statistics.median(a_times), statistics.median(b_times)
    print(json.dumps({
        "workload": "bench.py crawl (100 hosts x 150 pages, depth 2)",
        "pages_crawled": pages,
        "passes": passes,
        "r2_shape_scalable_seq_sec": a_times,
        "r3_shape_window_seq_sec": b_times,
        "median_r2_shape": round(med_a, 3),
        "median_r3_shape": round(med_b, 3),
        "speedup_r3_over_r2": round(med_a / med_b, 3),
        "pages_per_sec_r2_shape": round(pages / med_a, 1),
        "pages_per_sec_r3_shape": round(pages / med_b, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
