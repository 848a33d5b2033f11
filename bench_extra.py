"""Round-6 optimization micro-bench (guide §1.4): time individual
registered queries in isolation with the noop sink, after the same
warm-up protocol bench.py uses (sf0.001 build of each timed query to
compile codegen / spin Python workers).

Usage:
  python bench_extra.py [sf_dir] [query ...]        # default: bench set
  SPARK_GRAFT_CPUS=32 python bench_extra.py /root/testdata/sf1.0 \
      dedup_lsh_verified curate_final

Prints one JSON line {"sf_dir":..., "queries": {name: [s1, s2, s3]}} —
three timed passes per query so spread is visible.  bench.py itself is
FROZEN (driver contract); this file exists so optimization evidence
can cite isolated numbers without touching it.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from sparkharvester.registry import all_queries  # noqa: E402
from sparkharvester.session import get_spark  # noqa: E402

PASSES = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    names = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    if not names:
        names = sorted(n for n, q in qs.items() if q.bench)

    # warm-up (same rationale as bench.py): codegen compile + Python
    # worker spin-up out of the measurements
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for n in names:
        qs[n].build(spark, warm_dir).write.format("noop") \
            .mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for n in names:
        passes = []
        for _ in range(PASSES):
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.monotonic()
            qs[n].build(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            passes.append(round(time.monotonic() - t0, 3))
        out[n] = passes
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
