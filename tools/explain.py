"""Dump formatted physical plans for the headline queries → PLANS.md.

Review checklist per plan (SURVEY.md §4.2):
 - parquet scans show PushedFilters / pruned ReadSchema;
 - small dims join as BroadcastHashJoin, big joins as SMJ/AQE;
 - WholeStageCodegen spans cover the expression pipeline;
 - aggregations are partial (map-side combine) before the shuffle.
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from sparkharvester.registry import all_queries  # noqa: E402
from sparkharvester.session import get_spark  # noqa: E402

# round-5 bench extras (bench.py extra_names): timed outside the
# 19-query headline set but plan-audited here alongside it
BENCH_EXTRAS = {
    "dedup_cdc_passages", "text_quality_buckets", "curate_domain_mix",
    "img_caption_spam", "rel_asof_join", "rel_range_join",
    "viz_graph_layout", "crawl_robots_precedence",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark("explain", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = ["# PLANS — formatted physical plans for headline queries\n"]
    for name, q in sorted(qs.items()):
        if names and name not in names:
            continue
        if not names and not q.bench and name not in BENCH_EXTRAS:
            continue
        df = q.build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue()}\n```\n")
    if names:
        # ad-hoc inspection: print, don't clobber the full PLANS.md
        print("".join(out))
    else:
        with open("PLANS.md", "w") as f:
            f.write("".join(out))
        print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
