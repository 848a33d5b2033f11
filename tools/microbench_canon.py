"""A/B microbench: canonicalize_expr variants on the bench frontier.

The frontier bench is canonicalization-dominated (codegen regex + a
per-token HOF lambda).  This times the current expression against
candidate variants on the same 2M-row synthetic frontier, alternating
passes in one JVM so host burstiness can't masquerade as a win.

Usage: python tools/microbench_canon.py [n_rows] [passes]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Column, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import synth_frontier  # noqa: E402
from sparkharvester.urlnorm import _SCHEME_RE, canonicalize_expr  # noqa: E402


def canon_v2(url: Column) -> Column:
    """LEGACY variant (regex token filter) — what canonicalize_expr used
    through round 3; kept as the A/B reference.  The shipped expr now
    uses the instr/length arithmetic form, equivalent on '&'-split
    tokens: first '=' at position ≥ 2 AND ≥ 1 char after it.
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    path_raw = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path_stripped = F.regexp_replace(path_raw, r"/+$", "")
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    query_raw = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query_raw, "&"),
        lambda t: t.rlike(r"^[^=&]+=.+$"),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    frontier = synth_frontier(spark, n)

    variants = {"current_instr": canonicalize_expr, "legacy_regex_tok": canon_v2}

    # equivalence gate first: variants must agree bit-exactly
    base, alt = (
        frontier.select(canonicalize_expr(F.col("url")).alias("c")),
        frontier.select(canon_v2(F.col("url")).alias("c")),
    )
    diff = base.exceptAll(alt).unionAll(alt.exceptAll(base)).limit(1).count()
    assert diff == 0, "variant output differs!"
    print("equivalence: OK")

    times: dict[str, list[float]] = {k: [] for k in variants}
    for p in range(passes):
        for name, fn in variants.items():
            t0 = time.monotonic()
            frontier.select(
                F.xxhash64(fn(F.col("url"))).alias("h")
            ).agg(F.expr("sum(h % 1000)")).collect()
            times[name].append(time.monotonic() - t0)
    for name, ts in times.items():
        ts_s = sorted(ts)
        med = ts_s[len(ts_s) // 2]
        print(f"{name}: median {med:.3f}s  urls/s {n/med:,.0f}  all "
              f"{[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
