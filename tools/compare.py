"""Side-by-side Spark vs DuckDB oracle comparison (mirrors the driver).

Usage: python tools/compare.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys

import duckdb
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_df, sql: str, con) -> tuple[bool, str]:
    a = normalize(spark_df.toPandas())
    b = normalize(con.sql(sql).df())
    if len(a) != len(b):
        return False, f"rowcount {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # Be at least as strict as the driver: an int column on one side
        # and a float on the other (e.g. DuckDB HUGEINT -> float64 from a
        # windowed sum) is a type mismatch the driver's value-hash would
        # catch, so fail here instead of coercing through np.allclose.
        kinds = {av.dtype.kind, bv.dtype.kind}
        if kinds == {"i", "f"} or kinds == {"u", "f"}:
            return False, (f"col {c} dtype mismatch {av.dtype} vs {bv.dtype} "
                           "(int-vs-float; CAST the oracle)")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0,
                               equal_nan=True):
                bad = (av.astype(float) != bv.astype(float))
                i = bad[bad].index[0]
                return False, f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = neq[neq].index[0]
                return False, f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
    return True, f"OK ({len(a)} rows)"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    sys.path.insert(0, ".")
    from sparkharvester import registry
    from sparkharvester.registry import all_queries
    from sparkharvester.session import get_spark

    # lazy oracles (ANN recall) export their shortlist at the SAME sf
    # this comparison runs at
    registry.ORACLE_SF_DIR = sf_dir
    qs = all_queries()
    if not names:
        names = [n for n, q in qs.items() if q.oracle]
    spark = get_spark("compare", master="local[8]")
    con = duck_con(sf_dir)
    failures = 0
    for n in names:
        q = qs[n]
        if not q.oracle:
            print(f"{n}: (no oracle, rows={q.build(spark, sf_dir).count()})")
            continue
        try:
            ok, msg = compare(q.build(spark, sf_dir), q.oracle_sql(), con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        print(f"{n}: {'PASS' if ok else 'FAIL'} {msg}")
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
