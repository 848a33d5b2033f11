"""Dump one query's explain("formatted") to a file (r06 evidence).

Usage: python tools/plan_dump.py <out_file> <query> [sf_dir] [repo_root]

Run from any checkout: pass repo_root to point at a different tree
(e.g. a git worktree of the round-start commit for the *_before.txt
captures).
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout


def main() -> None:
    out_file, name = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    root = sys.argv[4] if len(sys.argv) > 4 else "."
    sys.path.insert(0, root)
    from sparkharvester.registry import all_queries
    from sparkharvester.session import get_spark

    spark = get_spark("plan_dump", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    df = all_queries()[name].build(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(out_file, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_file}")
    spark.stop()


if __name__ == "__main__":
    main()
