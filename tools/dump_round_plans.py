#!/usr/bin/env python
"""Snapshot per-query `.explain("formatted")` output into plans/r<NN>/.

Usage: python tools/dump_round_plans.py <round> <suffix> [query ...]

Writes plans/r<round>/<query>_<suffix>.txt for each named query
(default: every BENCH_QUERIES + BENCH_EXTRAS entry).  The judge reads
these files to check plan claims (Exchange counts, join strategies,
PushedFilters) against the code, so they are committed verbatim.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    rnd, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from bench import BENCH_EXTRAS, BENCH_QUERIES

    from adfs_spark.queries import QUERIES
    from adfs_spark.session import get_spark

    if not names:
        names = BENCH_QUERIES + BENCH_EXTRAS
    spark = get_spark("dump-round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted) at {SF_DIR} [{suffix}]\n\n")
            f.write(plan)
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
