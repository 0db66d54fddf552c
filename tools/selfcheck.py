#!/usr/bin/env python
"""Replicate the driver's correctness gate locally.

Runs every ``queries()`` entry at sf0.01 through Spark AND its
``oracle_sql()`` through DuckDB, then compares row count, sorted column
names, and an order-insensitive value multiset (floats canonicalized).

Usage: python tools/selfcheck.py [name ...]   (default: all)
Env:   SELFCHECK_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize float noise: 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def check_plans_fresh() -> bool:
    """PLANS.md staleness guard (same check as tests/test_plans.py).

    Run here too so a queries.py/bench edit can't pass a selfcheck
    without `python tools/dump_plans.py` having been re-run.
    """
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "tools"))
    from dump_plans import plans_source_hash

    try:
        with open(os.path.join(here, "PLANS.md")) as f:
            text = f.read()
    except OSError:
        print("WARN  PLANS.md missing — run `python tools/dump_plans.py`")
        return False
    m = re.search(r"Source-Hash: ([0-9a-f]+)", text)
    if not m or m.group(1) != plans_source_hash():
        print(
            "WARN  PLANS.md is STALE (queries.py/bench changed since last "
            "regen) — run `python tools/dump_plans.py` before committing"
        )
        return False
    return True


def main(names: list[str]) -> int:
    from adfs_spark.queries import EXPORTED, QUERIES
    from adfs_spark.session import get_spark

    plans_fresh = check_plans_fresh()
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    # default = the driver-facing EXPORTED 50 (the contract); --all adds
    # every standalone member query too
    if names == ["--all"]:
        selected = list(QUERIES)
    else:
        selected = names or list(EXPORTED)
    n_pass = n_fail = n_noracle = 0
    for name in selected:
        fn, sql = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"nosql {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sm = row_multiset([list(r) for r in srows], scols)
            dm = row_multiset(drows, dcols)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} FAIL, {n_noracle} rows-only")
    if not plans_fresh:
        print("PLANS.md STALE — run `python tools/dump_plans.py` (failing)")
    spark.stop()
    return 1 if (n_fail or not plans_fresh) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
