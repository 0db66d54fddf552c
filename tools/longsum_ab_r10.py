#!/usr/bin/env python
"""r10 A/B: the three money-sum routes on the q1 aggregation shape —
decimal (oracle form), plain scaled-long (under-gate route), and
"wide" (r10: scaled-long terms, decimal(30,0) accumulation — the
above-the-gate route that lifts the 64 GiB longsum gate).

Interleaved rounds, noop sink, value-equality asserted per round.

Usage: python tools/longsum_ab_r10.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from adfs_spark.catalog import load_table  # noqa: E402
from adfs_spark.queries import _dsum, _dsum4  # noqa: E402
from adfs_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def q1_shape(spark, route):
    li = load_table(spark, SF_DIR, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            F.col("l_shipdate")
            <= F.lit("2000-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty", longsum=route),
            _dsum("l_extendedprice", "sum_base_price", longsum=route),
            _dsum4(disc, "sum_disc_price", longsum=route),
            F.count("*").alias("n"),
        )
    )


def main() -> None:
    spark = get_spark("longsum-ab-r10")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    routes = [("decimal", False), ("long", True), ("wide", "wide")]
    times: dict[str, list[float]] = {k: [] for k, _ in routes}
    vals: dict[str, list] = {}
    for r in range(ROUNDS):
        for label, route in routes:
            spark.sparkContext.setJobDescription(f"longsum-ab {label} r{r}")
            df = q1_shape(spark, route)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[label].append(round(time.time() - t0, 3))
            if r == 0:
                vals[label] = sorted(map(tuple, df.collect()))
    assert vals["decimal"] == vals["long"] == vals["wide"], "values differ!"
    print("values identical across the three routes")
    for label in times:
        print(f"{label}: passes={times[label]} best={min(times[label]):.3f}")
    # plan dump of the wide route (what the forced-large gate produces)
    os.makedirs("plans/r10", exist_ok=True)
    txt = spark._sc._jvm.PythonSQLUtils.explainString(
        q1_shape(spark, "wide")._jdf.queryExecution(), "formatted"
    )
    with open("plans/r10/q1_longsum_wide_route.txt", "w") as f:
        f.write(txt)
    print("wide plan -> plans/r10/q1_longsum_wide_route.txt")


if __name__ == "__main__":
    main()
