"""SQL surface parity — the reference's query surface is rendered SQL
(DatabaseExecutorForMysqlClient.findInternal :83-120); the engine's is
the DataFrame API.  This module proves the two surfaces are the same
engine: every fixture table is registered as a temp view
(catalog.register_views) and a representative slice of the §2 suite is
re-run through ``spark.sql(...)`` — using the query's own oracle SQL,
ported only where the DuckDB dialect diverges — and frame-compared
against the DataFrame form.

A user of the reference can therefore keep writing SQL: the oracle
strings in queries.py double as the engine's SQL entry points.
"""

from __future__ import annotations

import math
import re

import pytest

import adfs_spark.queries as Q
from tests.conftest import SF_DIR

# Queries whose oracle SQL runs on Spark after mechanical dialect
# porting (strftime→date_format).  One per §2 family: scans/predicates,
# pagination, joins (fk/broadcast/semi), argmax, aggregates, HAVING,
# windows/top-k, LWW merge, hierarchy chain, dedup, TPC-H headliners.
PARITY = [
    "s1_point_lookup",
    "s1_range_limit_offset",
    "p4_in_filter",
    "j1_fact_join",
    "j2_dim_broadcast",
    "j3_semi_join",
    "a2_group_argmax",
    "a3_sum_per_parent",
    "a6_having_under_threshold",
    "w2_topk_per_group",
    "u4_lww_merge",
    "h1_chain_resolution",
    "dedup_exact_groups",
    "q1_pricing_summary",
    "q5_nation_revenue",
    "q6_filtered_revenue",
]

_STRFTIME = re.compile(r"strftime\(([^,]+),\s*'([^']+)'\)")
_FMT = {"%Y-%m-%d": "yyyy-MM-dd", "%Y-%m-%d %H:%M:%S": "yyyy-MM-dd HH:mm:ss"}


def port_to_spark_sql(sql: str) -> str:
    """DuckDB → Spark SQL: the dialects agree on everything these
    queries use except time formatting."""
    def sub(m: re.Match) -> str:
        return f"date_format({m.group(1)}, '{_FMT[m.group(2)]}')"

    return _STRFTIME.sub(sub, sql)


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", PARITY)
def test_sql_and_dataframe_surfaces_agree(spark, tables, name):
    fn, oracle = Q.QUERIES[name]
    df_form = fn(spark, SF_DIR)
    sql_form = spark.sql(port_to_spark_sql(oracle))
    assert sorted(df_form.columns) == sorted(sql_form.columns)
    assert _rows(df_form) == _rows(sql_form)
