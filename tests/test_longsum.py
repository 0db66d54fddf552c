"""r9: the scaled-long money-sum route (queries._lsum/_dsum/_dsum4)
must be EXACTLY equal to the decimal form it replaces — same doubles,
same NULL semantics — under the documented preconditions (non-negative
exact 2/4-decimal inputs)."""

import pytest
from pyspark.sql import functions as F

from adfs_spark.queries import (
    MONEY_LONGSUM_MAX_BYTES,
    _dsum,
    _dsum4,
    _fits_longsum,
    _lraw,
)


@pytest.fixture(scope="module")
def money(spark):
    # exact 2-decimal values incl. 0, values whose *100 lands just
    # below/above an integer in binary, and a NULL; plus an empty group
    rows = [
        (1, 855.04),
        (1, 0.0),
        (1, 104999.91),
        (2, 0.01),
        (2, None),
        (3, None),  # group whose sum is NULL on both routes
    ]
    return spark.createDataFrame(rows, "k: int, v: double")


def _collect(df):
    return {r["k"]: r["s"] for r in df.collect()}


def test_dsum_long_equals_decimal(money):
    dec = _collect(money.groupBy("k").agg(_dsum("v", "s")))
    lng = _collect(money.groupBy("k").agg(_dsum("v", "s", longsum=True)))
    assert dec == lng
    assert lng[3] is None  # all-NULL group stays NULL
    assert lng[2] == 0.01


def test_dsum_wide_equals_decimal(money):
    """r10: the above-the-gate route (scaled-long terms, decimal
    accumulation) is value- and NULL-identical to both other routes."""
    dec = _collect(money.groupBy("k").agg(_dsum("v", "s")))
    wide = _collect(money.groupBy("k").agg(_dsum("v", "s", longsum="wide")))
    assert dec == wide
    assert wide[3] is None


def test_dsum4_long_equals_decimal(money):
    prod = F.col("v") * (1 - F.lit(0.05))
    dec = _collect(money.groupBy("k").agg(_dsum4(prod, "s")))
    lng = _collect(money.groupBy("k").agg(_dsum4(prod, "s", longsum=True)))
    assert dec == lng


def test_dsum4_wide_equals_decimal(money):
    prod = F.col("v") * (1 - F.lit(0.05))
    dec = _collect(money.groupBy("k").agg(_dsum4(prod, "s")))
    wide = _collect(money.groupBy("k").agg(_dsum4(prod, "s", longsum="wide")))
    assert dec == wide


def test_dsum_long_equals_decimal_on_fixture(spark):
    """Whole-fixture sweep: every (returnflag, linestatus) group sum of
    the three q1 money expressions matches the decimal route exactly."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def both(longsum):
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            _dsum("l_quantity", "q", longsum=longsum),
            _dsum("l_extendedprice", "p", longsum=longsum),
            _dsum4(disc, "d", longsum=longsum),
        )

    a = {tuple(r[:2]): tuple(r[2:]) for r in both(False).collect()}
    b = {tuple(r[:2]): tuple(r[2:]) for r in both(True).collect()}
    w = {tuple(r[:2]): tuple(r[2:]) for r in both("wide").collect()}
    assert a == b == w


def test_lraw_rounds_half_up_for_positives(spark):
    df = spark.createDataFrame(
        [(855.04,), (0.0,), (0.005,), (123.455,)], "v: double"
    )
    got = [r[0] for r in df.select(_lraw("v")).collect()]
    # the decimal cast is the ground truth the long route must match
    # (both resolve the same binary-double boundary cases identically:
    # 0.005 → 0.50000000000000001 → 1, 123.455 → 12345.5000...02 → 12346)
    dec = [
        int(r[0])
        for r in df.select(F.col("v").cast("decimal(18,2)") * 100).collect()
    ]
    assert got == dec


def test_fits_longsum_gate(tmp_path, monkeypatch):
    d = tmp_path / "lineitem.parquet"
    d.write_bytes(b"x" * 128)
    assert _fits_longsum(str(tmp_path)) is True
    assert MONEY_LONGSUM_MAX_BYTES == 64 << 30
    assert _fits_longsum("/nonexistent-dir") is False  # unknown → decimal
    # r10: above the gate the route is "wide" (decimal accumulation),
    # not the oracle decimal fallback — the per-row win survives scale
    import adfs_spark.queries as q

    monkeypatch.setattr(q, "MONEY_LONGSUM_MAX_BYTES", 64)
    assert q._fits_longsum(str(tmp_path)) == "wide"
