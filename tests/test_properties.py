"""Property-based tests (hypothesis) for the engine's algebraic
invariants — the reference asserts these behaviorally through its
JUnit/iosimulator suites (SURVEY §5); here they are properties.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from adfs_spark.operators.delta import merge_last_writer_wins
from adfs_spark.operators.find import Comparator, index_predicate

# one op = (key, payload, version); abs(version) unique per log
ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (small → collisions)
        st.integers(min_value=0, max_value=100),  # payload
        st.booleans(),  # tombstone?
    ),
    min_size=1,
    max_size=12,
)


def _mk_log(spark, ops):
    rows = [
        (k, p, -(i + 1) if dead else (i + 1)) for i, (k, p, dead) in enumerate(ops)
    ]
    return rows, spark.createDataFrame(rows, "k: long, v: long, version: long")


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=ops_strategy)
def test_lww_merge_matches_sequential_replay(spark, ops):
    """Merging the whole log at once == applying ops one-by-one in
    version order (U4: last-writer-wins by abs(version))."""
    rows, log = _mk_log(spark, ops)
    empty = spark.createDataFrame([], "k: long, v: long, version: long")
    merged = merge_last_writer_wins(empty, log, ["k"])
    got = {
        r["k"]: (r["v"], r["version"])
        for r in merged.filter(F.col("version") >= 0).collect()
    }
    # sequential replay oracle
    state: dict[int, tuple[int, int]] = {}
    for i, (k, p, dead) in enumerate(ops):
        v = -(i + 1) if dead else (i + 1)
        state[k] = (p, v)
    expect = {k: pv for k, pv in state.items() if pv[1] >= 0}
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=ops_strategy)
def test_lww_merge_idempotent_and_split_invariant(spark, ops):
    """merge(base, log) == merge(merge(base, log[:k]), log[k:]) — the
    incremental-restore path (D2) converges to the same state as a full
    replay regardless of where the version range is split."""
    rows, log = _mk_log(spark, ops)
    empty = spark.createDataFrame([], "k: long, v: long, version: long")
    full = merge_last_writer_wins(empty, log, ["k"])
    mid = len(rows) // 2
    first = spark.createDataFrame(rows[:mid] or [], "k: long, v: long, version: long")
    second = spark.createDataFrame(rows[mid:] or [], "k: long, v: long, version: long")
    staged = merge_last_writer_wins(merge_last_writer_wins(empty, first, ["k"]), second, ["k"])
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(full) == canon(staged)
    # idempotence: re-applying the full log changes nothing
    again = merge_last_writer_wins(full, log, ["k"])
    assert canon(again) == canon(full)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(-50, 50), min_size=1, max_size=30),
    probe=st.integers(-50, 50),
    cmp=st.sampled_from(list(Comparator)),
)
def test_find_predicate_matches_python_semantics(spark, keys, probe, cmp):
    """S1 comparators agree with plain Python comparison."""
    if cmp is Comparator.IN:
        probe_arg = [probe, probe + 1]
        py = lambda x: x in probe_arg
    else:
        probe_arg = probe
        py = {
            Comparator.EQ: lambda x: x == probe,
            Comparator.LT: lambda x: x < probe,
            Comparator.LE: lambda x: x <= probe,
            Comparator.GT: lambda x: x > probe,
            Comparator.GE: lambda x: x >= probe,
        }[cmp]
    df = spark.createDataFrame([(k,) for k in keys], "k: long")
    got = sorted(r["k"] for r in df.filter(index_predicate(["k"], [probe_arg], cmp)).collect())
    expect = sorted(k for k in keys if py(k))
    assert got == expect
