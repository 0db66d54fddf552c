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


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(
        st.one_of(st.integers(min_value=-(2**40), max_value=2**40), st.none()),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    base=st.integers(min_value=0, max_value=2**40),
    negate=st.booleans(),
)
def test_version_stamping_dense_unique_deterministic(spark, keys, base, negate):
    """_stamp_versions assigns exactly {base+1..base+n} (sign flipped
    for tombstones) regardless of key values/nulls, and identically on
    recomputation (it feeds both the changelog and the merge)."""
    from adfs_spark.storage import _stamp_versions

    rows = spark.createDataFrame([(k,) for k in keys], "k: long")
    stamped = _stamp_versions(rows, ["k"], base, negate=negate)
    got = {(r["k"], r["version"]) for r in stamped.collect()}
    versions = sorted(abs(v) for _, v in got)
    assert versions == list(range(base + 1, base + 1 + len(keys)))
    assert all((v < 0) == negate for _, v in got)
    # deterministic under recomputation
    assert {(r["k"], r["version"]) for r in stamped.collect()} == got


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


_ts_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=0, max_size=25
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=_ts_rows, rrows=_ts_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    from adfs_spark.operators.joins import asof_join

    # unique right (k, ts) so the reference argmax is well-defined
    rrows = list({(k, t): (k, t) for k, t in rrows}.values())
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)] or [(99, 0, 0)],
        "k: long, ts: long, lid: long",
    )
    right = spark.createDataFrame(
        [(k, t, float(k * 1000 + t)) for k, t in rrows] or [(98, 0, 0.0)],
        "k: long, ts: long, px: double",
    )
    got = {
        r["lid"]: r["px"]
        for r in asof_join(left, right, on="k", left_ts="ts", how="left").collect()
    }
    for i, (k, t) in enumerate(lrows or [(99, 0)]):
        cands = [(rt, float(rk * 1000 + rt)) for rk, rt in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=_ts_rows, rrows=_ts_rows, delta=st.integers(1, 40))
def test_range_join_matches_bruteforce(spark, lrows, rrows, delta):
    from adfs_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)] or [(99, 0, 0)],
        "k: long, ts: long, lid: long",
    )
    right = spark.createDataFrame(
        [(k, t, j) for j, (k, t) in enumerate(rrows)] or [(98, 0, 0)],
        "k: long, ts: long, rid: long",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, on="k", left_ts="ts", delta=delta).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt) in enumerate(lrows or [(99, 0)])
        for j, (rk, rt) in enumerate(rrows or [(98, 0)])
        if lk == rk and lt - delta < rt <= lt
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from adfs_spark.functions.dedup import connected_components

    sdf = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a: long, id_b: long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(sdf, max_iter=12).collect()
    }
    # reference: driver-side union-find with min-id representatives
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want = {(n, find(n)) for n in parent}
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),  # user
            st.sampled_from(["a", "b", "c"]),  # event type
            st.integers(0, 50),  # ts offset seconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_counts_monotone_and_matches_bruteforce(spark, rows):
    from adfs_spark.functions.events import funnel_counts

    df = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows], "user_id: long, event_type: string, s: long"
    ).withColumn("ts", F.timestamp_seconds(F.col("s")))
    steps = ["a", "b", "c"]
    got = {
        r["step_index"]: r["n_users"] for r in funnel_counts(df, steps).collect()
    }
    # brute-force replay per user
    expect = {0: 0, 1: 0, 2: 0}
    by_user: dict = {}
    for u, t, s in rows:
        by_user.setdefault(u, []).append((s, t))
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for i, step in enumerate(steps):
            cand = [s for s, t in evs if t == step and (t_prev is None or s > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            expect[i] += 1
    assert got == expect
    # monotone: each step's survivors never exceed the previous step's
    assert got[0] >= got[1] >= got[2]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    nparts=st.integers(1, 6),
)
def test_shuffle_order_invariant_under_repartitioning(spark, keys, nparts):
    from adfs_spark.functions.sampling import shuffle_order

    df = spark.createDataFrame([(k,) for k in keys], "k: long")
    base = {r["k"]: r["train_order"] for r in shuffle_order(df, "k").collect()}
    rep = {
        r["k"]: r["train_order"]
        for r in shuffle_order(df.repartition(nparts), "k").collect()
    }
    assert base == rep
    assert sorted(base.values()) == list(range(1, len(keys) + 1))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
        min_size=4,
        max_size=60,
    ),
    bits=st.integers(2, 6),
)
def test_zorder_value_bounds_and_determinism(spark, vals, bits):
    from adfs_spark.sources.generic import zorder_value

    df = spark.createDataFrame(vals, "x: long, y: long")
    z1, cuts = zorder_value(df, ("x", "y"), bits=bits)
    rows = z1.select("x", "y", "_zvalue").collect()
    hi = 1 << (2 * bits)
    assert all(0 <= r["_zvalue"] < hi for r in rows)
    # same cutpoints → identical curve positions on re-stamp
    z2, _ = zorder_value(df, ("x", "y"), bits=bits, cutpoints=cuts)
    assert {(r["x"], r["y"], r["_zvalue"]) for r in z2.collect()} == {
        (r["x"], r["y"], r["_zvalue"]) for r in rows
    }


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=30,
    ),
    scores=st.dictionaries(
        st.integers(0, 20), st.integers(0, 5), min_size=21, max_size=21
    ),
)
def test_canonical_survivors_matches_reference(spark, edges, scores):
    """Survivor per component = max score, ties to smallest id; member
    counts match the union-find component sizes."""
    from adfs_spark.functions.dedup import canonical_survivors

    sdf = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a: long, id_b: long"
    )
    score_df = spark.createDataFrame(
        [(n, float(s)) for n, s in scores.items()], "doc_id: long, score: double"
    )
    got = {
        r["component"]: (r["survivor_id"], r["n_members"], r["n_dropped"])
        for r in canonical_survivors(sdf, score_df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {}
    for root, members in comps.items():
        best = max(members, key=lambda m: (scores[m], -m))
        want[root] = (best, len(members), len(members) - 1)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    assign=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 3), st.integers(0, 6)),
        min_size=1,
        max_size=120,
    )
)
def test_spanning_equals_allpairs_components(spark, assign):
    """The spanning-star candidate graph has EXACTLY the connected
    components of the all-pairs candidate graph, for any (node, band,
    bucket) assignment: per bucket the clique and the star span the
    same node set, and unions of same-span subgraphs share a transitive
    closure.  This is the proof obligation behind
    ``lsh_candidate_pairs(spanning=True)`` — O(docs) edges with zero
    component drift."""
    from adfs_spark.functions.dedup import _star_edges, connected_components

    rows = sorted(set(assign))
    banded = spark.createDataFrame(
        rows, "_id: long, band: int, bucket: long"
    )
    star = _star_edges(banded, ["band", "bucket"], "_id")
    a, b = banded.alias("a"), banded.alias("b")
    allp = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    comp_star = {
        (r["node"], r["component"])
        for r in connected_components(star, max_iter=12).collect()
    }
    comp_all = {
        (r["node"], r["component"])
        for r in connected_components(allp, max_iter=12).collect()
    }
    assert comp_star == comp_all
    # and the edge bound: at most one star edge per non-hub bucket row
    n_rows = len(rows)
    assert star.count() <= n_rows


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.lists(
            st.integers(-4, 4).map(float), min_size=6, max_size=6
        ),
        min_size=2,
        max_size=40,
    )
)
def test_embedding_star_equals_allpairs_components(spark, vecs):
    """embedding_candidate_star (the driver-rowed spanning keep-step's
    candidate plane): components over the multi-table star edges equal
    components over the all-pairs bucket graph of the SAME tables, and
    edges are bounded by rows × tables — for arbitrary real vectors,
    not just abstract bucket assignments."""
    from adfs_spark.functions.dedup import connected_components
    from adfs_spark.functions.similarity import (
        DeterministicHyperplaneLSH,
        embedding_candidate_star,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    tables = [
        DeterministicHyperplaneLSH(dim=6, num_bits=3, salt="p"),
        DeterministicHyperplaneLSH(dim=6, num_bits=3, salt="p~t1"),
    ]
    star = embedding_candidate_star(
        df, id_col="vec_id", vec_col="embedding", lsh_tables=tables
    )
    # all-pairs over the union of the same bucket planes
    allp = None
    for ti, t in enumerate(tables):
        b = t.bucketize(df, "embedding").select(
            F.col("vec_id").alias("_id"), "bucket"
        )
        a, c = b.alias("a"), b.alias("b")
        p = (
            a.join(
                c,
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        )
        allp = p if allp is None else allp.unionByName(p)
    allp = allp.distinct()
    comp_star = {
        (r["node"], r["component"])
        for r in connected_components(star, max_iter=12).collect()
    }
    comp_all = {
        (r["node"], r["component"])
        for r in connected_components(allp, max_iter=12).collect()
    }
    assert comp_star == comp_all
    assert star.count() <= len(rows) * len(tables)
