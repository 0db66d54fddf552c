"""Meta-tests pinning the driver contract: the 50-entry EXPORTED list
is load-bearing (the harness value-hashes exactly those), so every
registered query must stay reachable from it, and the suites' column
supersets must keep covering their members' full output.
"""

from __future__ import annotations

import adfs_spark.queries as Q


def _reachable() -> set[str]:
    reach = set(Q.EXPORTED)
    for s in Q.EXPORTED:
        reach |= set(Q.SUITE_MEMBERS.get(s, []))
    return reach


def test_driver_coverage_closure():
    """Every registered query is EXPORTED, a member of an EXPORTED
    suite, folded into a reachable query, or a declared sketch with a
    reachable oracle-checked twin.  Adding a query without wiring it
    into the driver surface fails here."""
    reach = _reachable()
    for name in Q.QUERIES:
        ok = (
            name in reach
            or name in Q.FOLDED_INTO
            or name in Q.SKETCH_ONLY
        )
        assert ok, (
            f"{name} is not driver-reachable: add it to EXPORTED, a suite, "
            "FOLDED_INTO, or SKETCH_ONLY in queries.py"
        )
    # fold/sketch targets must themselves be reachable (and real)
    for src, dst in {**Q.FOLDED_INTO, **Q.SKETCH_ONLY}.items():
        assert dst in Q.QUERIES, f"{src} folds into unknown query {dst}"
        assert dst in reach, f"{src} folds into unreachable query {dst}"


def test_exported_is_exactly_fifty_with_oracles():
    assert len(Q.EXPORTED) == 50
    # every exported entry has an oracle (the two LSH rows gained
    # deterministic oracles in round 2; keep it that way)
    missing = [n for n in Q.EXPORTED if Q.QUERIES[n][1] is None]
    assert missing == [], f"exported entries without oracle: {missing}"


def test_suite_members_have_oracles_and_exist():
    for suite, members in Q.SUITE_MEMBERS.items():
        for m in members:
            assert m in Q.QUERIES, f"{suite} references unknown member {m}"
            assert Q.QUERIES[m][1] is not None, (
                f"suite {suite} member {m} lacks an oracle — the tagged "
                "union would silently weaken the suite's hash coverage"
            )


def test_folded_queries_do_not_overlap_suites():
    """A query both folded AND a suite member would double-count; keep
    the classification disjoint so COVERAGE.md's member map stays
    truthful."""
    member_set = {m for ms in Q.SUITE_MEMBERS.values() for m in ms}
    for name in list(Q.FOLDED_INTO) + list(Q.SKETCH_ONLY):
        assert name not in member_set, f"{name} is both folded and a suite member"
        assert name not in Q.EXPORTED, f"{name} is both folded and exported"
