#!/usr/bin/env python
"""Round-9 q5 supplier-first A/B + oracle equivalence.

Phase 1 (equivalence, sf0.1): collect q5 early=True with the
supplier-broadcast gate ON (new sup-first shape) vs OFF (the prior
early shape) vs early=False (plain chain) and require identical rows.

Phase 2 (A/B at the given SF dir): interleaved noop-timed rounds of
early=True with the gate ON vs OFF.

Usage: python tools/q5_supfirst_ab_r09.py <sf_dir> <ab_rounds>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import adfs_spark.queries as Q
    from adfs_spark.session import get_spark

    spark = get_spark("q5-supfirst-ab-r09")
    spark.sparkContext.setLogLevel("ERROR")

    # Phase 1: result equivalence at sf0.1 across all three shapes.
    rows = {}
    for label, gate, early in (
        ("supfirst", Q.Q5_SUPPLIER_BROADCAST_MAX_BYTES, True),
        ("early_plain", 0, True),
        ("chain", Q.Q5_SUPPLIER_BROADCAST_MAX_BYTES, False),
    ):
        Q.Q5_SUPPLIER_BROADCAST_MAX_BYTES = gate
        rows[label] = sorted(map(tuple, Q.q5_nation_revenue(spark, SF01, early=early).collect()))
    base = rows["supfirst"]
    for label, r in rows.items():
        assert [x[0] for x in r] == [x[0] for x in base], f"{label} keys differ"
        for x, y in zip(r, base):
            assert abs(x[1] - y[1]) < 1e-6, f"{label} value differs: {x} vs {y}"
    print(f"equivalence ok at sf0.1: {len(base)} rows identical across 3 shapes", flush=True)

    # Phase 2: interleaved A/B at sf_dir.
    gate_on = 128 << 20
    times: dict[str, list[float]] = {"supfirst": [], "early_plain": []}
    for rnd in range(rounds):
        for label, gate in (("supfirst", gate_on), ("early_plain", 0)):
            Q.Q5_SUPPLIER_BROADCAST_MAX_BYTES = gate
            spark.sparkContext.setJobDescription(f"q5 ab {label} r{rnd}")
            t0 = time.time()
            Q.q5_nation_revenue(spark, sf_dir, early=True).write.format("noop").mode(
                "overwrite"
            ).save()
            t = round(time.time() - t0, 3)
            times[label].append(t)
            print(f"round {rnd} {label}: {t}", flush=True)
    print({k: (min(v), v) for k, v in times.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
