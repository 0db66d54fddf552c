"""Scaling-regression gate under pytest: a small-copies run of the
tools/scale_smoke machinery at sf0.01 — fast enough for the suite, with
a generous ratio gate (job-overhead noise dominates at this size, so
only a grossly super-linear plan trips it).  The LSH banding assertion
(candidates_per_doc < 1) is exact at every scale."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_scale_gate_small(spark):
    from scale_smoke import run_gate

    result = run_gate(
        spark,
        sf_dir="/root/testdata/sf0.01",
        copies=3,
        # 3x data; allow wide noise at second-scale runtimes, the gate
        # is for order-of-magnitude bends (the sf0.1 x10 run in
        # tools/scale_smoke.py uses the tight 1.2x-growth gate)
        ratio_gate=9.0,
        passes=2,
    )
    assert result["violations"] == [], result
    st = result["lsh_stats"]
    # the banding evidence is recorded and candidate-sparse
    assert st["small"]["candidates_per_doc"] < 1.0
    assert st["big"]["candidates_per_doc"] < 1.0
    assert st["big"]["max_bucket"] >= 1
