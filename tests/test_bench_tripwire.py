"""The bench's per-op regression tripwire (r8 verdict ask #5): a run
must flag any query/namespace-op that got calibration-adjusted >1.5×
slower than the most recent driver artifact — the openClose 3× slip in
r8 was visible in the artifact but nothing machine-flagged it.

Pure-Python tests (no Spark session): the tripwire is artifact math.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()

CAL = {"cpu0_ms": 100.0, "cpu1_ms": 100.0, "mt0_ms": 140.0, "mt1_ms": 140.0}


def _prev_artifact():
    import re

    prevs = [
        f
        for f in os.listdir(HERE)
        if re.match(r"BENCH_r(\d+)\.json$", f)
    ]
    assert prevs, "driver artifacts missing from repo root"
    latest = max(prevs, key=lambda f: int(re.findall(r"\d+", f)[0]))
    with open(os.path.join(HERE, latest)) as fh:
        return json.load(fh)["parsed"]


def test_clean_run_has_no_regressions():
    prev = _prev_artifact()
    cur = {
        "sf": prev["sf"],
        "cal": prev["cal"],
        "queries": dict(prev["queries"]),
        "namespace_ops": dict(prev["namespace_ops"]),
    }
    out = bench.regression_tripwires(cur)
    assert out["regressions"] == []
    assert out["baseline_round"] is not None


def test_flags_slow_query_and_slow_op():
    prev = _prev_artifact()
    q = next(iter(prev["queries"]))
    op = next(
        k for k, v in prev["namespace_ops"].items() if isinstance(v, (int, float))
    )
    cur = {
        "sf": prev["sf"],
        "cal": prev["cal"],
        "queries": {**prev["queries"], q: prev["queries"][q] * 3.0},
        "namespace_ops": {
            **prev["namespace_ops"],
            op: max(1, int(prev["namespace_ops"][op] / 3)),
        },
    }
    out = bench.regression_tripwires(cur)
    flagged = {r["op"] for r in out["regressions"]}
    assert q in flagged and op in flagged
    worst = out["regressions"][0]
    assert worst["ratio"] >= out["regressions"][-1]["ratio"]


def test_calibration_relaxes_but_never_tightens():
    prev = _prev_artifact()
    q = next(iter(prev["queries"]))
    # 2x slower wall-clock on a host whose mt probe reads 2x slower:
    # calibration-adjusted ratio is ~1.0 — not a regression
    slow_cal = dict(prev["cal"])
    slow_cal["mt0_ms"] = slow_cal["mt1_ms"] = (
        min(
            v
            for k, v in prev["cal"].items()
            if k.startswith("mt") and isinstance(v, (int, float))
        )
        * 2.0
    )
    cur = {
        "sf": prev["sf"],
        "cal": slow_cal,
        "queries": {q: prev["queries"][q] * 2.0},
        "namespace_ops": {},
    }
    out = bench.regression_tripwires(cur)
    assert out["regressions"] == []
    # a FASTER host must not manufacture regressions: cal_ratio clamps at 1
    fast_cal = dict(prev["cal"])
    fast_cal["mt0_ms"] = fast_cal["mt1_ms"] = 1.0
    cur = {
        "sf": prev["sf"],
        "cal": fast_cal,
        "queries": {q: prev["queries"][q]},
        "namespace_ops": {},
    }
    out = bench.regression_tripwires(cur)
    assert out["cal_ratio"] == 1.0
    assert out["regressions"] == []


def test_sf_mismatch_is_inert():
    prev = _prev_artifact()
    cur = {"sf": 99.0, "cal": CAL, "queries": {}, "namespace_ops": {}}
    out = bench.regression_tripwires(cur)
    assert out["regressions"] == []
    assert out.get("err") == "sf_mismatch"
