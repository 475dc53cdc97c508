"""Benchmark harness + committed-sweep regression tests.

SURVEY.md §4: the complexity-fit assertion (BVH log-log slope ≪ brute
slope, results/main.py:68-87) as an automated check. The committed TPU
sweep artifact (results/sweep.json, produced by tools/run_sweep_tpu.py)
is the record under test — regenerating it with a regressed BVH path
fails here.
"""

import json
import os

import numpy as np
import pytest

from tracer.bench.harness import complexity_fit, run_sweep

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(ROOT, "results", "sweep.json")


def test_complexity_fit_math():
    n = [1e3, 1e4, 1e5, 1e6]
    brute = [1e-3 * x / 1e3 for x in n]          # O(n)
    bvh = [1e-4 * np.log(x) for x in n]          # O(log n)
    fits = complexity_fit(n, brute, bvh)
    assert abs(fits["brute_loglog_slope"] - 1.0) < 1e-6
    assert fits["bvh_loglog_slope"] < 0.2


def test_committed_sweep_slopes():
    assert os.path.exists(SWEEP), \
        "results/sweep.json missing — run tools/run_sweep_tpu.py on TPU"
    with open(SWEEP) as f:
        data = json.load(f)
    comp = data["complexity"]
    # Brute force scales ~linearly; the BVH path's slope must be FAR
    # below it (the reference's own headline claim, results/main.py:77-81).
    # Bound calibration: the REFERENCE's own published 1k-100M data
    # (results/benchmark_data.txt:1-6) has bvh/brute slope ratio
    # 0.482/0.993 = 0.49 — a 0.5x bound would fail the reference itself.
    # Gate at 0.62x for the full range (still a decisive O(log)-vs-O(n)
    # separation), and at 0.5x for the 1k-10M sub-range where the
    # round-5 sweep holds real margin (0.344 vs 0.43; the 100M row is
    # per-pair-overhead-bound, docs/PERF.md "The 100M row").
    assert comp["brute_loglog_slope"] > 0.55, comp
    assert comp["bvh_loglog_slope"] < 0.62 * comp["brute_loglog_slope"], comp
    sizes = np.asarray(data["sizes"], np.float64)
    sub = sizes <= 10_000_000
    if sub.sum() >= 2:
        vv = np.asarray(data["bvh_s"], np.float64)[sub]
        slope_sub = np.polyfit(np.log(sizes[sub]), np.log(vv), 1)[0]
        assert slope_sub < 0.5 * comp["brute_loglog_slope"], slope_sub
    # And the BVH must actually beat brute force at every measured size
    # where both ran.
    for n, b, v in zip(data["sizes"], data["brute_s"], data["bvh_s"]):
        if np.isfinite(b) and np.isfinite(v) and n >= 10_000:
            assert v < b, f"BVH slower than brute at n={n}"


def test_run_sweep_smoke_cpu():
    # The harness itself runs end to end on CPU (jnp traversal path).
    res = run_sweep(sizes=(256, 1024), num_rays=2048, world_size=60.0,
                    use_pallas=False, log=lambda *a: None)
    assert len(res.bvh_s) == 2 and all(v > 0 for v in res.bvh_s)
    j = res.to_json()
    assert "complexity" in j and len(j["speedup"]) == 2


def test_committed_scaling_artifact():
    """results/scaling.json (tools/run_scaling.py): DP throughput must not
    collapse as devices grow — the structural gate VERDICT r3 asked for.
    (Absolute efficiency targets apply to real pods; the virtual CPU mesh
    validates structure.)"""
    path = os.path.join(ROOT, "results", "scaling.json")
    assert os.path.exists(path), \
        "results/scaling.json missing — run tools/run_scaling.py"
    with open(path) as f:
        data = json.load(f)
    rows = data["rows"]
    assert rows[0]["devices"] == 1
    base = rows[0]["mrays_per_s"]
    for row in rows:
        assert row["mrays_per_s"] > 0
        # non-collapse: more devices never drops below 60% of 1-device
        assert row["mrays_per_s"] > 0.6 * base, rows
