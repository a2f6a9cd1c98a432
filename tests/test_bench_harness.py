"""Benchmark harness smoke tests (no TPU, no reference subprocess)."""

import json
import os

import numpy as np


def test_build_problem_deterministic():
    """The benchmark data is numpy-backend (platform-independent) and stable
    across calls — required for cross-process baseline comparability."""
    from bench import build_problem

    ds1, init1 = build_problem()
    ds2, init2 = build_problem()
    assert ds1.Y.shape == (100, 90, 140)
    np.testing.assert_array_equal(ds1.Y, ds2.Y)
    np.testing.assert_allclose(init1["C"], init2["C"])
    # physiological firing rates
    assert 5.0 < float(np.mean(ds1.avgFR)) < 40.0


def test_baseline_cache_format():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_MEASURED.json")
    with open(path) as f:
        blob = json.load(f)
    assert blob["sec_per_iter"] > 0
    assert blob["shape"] == [100, 90, 140]
    assert len(blob["post_loglik"]) == blob["n_iters"]


def test_stevenson_surrogate_shape():
    from pgpfa.data.surrogate import stevenson_surrogate

    ds = stevenson_surrogate(xdim=3, seed=1, numTrials=4)
    assert ds.Y.shape == (4, 90, 140)
    assert ds.binSize == 10 and ds.trialDur == 1400


def test_oracle_online_traj_artifact():
    """The cached oracle-online floor (scripts/oracle_online_traj.py) is
    self-consistent and matches the reference stream it claims to anchor to,
    so bench.py's floor_oracle_vs_reference_maxabs cannot silently rot."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ORACLE_ONLINE_TRAJ.json")) as f:
        orc = json.load(f)
    with open(os.path.join(root, "BASELINE_MEASURED_ONLINE_TRAJ.json")) as f:
        base = json.load(f)
    n = orc["n_iters"]
    assert len(orc["post_loglik"]) == n == len(orc["per_iter_absdiff_vs_reference"])
    ref = np.asarray(base["post_loglik"][:n])
    diffs = np.abs(np.asarray(orc["post_loglik"]) - ref)
    np.testing.assert_allclose(diffs, orc["per_iter_absdiff_vs_reference"], atol=1e-8)
    # per-iter values are stored rounded to 9 decimals; maxabs is full precision
    assert abs(orc["maxabs_vs_reference"]
               - max(orc["per_iter_absdiff_vs_reference"])) < 1e-8
    # the floor is real: same update rule, same stream length as the baseline
    assert orc["update_rule"] == base["update_rule"]
    assert n == len(base["batch_indices"])
