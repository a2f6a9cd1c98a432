"""Subprocess-isolated fit driver (pgpfa/em/isolated.py).

The driver exists for the one real failure mode of the bench TPU — a worker
that wedges after many dispatches of the Stevenson-shaped dual program —
so these tests pin its CONTRACT at small scale on CPU: a fit split across
fresh subprocesses (checkpoint-resume chain) equals the uninterrupted
host-loop fit bit-for-bit, for both inference methods, and a killed segment
is retried from the last completed iteration.
"""

import os

import numpy as np
import pytest

import pgpfa
from pgpfa.em.fit import FitConfig, fit_loop
from pgpfa.em.isolated import fit_isolated


@pytest.fixture(scope="module")
def data():
    train = pgpfa.dataset(
        xdim=2, ydim=10, numTrials=4, trialDur=400, binSize=20,
        dOffset=0.5, fixTau=True, fixedTau=np.array([0.15, 0.3]), seed=11,
    )
    init = pgpfa.initializeParams(2, 10, train, seed=0)
    return train, init


@pytest.mark.parametrize("method", ["laplace", "variational"])
def test_fit_isolated_matches_fit_loop(data, method, tmp_path):
    """Segment chain (2 subprocesses) == uninterrupted host loop, bit-exact:
    the checkpoint carries the full resumable state including the secant
    warm-start pair, so crossing a process boundary changes nothing."""
    train, init = data
    cfg = FitConfig(max_em_iter=3, inference_method=method,
                    vi_maxiter=40, vi_maxiter_warm=25, vi_solver="newton")
    ref = fit_loop(init, train.Y, 20.0, cfg)
    res = fit_isolated(init, train.Y, 20.0, cfg,
                       iters_per_segment=2, workdir=str(tmp_path),
                       timeout=600.0, retries=0)
    np.testing.assert_array_equal(np.asarray(res.post_loglik),
                                  np.asarray(ref.post_loglik))
    np.testing.assert_array_equal(np.asarray(res.C), np.asarray(ref.C))
    np.testing.assert_array_equal(np.asarray(res.tau), np.asarray(ref.tau))
    np.testing.assert_array_equal(np.asarray(res.var_lower_bound),
                                  np.asarray(ref.var_lower_bound))
    assert res.post_loglik.shape[0] == 3


def test_fit_isolated_online_resume_chain(data, tmp_path):
    """Online EM crosses segments with its RNG stream and prior state intact
    (minibatch draws must match the uninterrupted run exactly)."""
    train, init = data
    cfg = FitConfig(max_em_iter=4, em_mode="online", online_update="diag",
                    batch_size=2)
    ref = fit_loop(init, train.Y, 20.0, cfg, seed=7)
    res = fit_isolated(init, train.Y, 20.0, cfg, seed=7,
                       iters_per_segment=2, workdir=str(tmp_path),
                       timeout=600.0, retries=0)
    np.testing.assert_array_equal(np.asarray(res.post_loglik),
                                  np.asarray(ref.post_loglik))
    np.testing.assert_array_equal(np.asarray(res.C), np.asarray(ref.C))


def test_fit_isolated_retry_after_failure(data, tmp_path, monkeypatch):
    """A segment that dies is retried and resumes from the last completed
    iteration's (atomic) checkpoint — simulated by a wrapper interpreter
    that kills the first worker invocation."""
    train, init = data
    cfg = FitConfig(max_em_iter=2)
    ref = fit_loop(init, train.Y, 20.0, cfg)

    crash_flag = tmp_path / "crashed_once"
    wrapper = tmp_path / "flaky_python.sh"
    wrapper.write_text(
        "#!/bin/sh\n"
        f"if [ ! -e {crash_flag} ]; then touch {crash_flag}; exit 137; fi\n"
        f'exec {os.sys.executable} "$@"\n'
    )
    wrapper.chmod(0o755)
    res = fit_isolated(init, train.Y, 20.0, cfg,
                       iters_per_segment=2, workdir=str(tmp_path / "w"),
                       timeout=600.0, retries=1, python=str(wrapper))
    assert crash_flag.exists()
    np.testing.assert_array_equal(np.asarray(res.post_loglik),
                                  np.asarray(ref.post_loglik))
