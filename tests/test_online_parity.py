"""Trajectory parity of online/stochastic EM vs the NumPy oracle.

All six reference update rules (``funs/engine.py:316-399``) run on an
IDENTICAL injected minibatch index stream on both sides; parity is asserted
on per-iteration objective values (posterior log-lik, M-step cost) and on
the parameter trajectory — the optimizer-parity policy of SURVEY.md §7.
"""

import numpy as np
import pytest

from pgpfa.em.fit import FitConfig, fit_loop
from pgpfa.oracle import oracle_np as O


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    xdim, ydim, T, R, bin_ms = 2, 10, 15, 8, 20.0
    C = rng.uniform(-0.5, 0.5, (ydim, xdim))
    d = rng.uniform(-1.0, 0.0, ydim)
    tau = np.array([0.15, 0.3])
    X = rng.standard_normal((R, xdim, T)) * 0.7
    Y = rng.poisson(np.exp(np.einsum("nk,rkt->rnt", C, X) + d[None, :, None])).astype(float)
    C0 = C + 0.15 * rng.standard_normal(C.shape)
    d0 = d + 0.1 * rng.standard_normal(d.shape)
    tau0 = np.array([0.2, 0.2])
    idx_seq = [rng.choice(R, size=3, replace=False) for _ in range(4)]
    return dict(Y=Y, C0=C0, d0=d0, tau0=tau0, bin_ms=bin_ms, idx_seq=idx_seq)


def _run_pair(p, method, update_cd_jointly=True, n_iter=4):
    cfg = FitConfig(
        em_mode="online",
        online_update=method,
        batch_size=3,
        max_em_iter=n_iter,
        update_cd_jointly=update_cd_jointly,
    )
    res = fit_loop(
        {"C": p["C0"], "d": p["d0"], "tau": p["tau0"]},
        p["Y"], p["bin_ms"], cfg, batch_indices=p["idx_seq"][:n_iter],
    )
    hist = O.online_em_fit(
        p["Y"], p["C0"], p["d0"], p["tau0"], p["bin_ms"], p["idx_seq"][:n_iter],
        method=method, max_em_iter=n_iter, update_cd_jointly=update_cd_jointly,
    )
    return res, hist


# the three rules with no previous coverage are the priority (VERDICT #2);
# the naive rules pin the mixing schedules.
@pytest.mark.parametrize("method", ["diag", "hess", "grad",
                                    "balancingGamma", "sequentialAverage",
                                    "fullyUpdateAll"])
def test_online_trajectory_parity(problem, method):
    res, hist = _run_pair(problem, method)
    np.testing.assert_allclose(
        np.asarray(res.post_loglik), np.asarray(hist["post_loglik"]),
        rtol=0, atol=1e-6, err_msg=f"{method}: per-iteration nPLL diverged",
    )
    for i, ph in enumerate(hist["params"]):
        np.testing.assert_allclose(np.asarray(res.C_seq[i]), ph["C"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.d_seq[i]), ph["d"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.tau_seq[i]), ph["tau"], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res.cd_cost), np.asarray(hist["cd_cost"]), rtol=0, atol=1e-6,
        err_msg=f"{method}: M-step cost diverged",
    )


@pytest.mark.parametrize("method", ["diag", "grad"])
def test_online_parity_cd_not_joint(problem, method):
    res, hist = _run_pair(problem, method, update_cd_jointly=False)
    np.testing.assert_allclose(
        np.asarray(res.post_loglik), np.asarray(hist["post_loglik"]),
        rtol=0, atol=1e-6,
    )
    for i, ph in enumerate(hist["params"]):
        np.testing.assert_allclose(np.asarray(res.C_seq[i]), ph["C"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.d_seq[i]), ph["d"], atol=2e-5)


def test_oracle_cd_hessian_matches_fd():
    """The oracle's analytic block Hessian vs finite differences of its own
    analytic gradient (keeps the oracle an independent check, not an echo)."""
    rng = np.random.default_rng(3)
    xdim, ydim, T, R = 2, 5, 8, 3
    Y = rng.poisson(1.0, (R, ydim, T)).astype(float)
    means = rng.standard_normal((R, xdim, T)) * 0.5
    A = rng.standard_normal((R, T, xdim, xdim)) * 0.1
    vsms = np.einsum("rtkl,rtml->rtkm", A, A) + 0.05 * np.eye(xdim)
    vec = rng.standard_normal(xdim * ydim + ydim) * 0.3
    H = O.cd_hessian(vec, Y, means, vsms)
    eps = 1e-6
    for j in range(0, len(vec), 3):
        e = np.zeros_like(vec)
        e[j] = eps
        fd = (O.cd_cost_grad(vec + e, Y, means, vsms) - O.cd_cost_grad(vec - e, Y, means, vsms)) / (2 * eps)
        np.testing.assert_allclose(H[:, j], fd, atol=1e-5)
