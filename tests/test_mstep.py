"""M-step parity vs the scipy oracle: (C, d) cost/optimum and tau learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgpfa.infer.laplace import laplace_estep_from_arrays
from pgpfa.learn import mstep_gp, mstep_obs
from pgpfa.models.params import pack_cd
from pgpfa.oracle import oracle_np as O


@pytest.fixture(scope="module")
def problem():
    """A small problem with real posterior moments from the Laplace E-step."""
    rng = np.random.default_rng(11)
    xdim, ydim, T, R, bin_ms = 2, 12, 20, 5, 20.0
    C = rng.uniform(-0.5, 0.5, (ydim, xdim))
    d = rng.uniform(-1.5, 0.0, ydim)
    tau = np.array([0.12, 0.3])
    X = rng.standard_normal((R, xdim, T)) * 0.7
    Y = rng.poisson(np.exp(np.einsum("nk,rkt->rnt", C, X) + d[None, :, None])).astype(float)
    inf, _ = laplace_estep_from_arrays(
        jnp.asarray(C), jnp.asarray(d), jnp.asarray(tau), jnp.asarray(Y), T, bin_ms
    )
    return dict(
        C=C, d=d, tau=tau, Y=Y, T=T, bin_ms=bin_ms,
        means=np.asarray(inf.post_mean),
        vsms=np.asarray(inf.post_vsm),
        vsm_gps=np.asarray(inf.post_vsm_gp),
    )


def test_cd_cost_matches_oracle(problem):
    p = problem
    rng = np.random.default_rng(2)
    vec = O.pack_cd(p["C"], p["d"]) + 0.05 * rng.standard_normal(p["C"].size + p["d"].size)
    want = O.cd_cost(vec, p["Y"], p["means"], p["vsms"])
    got = mstep_obs.cd_cost(
        jnp.asarray(vec), jnp.asarray(p["Y"]), jnp.asarray(p["means"]), jnp.asarray(p["vsms"])
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-12)
    # gradient: autodiff vs the oracle's hand-derived analytic gradient
    g = jax.grad(mstep_obs.cd_cost)(
        jnp.asarray(vec), jnp.asarray(p["Y"]), jnp.asarray(p["means"]), jnp.asarray(p["vsms"])
    )
    np.testing.assert_allclose(
        np.asarray(g), O.cd_cost_grad(vec, p["Y"], p["means"], p["vsms"]), rtol=1e-9, atol=1e-11
    )


def test_learn_cd_matches_oracle_optimum(problem):
    p = problem
    wantC, wantd, wantcost = O.learn_cd(p["Y"], p["means"], p["vsms"], p["C"], p["d"], method="BFGS")
    res = mstep_obs.learn_cd(
        jnp.asarray(p["Y"]), jnp.asarray(p["means"]), jnp.asarray(p["vsms"]),
        jnp.asarray(p["C"]), jnp.asarray(p["d"]),
    )
    # parity at converged objective values (optimizer-parity policy, SURVEY §7)
    np.testing.assert_allclose(float(res.cost), wantcost, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.C), wantC, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.d), wantd, atol=1e-3)


def test_tau_cost_matches_oracle(problem):
    p = problem
    ps = mstep_gp.pauto_sum(jnp.asarray(p["means"]), jnp.asarray(p["vsm_gps"]))
    ps_o = O.pauto_sum(p["means"], p["vsm_gps"])
    np.testing.assert_allclose(np.asarray(ps), ps_o, rtol=1e-10)
    from pgpfa.models.params import time_sqdist

    dif_sq = time_sqdist(p["T"])
    for k in range(2):
        for pval in (-3.0, -1.5, 0.0):
            want = O.tau_cost(pval, ps_o[k], p["Y"].shape[0], p["T"])
            got = mstep_gp.tau_cost(jnp.asarray(pval), ps[k], p["Y"].shape[0], dif_sq)
            np.testing.assert_allclose(float(got), want, rtol=1e-9)


def test_learn_tau_matches_oracle(problem):
    p = problem
    want_tau, want_cost = O.learn_tau(p["means"], p["vsm_gps"], p["tau"], p["bin_ms"])
    res = mstep_gp.learn_tau(
        jnp.asarray(p["means"]), jnp.asarray(p["vsm_gps"]), jnp.asarray(p["tau"]), p["bin_ms"]
    )
    np.testing.assert_allclose(np.asarray(res.tau), want_tau, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.cost), want_cost, rtol=0, atol=1e-6)


def test_cd_prior_penalty(problem):
    """Proximal penalty shrinks the step toward the old parameters."""
    p = problem
    v0 = pack_cd(jnp.asarray(p["C"]), jnp.asarray(p["d"]))
    free = mstep_obs.learn_cd(
        jnp.asarray(p["Y"]), jnp.asarray(p["means"]), jnp.asarray(p["vsms"]),
        jnp.asarray(p["C"]), jnp.asarray(p["d"]),
    )
    P = jnp.eye(v0.shape[0]) * 1e4
    prox = mstep_obs.learn_cd(
        jnp.asarray(p["Y"]), jnp.asarray(p["means"]), jnp.asarray(p["vsms"]),
        jnp.asarray(p["C"]), jnp.asarray(p["d"]), prior=(P, v0),
    )
    step_free = float(jnp.linalg.norm(pack_cd(free.C, free.d) - v0))
    step_prox = float(jnp.linalg.norm(pack_cd(prox.C, prox.d) - v0))
    assert step_prox < 0.2 * step_free


def test_learn_cd_contraction_branch_large_xdim():
    """xdim > 8 routes the Hessian statistics through the contraction form
    (u = m + Vc outer products; the x^4 moment tensor never exists) — pin it
    to the joint L-BFGS optimum on the same cost."""
    rng = np.random.default_rng(3)
    R, ydim, T, xdim = 3, 7, 10, 9
    means = rng.normal(0, 0.5, (R, xdim, T))
    A = rng.normal(0, 0.2, (R, T, xdim, xdim))
    vsms = np.einsum("rtij,rtkj->rtik", A, A) + 0.05 * np.eye(xdim)
    C0 = rng.uniform(-0.3, 0.3, (ydim, xdim))
    d0 = rng.uniform(-1.0, 0.0, ydim)
    Y = rng.poisson(
        np.exp(np.clip(np.einsum("nk,rkt->rnt", C0, means) + d0[:, None], None, 2.0))
    ).astype(float)

    newton = mstep_obs.learn_cd_newton(
        jnp.asarray(Y), jnp.asarray(means), jnp.asarray(vsms),
        jnp.asarray(C0), jnp.asarray(d0), n_iter=25,
    )
    lbfgs = mstep_obs.learn_cd(
        jnp.asarray(Y), jnp.asarray(means), jnp.asarray(vsms),
        jnp.asarray(C0), jnp.asarray(d0), method="lbfgs", maxiter=800, tol=1e-12,
    )
    np.testing.assert_allclose(float(newton.cost), float(lbfgs.cost), rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(newton.C), np.asarray(lbfgs.C), atol=2e-4)
