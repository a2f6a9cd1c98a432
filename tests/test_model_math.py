"""Unit tests: kernel assembly, structured objective/grad/Hessian vs the dense
NumPy oracle, and pack/unpack round trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgpfa.models import params as P
from pgpfa.models import poisson_gpfa as M
from pgpfa.ops import blockmat as B
from pgpfa.oracle import oracle_np as O


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    xdim, ydim, T, bin_ms = 3, 12, 17, 20.0
    C = rng.uniform(-0.5, 0.5, (ydim, xdim))
    d = rng.uniform(-2.0, 0.0, ydim)
    tau = np.array([0.1, 0.25, 0.45])
    X = rng.standard_normal((xdim, T))
    Y = rng.poisson(np.exp(C @ X + d[:, None])).astype(float)
    return dict(C=C, d=d, tau=tau, X=X, Y=Y, T=T, bin_ms=bin_ms, xdim=xdim, ydim=ydim)


def test_rbf_kernel_matches_oracle(setup):
    s = setup
    K = np.asarray(P.rbf_kernel(jnp.asarray(s["tau"]), s["T"], s["bin_ms"]))
    Kb = O.k_big(s["tau"], s["T"], s["bin_ms"])
    for k in range(s["xdim"]):
        blk = Kb[k * s["T"] : (k + 1) * s["T"], k * s["T"] : (k + 1) * s["T"]]
        np.testing.assert_allclose(K[k], blk, rtol=0, atol=1e-12)
    # off-diagonal latent blocks of K_big are zero (block-diagonal structure)
    assert np.allclose(Kb[: s["T"], s["T"] : 2 * s["T"]], 0.0)


def test_pack_unpack_roundtrip(setup):
    s = setup
    vec = P.pack_cd(jnp.asarray(s["C"]), jnp.asarray(s["d"]))
    np.testing.assert_allclose(np.asarray(vec), O.pack_cd(s["C"], s["d"]))
    C2, d2 = P.unpack_cd(vec, s["xdim"], s["ydim"])
    np.testing.assert_allclose(np.asarray(C2), s["C"])
    np.testing.assert_allclose(np.asarray(d2), s["d"])


def test_neg_log_posterior_matches_dense(setup):
    s = setup
    Kb = O.k_big(s["tau"], s["T"], s["bin_ms"])
    Kinv_dense = np.linalg.inv(Kb)
    Cb, db = O.cd_big(s["C"], s["d"], s["T"])
    x = s["X"].reshape(-1)
    ybar = s["Y"].reshape(-1)
    want = O.nlp(x, ybar, Cb, db, Kinv_dense)

    Kinv = B.blocks_inv(P.rbf_kernel(jnp.asarray(s["tau"]), s["T"], s["bin_ms"]))
    got = M.neg_log_posterior(
        jnp.asarray(s["X"]), jnp.asarray(s["Y"]), jnp.asarray(s["C"]),
        jnp.asarray(s["d"]), Kinv,
    )
    # rtol: our mixed-precision refined K-inverse and the oracle's LU
    # inverse legitimately differ at ~1e-9 relative on ill-conditioned K
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_grad_and_hess_match_dense(setup):
    s = setup
    Kb = O.k_big(s["tau"], s["T"], s["bin_ms"])
    Kinv_dense = np.linalg.inv(Kb)
    Cb, db = O.cd_big(s["C"], s["d"], s["T"])
    x = s["X"].reshape(-1)
    ybar = s["Y"].reshape(-1)

    Kinv = B.blocks_inv(P.rbf_kernel(jnp.asarray(s["tau"]), s["T"], s["bin_ms"]))
    g = M.neg_log_posterior_grad(
        jnp.asarray(s["X"]), jnp.asarray(s["Y"]), jnp.asarray(s["C"]),
        jnp.asarray(s["d"]), Kinv,
    )
    np.testing.assert_allclose(
        np.asarray(g).reshape(-1), O.nlp_grad(x, ybar, Cb, db, Kinv_dense), rtol=1e-7, atol=1e-7
    )
    H = M.neg_log_posterior_hess(
        jnp.asarray(s["X"]), jnp.asarray(s["Y"]), jnp.asarray(s["C"]),
        jnp.asarray(s["d"]), Kinv,
    )
    np.testing.assert_allclose(
        np.asarray(H), O.nlp_hess(x, ybar, Cb, db, Kinv_dense), rtol=1e-6, atol=1e-6
    )


def test_structured_grad_matches_autodiff(setup):
    """The hand-structured gradient equals jax.grad of the objective."""
    s = setup
    Kinv = B.blocks_inv(P.rbf_kernel(jnp.asarray(s["tau"]), s["T"], s["bin_ms"]))
    args = (jnp.asarray(s["Y"]), jnp.asarray(s["C"]), jnp.asarray(s["d"]), Kinv)
    g_auto = jax.grad(M.neg_log_posterior)(jnp.asarray(s["X"]), *args)
    g_hand = M.neg_log_posterior_grad(jnp.asarray(s["X"]), *args)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_hand), rtol=1e-10)


def test_cov_views(setup):
    s = setup
    D = s["xdim"] * s["T"]
    rng = np.random.default_rng(1)
    A = rng.standard_normal((D, D))
    cov = A @ A.T
    vsm, vsm_gp = B.cov_views(jnp.asarray(cov), s["xdim"], s["T"])
    T = s["T"]
    # reference extraction patterns (funs/inference.py:164-172)
    for k in range(s["xdim"]):
        np.testing.assert_allclose(np.asarray(vsm_gp)[k], cov[k * T : (k + 1) * T, k * T : (k + 1) * T])
    for t in range(T):
        np.testing.assert_allclose(np.asarray(vsm)[t], cov[t::T, t::T])
