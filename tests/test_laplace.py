"""Laplace E-step parity vs the scipy Newton-CG oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pgpfa.infer.laplace import laplace_estep_from_arrays
from pgpfa.oracle import oracle_np as O


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    xdim, ydim, T, R, bin_ms = 2, 10, 25, 4, 20.0
    C = rng.uniform(-0.5, 0.5, (ydim, xdim))
    d = rng.uniform(-1.5, 0.0, ydim)
    tau = np.array([0.15, 0.35])
    X = rng.standard_normal((R, xdim, T)) * 0.8
    Y = rng.poisson(np.exp(np.einsum("nk,rkt->rnt", C, X) + d[None, :, None])).astype(float)
    return dict(C=C, d=d, tau=tau, Y=Y, T=T, bin_ms=bin_ms)


def test_laplace_matches_oracle(problem):
    p = problem
    want = O.laplace_infer(p["Y"], p["C"], p["d"], p["tau"], p["bin_ms"])
    inf, pll = laplace_estep_from_arrays(
        jnp.asarray(p["C"]), jnp.asarray(p["d"]), jnp.asarray(p["tau"]),
        jnp.asarray(p["Y"]), p["T"], p["bin_ms"],
    )
    # objective values at the mode: the 1e-6 parity north-star
    np.testing.assert_allclose(np.asarray(inf.trial_obj), want["trial_obj"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(float(pll), want["post_loglik"], rtol=0, atol=1e-6)
    # posterior moments
    np.testing.assert_allclose(np.asarray(inf.post_mean), want["post_mean"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(inf.post_vsm), want["post_vsm"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(inf.post_vsm_gp), want["post_vsm_gp"], atol=1e-6)


def test_laplace_warm_start_consistency(problem):
    """Warm-started solve reaches the same modes as a cold start."""
    p = problem
    inf1, pll1 = laplace_estep_from_arrays(
        jnp.asarray(p["C"]), jnp.asarray(p["d"]), jnp.asarray(p["tau"]),
        jnp.asarray(p["Y"]), p["T"], p["bin_ms"],
    )
    inf2, pll2 = laplace_estep_from_arrays(
        jnp.asarray(p["C"]), jnp.asarray(p["d"]), jnp.asarray(p["tau"]),
        jnp.asarray(p["Y"]), p["T"], p["bin_ms"], x_init=inf1.post_mean,
    )
    np.testing.assert_allclose(float(pll2), float(pll1), atol=1e-9)
    assert int(np.max(np.asarray(inf2.newton_iters))) <= 1


def test_neuron_mask_equals_row_deletion(problem):
    """Masking a neuron's likelihood equals deleting its rows (LOO machinery)."""
    p = problem
    n_drop = 3
    keep = np.arange(p["C"].shape[0]) != n_drop
    want = O.laplace_infer(p["Y"][:, keep, :], p["C"][keep], p["d"][keep], p["tau"], p["bin_ms"])
    w = jnp.asarray(keep, dtype=jnp.float64)
    inf, _ = laplace_estep_from_arrays(
        jnp.asarray(p["C"]), jnp.asarray(p["d"]), jnp.asarray(p["tau"]),
        jnp.asarray(p["Y"]), p["T"], p["bin_ms"], weights=w,
    )
    np.testing.assert_allclose(np.asarray(inf.post_mean), want["post_mean"], atol=1e-5)
