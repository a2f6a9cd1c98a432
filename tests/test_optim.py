"""Unit tests for the branchless fixed-iteration L-BFGS and the
mixed-precision log-determinant (the TPU-safe VI building blocks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgpfa.ops.blockmat import logdet_psd_mixed
from pgpfa.utils.optim import minimize_lbfgs_fixed


def test_logdet_psd_mixed_accuracy():
    """f64-grade accuracy across conditionings up to the GP-precision regime."""
    rng = np.random.default_rng(0)
    for D, cond in [(30, 1e3), (200, 1e4), (300, 1e5)]:
        A = rng.standard_normal((D, D))
        Q, _ = np.linalg.qr(A)
        ev = np.logspace(0, np.log10(cond), D)
        H = 0.5 * ((Q * ev) @ Q.T + ((Q * ev) @ Q.T).T)
        ld = float(logdet_psd_mixed(jnp.asarray(H)))
        _, le = np.linalg.slogdet(H)
        assert abs(ld - le) / abs(le) < 1e-11, (D, cond, ld - le)


def test_logdet_psd_mixed_grad():
    """Custom gradient equals the exact inverse (d logdet = H^{-1})."""
    rng = np.random.default_rng(1)
    D = 25
    A = rng.standard_normal((D, D))
    H = A @ A.T + D * np.eye(D)
    g = jax.grad(lambda h: logdet_psd_mixed(h))(jnp.asarray(H))
    np.testing.assert_allclose(np.asarray(g), np.linalg.inv(H), atol=1e-10)


def test_lbfgs_fixed_quadratic():
    """Exact minimum of an ill-conditioned quadratic within the budget."""
    rng = np.random.default_rng(2)
    D = 40
    A = rng.standard_normal((D, D))
    H = A @ A.T + 0.01 * np.eye(D)
    b = rng.standard_normal(D)
    Hj, bj = jnp.asarray(H), jnp.asarray(b)
    fun = lambda x: 0.5 * x @ (Hj @ x) - bj @ x
    res = minimize_lbfgs_fixed(fun, jnp.zeros(D), n_iter=200)
    x_star = np.linalg.solve(H, b)
    f_star = float(0.5 * x_star @ H @ x_star - b @ x_star)
    assert float(res.fun) - f_star < 1e-8
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-4)


def test_lbfgs_fixed_vmap_rosenbrock():
    """vmap over problem instances — the shape that crashed while_loop
    optimizers on the TPU worker must at least be expressible and correct."""

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    x0s = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (4, 6)))
    res = jax.vmap(lambda x0: minimize_lbfgs_fixed(rosen, x0, n_iter=400))(x0s)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)


def test_lbfgs_fixed_matches_reference_scipy():
    """Converged objective parity vs scipy L-BFGS-B on a logistic-like cost."""
    import scipy.optimize as sopt

    rng = np.random.default_rng(4)
    n, p = 60, 8
    X = rng.standard_normal((n, p))
    w_true = rng.standard_normal(p)
    y = rng.poisson(np.exp(np.clip(X @ w_true * 0.3, -3, 3))).astype(float)

    def np_cost(w):
        eta = X @ w
        return float(np.sum(np.exp(eta) - y * eta) + 0.5 * w @ w)

    ref = sopt.minimize(np_cost, np.zeros(p), method="L-BFGS-B",
                        options={"ftol": 1e-15, "gtol": 1e-12})
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    fun = lambda w: jnp.sum(jnp.exp(Xj @ w) - yj * (Xj @ w)) + 0.5 * w @ w
    res = minimize_lbfgs_fixed(fun, jnp.zeros(p), n_iter=150)
    assert abs(float(res.fun) - ref.fun) < 1e-9
