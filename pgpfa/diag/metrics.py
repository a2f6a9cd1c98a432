"""Fit-quality metrics (host-side NumPy; diagnostics, not a hot path).

Reference counterparts: ``subspaceAngle`` (``funs/util.py:338-367``),
``JSLogdetDiv`` (``funs/util.py:21-22``), ``getMeanCovYfromParams``
(``funs/util.py:24-39``).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla


def subspace_angle(F: np.ndarray, G: np.ndarray) -> float:
    """Largest principal angle between the column spaces of F and G.

    Columns are max-normalized before orthonormalization, matching the
    reference's preprocessing (``funs/util.py:348-354``).
    """
    F = np.asarray(F, dtype=float).copy()
    G = np.asarray(G, dtype=float).copy()
    F = F / F.max(axis=0, keepdims=True)
    G = G / G.max(axis=0, keepdims=True)
    qf = sla.orth(F)
    qg = sla.orth(G)
    s = sla.svd(qf.T @ qg, compute_uv=False)
    s = np.minimum(s, 1.0)
    return float(np.max(np.maximum(np.arccos(s), 0.0)))


def js_logdet_div(X: np.ndarray, Y: np.ndarray) -> float:
    """Jensen-Shannon-style log-determinant divergence between SPD matrices.

    Computed via ``slogdet`` — the reference's raw determinants
    (``funs/util.py:21-22``) overflow/underflow past ydim ~ 90 (intentional
    robustness fix, same policy as the other fixed reference bugs).
    """
    _, ld_mid = np.linalg.slogdet((X + Y) / 2.0)
    _, ld_x = np.linalg.slogdet(X)
    _, ld_y = np.linalg.slogdet(Y)
    return float(ld_mid - 0.5 * (ld_x + ld_y))


def mean_cov_y_from_params(params) -> tuple:
    """Model-implied per-bin spike-count mean and second moment.

    Log-normal-Poisson moments with ``Lambda = C C^T``::

        E[y_n]     = exp(Lambda_nn / 2 + d_n)
        E[y_n y_m] = E[y_n] E[y_m] exp(Lambda_nm / 2)   (n != m)
        E[y_n^2]   = E[y_n] + exp(Lambda_nn / 2) E[y_n]^2

    (reference ``funs/util.py:24-39``).
    """
    C = np.asarray(params["C"])
    d = np.asarray(params["d"]).reshape(-1)
    lam = C @ C.T
    ey = np.exp(0.5 * np.diag(lam) + d)
    eyy = np.outer(ey, ey) * np.exp(0.5 * lam)
    np.fill_diagonal(eyy, ey + np.exp(0.5 * np.diag(lam)) * ey**2)
    return ey, eyy


def cd_error_bars(params, Y, means, vsms) -> np.ndarray:
    """Inverse-Hessian standard errors for the packed (C, d) estimate.

    Reference ``funs/util.py:436-447`` (which numerically differentiates the
    gradient); here the exact autodiff Hessian of the M-step cost is used.

    Args:
        Y: counts ``(R, ydim, T)``; means/vsms: posterior moments.

    Returns:
        ``sqrt(diag(H^{-1}))`` over the packed vec(C, d) layout.
    """
    import jax.numpy as jnp

    from pgpfa.learn.mstep_obs import cd_hessian
    from pgpfa.models.params import pack_cd

    vec = pack_cd(jnp.asarray(params["C"]), jnp.asarray(np.ravel(params["d"])))
    H = np.asarray(
        cd_hessian(vec, jnp.asarray(Y, dtype=vec.dtype), jnp.asarray(means), jnp.asarray(vsms))
    )
    return np.sqrt(np.diag(np.linalg.inv(H)))


def mvnpdf(x, mean, cov) -> float:
    """Multivariate normal density (reference ``funs/util.py:475-480``).

    Computed in log space via ``slogdet`` — the reference's raw
    ``det(cov) ** -0.5`` under/overflows past ~350 dimensions (same
    robustness policy as :func:`js_logdet_div`)."""
    x = np.ravel(np.asarray(x, dtype=float))
    mean = np.ravel(np.asarray(mean, dtype=float))
    k = x.shape[0]
    resid = x - mean
    _, logdet = np.linalg.slogdet(cov)
    log_p = -0.5 * (
        k * np.log(2 * np.pi) + logdet + resid @ np.linalg.solve(cov, resid)
    )
    return float(np.exp(log_p))


def mvnpdf_use_inv_cov(x, mean, inv_cov) -> float:
    """MVN density from the precision matrix (reference ``funs/util.py:482-487``).

    Log-space ``slogdet`` form for the same robustness reason as
    :func:`mvnpdf`."""
    x = np.ravel(np.asarray(x, dtype=float))
    mean = np.ravel(np.asarray(mean, dtype=float))
    k = x.shape[0]
    resid = x - mean
    _, logdet_inv = np.linalg.slogdet(inv_cov)
    log_p = -0.5 * (k * np.log(2 * np.pi) - logdet_inv + resid @ (inv_cov @ resid))
    return float(np.exp(log_p))


def orthonormalized_trajectories(C: np.ndarray, means: np.ndarray) -> np.ndarray:
    """SVD-orthonormalized latent trajectories (reference ``funs/engine.py:515-521``).

    Args:
        means: posterior means ``(R, xdim, T)``.
    """
    _, D, Vt = sla.svd(np.asarray(C), full_matrices=False)
    M = np.diag(D) @ Vt
    return np.einsum("kl,rlt->rkt", M, np.asarray(means))
