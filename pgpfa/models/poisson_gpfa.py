"""Poisson-GPFA log-densities in structured (kron-free) form.

The reference evaluates the negative unnormalized log posterior with dense
``C_big = kron(C, I_T)^T`` and ``K_bigInv = inv(K_big)`` materializations
(reference ``funs/inference.py:12-65``, ``funs/util.py:594-619``). Here every
quantity is computed from the small factors directly:

* ``A = C @ X + d[:, None]``            — the ``(ydim, T)`` linear predictor,
* prior terms contract per latent against ``Kinv`` blocks ``(xdim, T, T)``,
* the Hessian is kept in its structured form (time-diagonal observation part +
  latent-block-diagonal prior part) and only assembled densely for the
  ``(xdim*T, xdim*T)`` Cholesky solve.

All functions are pure and jit/vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from pgpfa.ops.blockmat import assemble_hessian


def linear_predictor(C: jnp.ndarray, d: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """``A = C X + d``; equals the reference's ``C_big.T @ xbar + d_big``
    reshaped to ``(ydim, T)`` (reference ``funs/inference.py:22``)."""
    return C @ X + d[:, None]


def prior_quad(X: jnp.ndarray, Kinv: jnp.ndarray) -> jnp.ndarray:
    """``x^T K_bigInv x`` via per-latent blocks: ``sum_k x_k^T Kinv_k x_k``."""
    return jnp.einsum("kt,ktu,ku->", X, Kinv, X)


def neg_log_posterior(
    X: jnp.ndarray, Y: jnp.ndarray, C: jnp.ndarray, d: jnp.ndarray, Kinv: jnp.ndarray
) -> jnp.ndarray:
    """Negative unnormalized log posterior of the latents for one trial.

    ``L = 1^T exp(A) - <Y, A> + 0.5 x^T K^{-1} x``
    (reference ``funs/inference.py:12-32``).

    Args:
        X: latents ``(xdim, T)``.
        Y: counts ``(ydim, T)``.
        Kinv: per-latent prior precision blocks ``(xdim, T, T)``.
    """
    A = linear_predictor(C, d, X)
    return jnp.sum(jnp.exp(A)) - jnp.vdot(Y, A) + 0.5 * prior_quad(X, Kinv)


def neg_log_posterior_grad(
    X: jnp.ndarray, Y: jnp.ndarray, C: jnp.ndarray, d: jnp.ndarray, Kinv: jnp.ndarray
) -> jnp.ndarray:
    """Gradient w.r.t. ``X``, shape ``(xdim, T)``.

    ``dL = C^T (exp(A) - Y) + K^{-1} x`` (reference ``funs/inference.py:34-48``).
    """
    A = linear_predictor(C, d, X)
    resid = jnp.exp(A) - Y
    return C.T @ resid + jnp.einsum("ktu,ku->kt", Kinv, X)


def hessian_weights(C: jnp.ndarray, expA: jnp.ndarray) -> jnp.ndarray:
    """Time-local observation curvature ``W[t, k, l] = sum_n C[n,k] C[n,l] exp(A[n,t])``.

    This is the structured equivalent of the reference's
    ``C_big @ diag(exp(A)) @ C_big.T`` sandwich (``funs/inference.py:50-65``).
    Computed as one ``(T, ydim) @ (ydim, xdim^2)`` matmul against the
    flattened outer products of C's rows — the three-operand einsum form
    lowers to T tiny ``(xdim, xdim)`` f64 matmuls on TPU (~12 ms per Newton
    iteration at Stevenson scale vs ~3 ms for this form).
    """
    ydim, xdim = C.shape
    CC = (C[:, :, None] * C[:, None, :]).reshape(ydim, xdim * xdim)
    return (expA.T @ CC).reshape(expA.shape[1], xdim, xdim)


def neg_log_posterior_hess(
    X: jnp.ndarray, Y: jnp.ndarray, C: jnp.ndarray, d: jnp.ndarray, Kinv: jnp.ndarray
) -> jnp.ndarray:
    """Dense ``(xdim*T, xdim*T)`` Hessian (for solves / posterior covariance)."""
    A = linear_predictor(C, d, X)
    W = hessian_weights(C, jnp.exp(A))
    return assemble_hessian(W, Kinv)
