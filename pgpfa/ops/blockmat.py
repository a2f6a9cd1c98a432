"""Structured (latent x time) block-matrix operators.

Matrices over the flattened latent space ``R^{xdim*T}`` (latent-major layout)
appearing in P-GPFA have a common structure:

    M[k*T + t, l*T + u] = delta_{tu} * W[t, k, l] + delta_{kl} * B[k, t, u]

i.e. a part that is diagonal in time (observation curvature, coupling latents
within a bin) plus a part that is block-diagonal in latents (the GP prior,
coupling time within a latent). Both the Laplace Hessian
(reference ``funs/inference.py:50-65``) and the variational posterior precision
(reference ``funs/inference.py:188-191``) have this form.

Helpers here assemble/disassemble the dense form needed for Cholesky solves and
extract the posterior second-moment views the M-step consumes
(``post_vsm`` / ``post_vsmGP``, reference ``funs/inference.py:164-172``).
"""

from __future__ import annotations

import jax.numpy as jnp


def assemble_hessian(W: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Assemble the dense ``(xdim*T, xdim*T)`` matrix from its two structured parts.

    Args:
        W: time-local part ``(T, xdim, xdim)`` (symmetric in the last two axes).
        B: latent-block-diagonal part ``(xdim, T, T)``.

    Returns:
        Dense symmetric matrix ``(xdim*T, xdim*T)`` in latent-major layout.
    """
    T, xdim, _ = W.shape
    eye_t = jnp.eye(T, dtype=W.dtype)
    eye_x = jnp.eye(xdim, dtype=W.dtype)
    # H4[k, t, l, u]
    H4 = jnp.einsum("tkl,tu->ktlu", W, eye_t) + jnp.einsum("ktu,kl->ktlu", B, eye_x)
    return H4.reshape(xdim * T, xdim * T)


def cov_views(cov: jnp.ndarray, xdim: int, T: int):
    """Extract the two posterior-covariance views used by the M-step.

    Args:
        cov: dense posterior covariance ``(xdim*T, xdim*T)``.

    Returns:
        ``(vsm, vsm_gp)`` where
        * ``vsm`` ``(T, xdim, xdim)`` — per-time-bin cross-latent covariance
          (reference's strided ``PostCovGP[kk::T, kk::T]``,
          ``funs/inference.py:169-172``),
        * ``vsm_gp`` ``(xdim, T, T)`` — per-latent temporal covariance
          (reference's ``PostCovGP[k*T:(k+1)*T, k*T:(k+1)*T]``,
          ``funs/inference.py:164-167``).
    """
    c4 = cov.reshape(xdim, T, xdim, T)
    vsm = jnp.einsum("ktlt->tkl", c4)
    vsm_gp = jnp.einsum("ktku->ktu", c4)
    return vsm, vsm_gp


def solve_psd(H: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Cholesky solve ``H^{-1} rhs`` for symmetric positive-definite ``H``."""
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(H)
    return jsl.cho_solve((L, True), rhs)


def inv_psd(H: jnp.ndarray) -> jnp.ndarray:
    """Cholesky-based inverse of a symmetric positive-definite matrix."""
    return solve_psd(H, jnp.eye(H.shape[-1], dtype=H.dtype))


def chol_logdet(M: jnp.ndarray) -> jnp.ndarray:
    """``log det`` of an SPD matrix via Cholesky (batched over leading axes)."""
    L = jnp.linalg.cholesky(M)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def blocks_inv(K: jnp.ndarray) -> jnp.ndarray:
    """Per-block SPD inverse of a ``(..., T, T)`` stack via Cholesky."""
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(K)
    eye = jnp.broadcast_to(jnp.eye(K.shape[-1], dtype=K.dtype), K.shape)
    return jsl.cho_solve((L, True), eye)
