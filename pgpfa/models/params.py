"""Model parameters and GP kernel construction.

Conventions used throughout the package
---------------------------------------
* ``Y`` — spike counts, shape ``(ydim, T)`` per trial, ``(R, ydim, T)`` batched.
* ``X`` — latent trajectories, shape ``(xdim, T)``; when flattened the layout is
  latent-major, ``x = X.reshape(-1)`` (latent ``k`` occupies ``x[k*T:(k+1)*T]``),
  matching the block ordering of the reference's ``K_big``
  (reference ``funs/util.py:615-617``).
* ``K`` — the GP prior covariance is stored ONLY in its per-latent block form
  ``(xdim, T, T)``. The dense ``(xdim*T, xdim*T)`` block-diagonal matrix of the
  reference (``funs/util.py:599-619``) is never materialized; every contraction
  against it is an einsum over the block axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Params(NamedTuple):
    """Poisson-GPFA parameters (a JAX pytree).

    Mirrors the reference's parameter dict ``{'C','d','tau'}``
    (reference ``funs/util.py:550-558``).

    Attributes:
        C: loading matrix, shape ``(ydim, xdim)``.
        d: log-rate offsets, shape ``(ydim,)``.
        tau: GP timescales in **seconds**, shape ``(xdim,)``.
    """

    C: jnp.ndarray
    d: jnp.ndarray
    tau: jnp.ndarray

    @property
    def ydim(self) -> int:
        return self.C.shape[0]

    @property
    def xdim(self) -> int:
        return self.C.shape[1]

    @classmethod
    def from_dict(cls, p) -> "Params":
        return cls(
            C=jnp.asarray(p["C"]),
            d=jnp.asarray(p["d"]).reshape(-1),
            tau=jnp.asarray(p["tau"]).reshape(-1),
        )

    def to_dict(self):
        import numpy as np

        return {"C": np.asarray(self.C), "d": np.asarray(self.d), "tau": np.asarray(self.tau)}


def pack_cd(C: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Flatten (C, d) into a single vector.

    Layout parity with the reference (``funs/util.py:560-574``): the columns of
    ``C`` are stacked first, followed by ``d`` — i.e.
    ``[C[:, 0], C[:, 1], ..., C[:, xdim-1], d]``.
    """
    return jnp.concatenate([C.T.reshape(-1), d.reshape(-1)])


def unpack_cd(vec: jnp.ndarray, xdim: int, ydim: int):
    """Inverse of :func:`pack_cd` (reference ``funs/util.py:576-592``)."""
    C = vec[: xdim * ydim].reshape(xdim, ydim).T
    d = vec[xdim * ydim :]
    return C, d


def time_sqdist(T: int, dtype=jnp.float64) -> jnp.ndarray:
    """Squared time-bin index differences ``(i - j)^2``, shape ``(T, T)``.

    Matches ``precomp['difSq']`` of the reference (``funs/learning.py:154-157``).
    """
    t = jnp.arange(T, dtype=dtype)
    dt = t[:, None] - t[None, :]
    return dt * dt


def rbf_kernel(
    tau: jnp.ndarray,
    T: int,
    bin_size_ms: float,
    eps_noise: float = 0.001,
) -> jnp.ndarray:
    """Per-latent RBF (squared-exponential) kernel over time bins.

    ``K_k[i, j] = (1 - eps) * exp(-((i - j) * binSize)^2 / (2 * (tau_k * 1000)^2))
    + eps * I`` — semantics identical to the reference's triple-loop
    ``makeK_big`` (``funs/util.py:599-619``), but computed as one vectorized
    expression on device and returned in block form.

    Args:
        tau: timescales in seconds, shape ``(xdim,)``.
        T: number of time bins (static).
        bin_size_ms: bin width in milliseconds.
        eps_noise: diagonal jitter (reference default 0.001).

    Returns:
        ``(xdim, T, T)`` stack of kernel blocks.
    """
    tau = jnp.asarray(tau).reshape(-1)
    sq = time_sqdist(T, dtype=tau.dtype) * (float(bin_size_ms) ** 2)
    tau_ms = tau * 1000.0
    base = (1.0 - eps_noise) * jnp.exp(-0.5 * sq[None, :, :] / (tau_ms**2)[:, None, None])
    return base + eps_noise * jnp.eye(T, dtype=tau.dtype)[None, :, :]


def rbf_kernel_from_gamma(
    log_gamma: jnp.ndarray,
    dif_sq: jnp.ndarray,
    eps_noise: float = 0.001,
) -> jnp.ndarray:
    """RBF kernel in the M-step's ``p = log gamma`` parametrization.

    ``K = (1 - eps) * exp(-exp(p)/2 * difSq) + eps * I`` where ``difSq`` is in
    squared *bin* units — the form optimized by the reference's timescale
    M-step (``funs/learning.py:183-184``). ``gamma = 1 / tau_bins^2``.
    """
    T = dif_sq.shape[-1]
    base = (1.0 - eps_noise) * jnp.exp(-0.5 * jnp.exp(log_gamma) * dif_sq)
    return base + eps_noise * jnp.eye(T, dtype=dif_sq.dtype)


def tau_to_log_gamma(tau: jnp.ndarray, bin_size_ms: float) -> jnp.ndarray:
    """seconds -> ``p = log(1/tau_bins^2)`` (reference ``funs/learning.py:260,268``)."""
    tau_bins = tau * 1000.0 / bin_size_ms
    return jnp.log(1.0 / tau_bins**2)


def log_gamma_to_tau(p: jnp.ndarray, bin_size_ms: float) -> jnp.ndarray:
    """``p = log gamma`` -> seconds (reference ``funs/learning.py:290-292``)."""
    return jnp.exp(-0.5 * p) * bin_size_ms / 1000.0
