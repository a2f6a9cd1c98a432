"""M-step for the GP timescales (tau).

Per-latent GP marginal-likelihood objective in ``p = log gamma`` space
(reference ``funs/learning.py:145-293``; provenance: GPFA M-step, Yu et al.
2009)::

    -f(p) = 0.5 * R * logdet K(p) + 0.5 * <K(p)^{-1}, PautoSum_k>
    K(p)  = (1 - eps) exp(-exp(p)/2 * difSq) + eps I
    PautoSum_k = sum_r [ vsmGP_{r,k} + m_{r,k} m_{r,k}^T ]

The reference computes cost/grad with explicit inverse + a symmetric-vector
trick whose split index differs between cost (``ceil``,
``funs/learning.py:201``) and grad (``floor``, ``funs/learning.py:242``) — an
off-by-one for odd T. Here both come from the exact Cholesky-based expression
and autodiff (resolving that asymmetry in favor of the exact computation, per
SURVEY.md §7 build step 3), and the 1-D optimization is a safeguarded Newton
``vmap``-ed over latents.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from pgpfa.models.params import (
    log_gamma_to_tau,
    rbf_kernel_from_gamma,
    tau_to_log_gamma,
    time_sqdist,
)
from pgpfa.utils.optim import minimize_newton_scalar


class TauResult(NamedTuple):
    tau: jnp.ndarray  # (xdim,) seconds
    cost: jnp.ndarray  # (xdim,)
    niter: jnp.ndarray  # (xdim,)


def pauto_sum(means: jnp.ndarray, vsm_gps: jnp.ndarray) -> jnp.ndarray:
    """Per-latent posterior second moments summed over trials: ``(xdim, T, T)``.

    Equals the reference's ``precomp[xd]['PautoSum']``
    (``funs/learning.py:162-172``). This is the only statistic the tau M-step
    needs, and it is additive over trials — the ``psum``-reducible quantity for
    trial-sharded execution.
    """
    return jnp.einsum("rkt,rku->ktu", means, means) + jnp.sum(vsm_gps, axis=0)


def tau_cost(p: jnp.ndarray, pauto_k: jnp.ndarray, num_trials, dif_sq: jnp.ndarray, eps: float = 0.001) -> jnp.ndarray:
    """Negative per-latent GP marginal-likelihood term (to minimize)."""
    K = rbf_kernel_from_gamma(p, dif_sq, eps)
    L = jnp.linalg.cholesky(K)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    Kinv_ps = jsl.cho_solve((L, True), pauto_k)
    return 0.5 * num_trials * logdet + 0.5 * jnp.trace(Kinv_ps)


def tau_cost_with_prior(
    p, pauto_k, num_trials, dif_sq, bin_size_ms, old_tau, stepsize, eps: float = 0.001
):
    """Adds the online-EM proximal penalty ``0.5 (tau - tau_old)^2 / s^2``
    (reference ``funs/learning.py:681-724``; penalty applied in seconds)."""
    tau = log_gamma_to_tau(p, bin_size_ms)
    reg = 0.5 * (tau - old_tau) ** 2 / stepsize**2
    return tau_cost(p, pauto_k, num_trials, dif_sq, eps) + reg


def learn_tau(
    means: jnp.ndarray,
    vsm_gps: jnp.ndarray,
    tau0: jnp.ndarray,
    bin_size_ms: float,
    num_trials=None,
    prior: Optional[tuple] = None,
    eps: float = 0.001,
    maxiter: int = 100,
    precomp: Optional[jnp.ndarray] = None,
) -> TauResult:
    """Optimize every latent's timescale (jittable; latents vmapped).

    Args:
        prior: optional ``(old_tau, stepsize)`` proximal penalty (online EM).
        precomp: optionally pass a precomputed/``psum``-reduced ``PautoSum``
            ``(xdim, T, T)``; then ``num_trials`` must be given.
    """
    if precomp is None:
        precomp = pauto_sum(means, vsm_gps)
    if num_trials is None:
        num_trials = means.shape[0]
    num_trials = jnp.asarray(num_trials, dtype=precomp.dtype)
    T = precomp.shape[-1]
    dif_sq = time_sqdist(T, dtype=precomp.dtype)
    p0 = tau_to_log_gamma(jnp.asarray(tau0).reshape(-1), bin_size_ms)

    if prior is None:
        def solve_one(p_init, ps_k, _old):
            fun = lambda p: tau_cost(p, ps_k, num_trials, dif_sq, eps)
            return minimize_newton_scalar(fun, p_init, maxiter=maxiter)

        old = jnp.zeros_like(p0)
    else:
        old_tau, stepsize = prior

        def solve_one(p_init, ps_k, old_k):
            fun = lambda p: tau_cost_with_prior(
                p, ps_k, num_trials, dif_sq, bin_size_ms, old_k, stepsize, eps
            )
            return minimize_newton_scalar(fun, p_init, maxiter=maxiter)

        old = jnp.asarray(old_tau).reshape(-1)

    res = jax.vmap(solve_one)(p0, precomp, old)
    return TauResult(
        tau=log_gamma_to_tau(res.x, bin_size_ms), cost=res.fun, niter=res.niter
    )
