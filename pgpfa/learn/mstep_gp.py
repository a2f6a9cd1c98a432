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
    from pgpfa.ops.blockmat import logdet_psd_mixed, solve_psd_mixed

    K = rbf_kernel_from_gamma(p, dif_sq, eps)
    # mixed precision throughout: an f64 Cholesky here was the single biggest
    # phase of the Stevenson benchmark (0.6 s/EM-iter — f64 factorizations are
    # emulated on TPU); the f32-factor + f64-correction logdet and the
    # refined solve hold ~1e-12 accuracy (see pgpfa/ops/blockmat.py).
    logdet = logdet_psd_mixed(K)
    Kinv_ps = solve_psd_mixed(K, pauto_k)
    return 0.5 * num_trials * logdet + 0.5 * jnp.trace(Kinv_ps)


def tau_cost_with_prior(
    p, pauto_k, num_trials, dif_sq, bin_size_ms, old_tau, stepsize, eps: float = 0.001
):
    """Adds the online-EM proximal penalty ``0.5 (tau - tau_old)^2 / s^2``
    (reference ``funs/learning.py:681-724``; penalty applied in seconds)."""
    tau = log_gamma_to_tau(p, bin_size_ms)
    reg = 0.5 * (tau - old_tau) ** 2 / stepsize**2
    return tau_cost(p, pauto_k, num_trials, dif_sq, eps) + reg


def _tau_derivatives(p, pauto_k, num_trials, dif_sq, eps):
    """Analytic (grad, curvature) of :func:`tau_cost` via trace identities.

    With ``a = exp(p)``, ``S = (1-eps) exp(-a/2 difSq)``, ``K = S + eps I``::

        K'  = S * (-difSq a / 2)
        K'' = S * ((difSq a / 2)^2 - difSq a / 2)
        g   = 0.5 R tr(Kinv K') - 0.5 tr(Kinv K' Kinv P)
        h   = 0.5 R (tr(Kinv K'') - tr(M M))
              - 0.5 (tr(Kinv K'' Kinv P) - 2 tr(M N P-contraction))

    where ``M = Kinv K'``, ``N = M Kinv``. All matmuls — no nested autodiff
    through factorizations (which compiles catastrophically and faults on
    TPU; this replaced a ``jax.grad(jax.grad(tau_cost))`` formulation).
    """
    from pgpfa.ops.blockmat import inv_psd_mixed

    a = jnp.exp(p)
    T = dif_sq.shape[-1]
    S = (1.0 - eps) * jnp.exp(-0.5 * a * dif_sq)
    K = S + eps * jnp.eye(T, dtype=dif_sq.dtype)
    B = -0.5 * a * dif_sq
    Kp = S * B  # dK/dp
    Kpp = S * (B * B + B)  # d2K/dp2

    Kinv = inv_psd_mixed(K)
    M = Kinv @ Kp
    N = M @ Kinv  # Kinv K' Kinv (symmetric)
    g = 0.5 * num_trials * jnp.trace(M) - 0.5 * jnp.vdot(N, pauto_k)

    KinvKpp = Kinv @ Kpp
    tr_MM = jnp.vdot(M, M.T)
    dN = KinvKpp @ Kinv - 2.0 * (M @ N)
    h = 0.5 * num_trials * (jnp.trace(KinvKpp) - tr_MM) - 0.5 * jnp.vdot(dN, pauto_k)
    return g, h


def tau_grad(p, pauto_k, num_trials, dif_sq, eps: float = 0.001):
    return _tau_derivatives(p, pauto_k, num_trials, dif_sq, eps)[0]


def tau_hess(p, pauto_k, num_trials, dif_sq, eps: float = 0.001):
    return _tau_derivatives(p, pauto_k, num_trials, dif_sq, eps)[1]


def learn_tau(
    means: jnp.ndarray,
    vsm_gps: jnp.ndarray,
    tau0: jnp.ndarray,
    bin_size_ms: float,
    num_trials=None,
    prior: Optional[tuple] = None,
    eps: float = 0.001,
    maxiter: int = 12,
    precomp: Optional[jnp.ndarray] = None,
) -> TauResult:
    """Optimize every latent's timescale (jittable; latents batched).

    Args:
        prior: optional ``(old_tau, stepsize)`` proximal penalty (online EM).
        maxiter: fixed Newton iteration count (static).
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
    xdim = p0.shape[0]
    lane = jnp.arange(xdim)

    if prior is None:
        def cost_fn(k_p):
            k, p = k_p
            return tau_cost(p, precomp[k], num_trials, dif_sq, eps)

        def gh_fn(k_p):
            k, p = k_p
            return _tau_derivatives(p, precomp[k], num_trials, dif_sq, eps)
    else:
        old_tau, stepsize = prior
        old = jnp.asarray(old_tau).reshape(-1)

        def cost_fn(k_p):
            k, p = k_p
            return tau_cost_with_prior(
                p, precomp[k], num_trials, dif_sq, bin_size_ms, old[k], stepsize, eps
            )

        def gh_fn(k_p):
            k, p = k_p
            g, h = _tau_derivatives(p, precomp[k], num_trials, dif_sq, eps)
            tau = log_gamma_to_tau(p, bin_size_ms)
            g_reg = (tau - old[k]) / stepsize**2 * (-0.5 * tau)
            h_reg = (0.25 * tau**2 + (tau - old[k]) * 0.25 * tau) / stepsize**2
            return g + g_reg, h + h_reg

    x, f = _run_tau_newton(p0, lane, cost_fn, gh_fn, maxiter)

    return TauResult(
        tau=log_gamma_to_tau(x, bin_size_ms), cost=f,
        niter=jnp.full((xdim,), maxiter, dtype=jnp.int32),
    )


def _run_tau_newton(p0, lane, cost_fn, gh_fn, n_iter):
    """Fixed-iteration branchless guarded Newton over latents.

    TPU-first control flow: a FIXED number of iterations via ``lax.scan`` with
    best-so-far tracking — no ``while_loop``, no line-search loop, no
    data-dependent branching. (A vmapped while_loop formulation triggered a
    value-dependent TPU worker crash in this environment; beyond that, fixed
    iteration counts are the idiomatic XLA shape for cheap inner optimizers.)
    Each iteration tries the Newton step and a 4x-damped fallback and keeps
    the best objective seen, so progress is monotone; Newton's quadratic
    convergence makes ~20 iterations ample (validated to 1e-6 cost parity vs
    scipy in tests).
    """
    vcost = jax.vmap(lambda k, p: cost_fn((k, p)))
    vgh = jax.vmap(lambda k, p: gh_fn((k, p)))

    lane2 = jnp.concatenate([lane, lane])

    def body(carry, _):
        x, f = carry
        g, h = vgh(lane, x)
        newton = g / jnp.maximum(h, 1e-12)
        step = jnp.where(h > 1e-12, newton, jnp.clip(g, -1.0, 1.0))
        step = jnp.clip(step, -3.0, 3.0)
        cand1 = x - step
        cand2 = x - 0.25 * step
        # one batched eval for both candidates (halves the kernel count —
        # these tiny solves are launch-overhead-bound on TPU)
        f12 = vcost(lane2, jnp.concatenate([cand1, cand2]))
        f1, f2 = jnp.split(f12, 2)
        f1 = jnp.where(jnp.isfinite(f1), f1, jnp.inf)
        f2 = jnp.where(jnp.isfinite(f2), f2, jnp.inf)
        use2 = f2 < f1
        f_new = jnp.where(use2, f2, f1)
        x_new = jnp.where(use2, cand2, cand1)
        better = f_new < f
        return (jnp.where(better, x_new, x), jnp.where(better, f_new, f)), None

    (x, f), _ = jax.lax.scan(body, (p0, vcost(lane, p0)), None, length=n_iter)
    return x, f
