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

    x, f, acc = _run_tau_newton(p0, lane, cost_fn, gh_fn, maxiter)

    # niter = per-latent ACCEPTED iteration counts (the stall diagnostic for
    # learningDetails); the scan always runs the fixed maxiter budget
    return TauResult(
        tau=log_gamma_to_tau(x, bin_size_ms), cost=f, niter=acc,
    )


# --------------------------------------------------------------------------
# banded (long-T) tau M-step: linear in T
# --------------------------------------------------------------------------


def _btd_kernel_blocks_p(p, nb: int, s: int, eps: float, dtype):
    """Banded RBF prior blocks in the M-step's ``p = log gamma`` space.

    Entries match :func:`pgpfa.models.params.rbf_kernel_from_gamma` (bin-unit
    squared distances) truncated past one block off the diagonal — the SAME
    banding the long-T E-step applies to the prior, so the banded cost is the
    E-step model's exact marginal likelihood term.
    """
    t = jnp.arange(s, dtype=dtype)
    d0 = t[:, None] - t[None, :]
    d1 = (t[:, None] + s) - t[None, :]
    a = jnp.exp(p)
    Kd_blk = (1.0 - eps) * jnp.exp(-0.5 * a * (d0 * d0)) + eps * jnp.eye(s, dtype=dtype)
    Kb_blk = (1.0 - eps) * jnp.exp(-0.5 * a * (d1 * d1))
    Kd = jnp.broadcast_to(Kd_blk, (nb, s, s))
    Kb = jnp.broadcast_to(Kb_blk, (max(nb - 1, 0), s, s))
    return Kd, Kb


def tau_cost_banded(p, means_blk, Vd, Vo, num_trials, eps: float = 0.001):
    """Per-latent banded GP marginal-likelihood term — O(T s^2), never dense.

    Replaces :func:`tau_cost`'s dense ``(T, T)`` logdet/solves for the long-T
    path (the scaling wall of reference ``funs/learning.py:175-255``; VERDICT
    round-2 directive 1). With ``P = sum_r m_r m_r^T + V`` and ``V`` banded::

        f(p) = 0.5 R logdet K + 0.5 sum_r m_r^T K^{-1} m_r
             + 0.5 [<Sel(K^{-1}).diag, Vd> + 2 <Sel(K^{-1}).off1, Vo>]

    The trace term is EXACT for the banded posterior covariance because V's
    off-band blocks are identically zero, so only the Takahashi-selected
    in-band blocks of ``K^{-1}`` are touched — the dense ``(xdim, T, T)``
    PautoSum of ``pauto_sum_banded`` is never materialized. ``jax.grad`` of
    this function is f64-exact via the custom derivative rules on the
    mixed-precision block primitive (``inv_logdet_psd_mixed_d``).

    Args:
        p: scalar ``log gamma``.
        means_blk: posterior means ``(R, nb, s)`` for this latent.
        Vd: summed-over-trials banded covariance diagonal blocks ``(nb, s, s)``.
        Vo: first-off-diagonal blocks ``(nb-1, s, s)`` (block ``(i+1, i)``).
    """
    from pgpfa.ops.blocktridiag import btd_factor, btd_selected_inverse, btd_solve

    nb, s = Vd.shape[0], Vd.shape[-1]
    Kd, Kb = _btd_kernel_blocks_p(p, nb, s, eps, Vd.dtype)
    fac = btd_factor(Kd, Kb)
    rhs = jnp.transpose(means_blk, (1, 2, 0))  # (nb, s, R) multi-RHS
    quad = jnp.vdot(rhs, btd_solve(fac, rhs))
    sel = btd_selected_inverse(fac)
    trv = jnp.vdot(sel.diag, Vd) + 2.0 * jnp.vdot(sel.off1, Vo)
    return 0.5 * num_trials * fac.logdet + 0.5 * (quad + trv)


def learn_tau_banded(
    means: jnp.ndarray,
    vsm_gp_diag: jnp.ndarray,
    vsm_gp_off: jnp.ndarray,
    tau0: jnp.ndarray,
    bin_size_ms: float,
    num_trials=None,
    prior: Optional[tuple] = None,
    eps: float = 0.001,
    maxiter: int = 16,
) -> TauResult:
    """Timescale M-step from BANDED posterior moments (jittable, O(T s^2)).

    Same optimum as :func:`learn_tau` up to the banding truncation (parity
    tested at moderate T); the optimizer is a fixed-iteration guarded SECANT
    Newton on the exact ``jax.grad`` of :func:`tau_cost_banded` — second
    derivatives are never formed (no nested autodiff through factorizations).

    Args:
        means: ``(R, xdim, T)`` posterior means.
        vsm_gp_diag: ``(R, xdim, nb, s, s)`` banded covariance diag blocks.
        vsm_gp_off: ``(R, xdim, nb-1, s, s)`` first-off-diagonal blocks.
        prior: optional ``(old_tau, stepsize)`` proximal penalty (online EM),
            identical semantics to :func:`learn_tau`.
    """
    R, xdim, nb, s, _ = vsm_gp_diag.shape
    T = nb * s
    if num_trials is None:
        num_trials = R
    dt = vsm_gp_diag.dtype
    num_trials = jnp.asarray(num_trials, dtype=dt)
    means_blk = means.reshape(R, xdim, nb, s)
    Vd = jnp.sum(vsm_gp_diag, axis=0)  # (xdim, nb, s, s)
    Vo = jnp.sum(vsm_gp_off, axis=0)  # (xdim, nb-1, s, s)
    p0 = tau_to_log_gamma(jnp.asarray(tau0).reshape(-1), bin_size_ms)

    if prior is None:
        def cost_one(p, k):
            return tau_cost_banded(
                p, means_blk[:, k], Vd[k], Vo[k], num_trials, eps)
    else:
        old_tau, stepsize = prior
        old = jnp.asarray(old_tau).reshape(-1)

        def cost_one(p, k):
            tau = log_gamma_to_tau(p, bin_size_ms)
            reg = 0.5 * (tau - old[k]) ** 2 / stepsize**2
            return tau_cost_banded(
                p, means_blk[:, k], Vd[k], Vo[k], num_trials, eps) + reg

    vg = jax.vmap(jax.value_and_grad(cost_one), in_axes=(0, 0))
    x, f, acc = _run_tau_secant(p0, jnp.arange(xdim), vg, maxiter)
    # niter = per-latent accepted iterations (see _run_tau_newton)
    return TauResult(
        tau=log_gamma_to_tau(x, bin_size_ms), cost=f, niter=acc,
    )


def _run_tau_secant(p0, lane, vg, n_iter):
    """Fixed-iteration branchless guarded SECANT Newton over latents.

    Same TPU-first shape as :func:`_run_tau_newton` (``lax.scan``, two damped
    candidates per iteration, best-so-far tracking) but curvature comes from
    a secant of consecutive exact gradients instead of an analytic Hessian —
    the banded cost's second derivative would require nested autodiff through
    the block factorization. Secant convergence is superlinear (phi ~ 1.62),
    so the fixed budget reaches the gradient-noise floor from EM warm starts.
    """
    lane2 = jnp.concatenate([lane, lane])

    def body(carry, _):
        x, f, g, xp, gp, acc = carry
        dx = x - xp
        h = jnp.where(jnp.abs(dx) > 1e-14, (g - gp) / jnp.where(dx == 0, 1.0, dx), 0.0)
        ok = jnp.isfinite(h) & (h > 1e-10)
        step = jnp.where(ok, g / jnp.where(ok, h, 1.0), jnp.clip(g, -0.5, 0.5))
        step = jnp.clip(step, -2.0, 2.0)
        cand1 = x - step
        cand2 = x - 0.25 * step
        f12, g12 = vg(jnp.concatenate([cand1, cand2]), lane2)
        f1, f2 = jnp.split(f12, 2)
        g1, g2 = jnp.split(g12, 2)
        f1 = jnp.where(jnp.isfinite(f1), f1, jnp.inf)
        f2 = jnp.where(jnp.isfinite(f2), f2, jnp.inf)
        use2 = f2 < f1
        f_new = jnp.where(use2, f2, f1)
        x_new = jnp.where(use2, cand2, cand1)
        g_new = jnp.where(use2, g2, g1)
        better = f_new < f
        # accepted: secant pair = (old iterate, old grad); rejected: keep the
        # best-so-far iterate but refresh the pair with the probe point so
        # the next curvature estimate uses new information
        return (
            jnp.where(better, x_new, x),
            jnp.where(better, f_new, f),
            jnp.where(better, g_new, g),
            jnp.where(better, x, x_new),
            jnp.where(better, g, g_new),
            acc + better.astype(jnp.int32),
        ), None

    f0, g0 = vg(p0, lane)
    # bootstrap the secant pair with a small probe displacement
    xp0 = p0 + 0.05
    fp0, gp0 = vg(xp0, lane)
    carry0 = (p0, f0, g0, xp0, gp0, jnp.zeros_like(lane, dtype=jnp.int32))
    (x, f, _, _, _, acc), _ = jax.lax.scan(body, carry0, None, length=n_iter)
    return x, f, acc


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
        x, f, acc = carry
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
        return (jnp.where(better, x_new, x), jnp.where(better, f_new, f),
                acc + better.astype(jnp.int32)), None

    acc0 = jnp.zeros_like(lane, dtype=jnp.int32)
    (x, f, acc), _ = jax.lax.scan(
        body, (p0, vcost(lane, p0), acc0), None, length=n_iter)
    return x, f, acc
