"""Dual variational E-step.

Reference (``funs/inference.py:188-432``): per trial, optimize the dual
variable ``lambda in R^{ydim*T}`` of the variational Gaussian posterior with
bounded L-BFGS-B (or unconstrained in ``rho = log lambda``). Posterior mean is
``-K C_big (lambda - ybar)``; posterior precision is
``K^{-1} + C_big diag(lambda) C_big^T`` (plus a 1e-6 relative diagonal ridge).

TPU-native redesign: the unconstrained ``rho``-parametrization (the
reference's own alternative at ``funs/inference.py:222-256,352-399``) is the
primary path so the solve is an unconstrained L-BFGS that jits; trials are
vmapped so every cost evaluation is a batched structured-precision Cholesky.
Box-bounded L-BFGS-B has no jit-native equivalent — parity is asserted on the
converged variational bound, not on lambda iterates (SURVEY.md §7 hard part 4).

The dual solve is a FIXED-iteration branchless L-BFGS (``lax.scan``; see
``pgpfa/utils/optim.py``) so it vmaps over trials without while_loops — the
earlier optax-L-BFGS-under-vmap form crashed this TPU's Mosaic worker and had
to map trials sequentially. The log-determinant in the dual cost uses the
mixed-precision f32-factor + f64-Taylor-correction path
(``pgpfa.ops.blockmat.logdet_psd_mixed``) instead of an f64 Cholesky.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pgpfa.infer.laplace import InfRes
from pgpfa.models.params import Params, rbf_kernel
from pgpfa.models.poisson_gpfa import neg_log_posterior
from pgpfa.ops.blockmat import (
    assemble_hessian,
    blocks_inv,
    cov_views,
    inv_logdet_psd_mixed,
    inv_psd_mixed,
    logdet_psd_mixed,
)
from pgpfa.utils.optim import (
    lbfgs_chunked_driver,
    lbfgs_fixed_init,
    lbfgs_fixed_steps,
)


def _posterior_precision(lam, C, Kinv, ridge=1e-6):
    """Structured posterior precision + relative diagonal ridge
    (reference ``funs/inference.py:188-191``)."""
    from pgpfa.models.poisson_gpfa import hessian_weights

    W = hessian_weights(C, lam)
    prec = assemble_hessian(W, Kinv)
    return prec + ridge * jnp.diag(jnp.diag(prec))


def dual_cost(rho, Y_tr, C, d, K, Kinv, ridge=1e-6):
    """Dual objective in ``rho = log lambda`` space for one trial.

    Matches the reference's ``dualProblemRho`` (``funs/inference.py:222-244``):
    ``0.5 lmy^T Cb^T K Cb lmy - d^T lmy + 0.5 logdet(cov) + lam^T (rho - 1)``.

    Args:
        rho: ``(ydim, T)`` log dual variables.
        Y_tr: counts ``(ydim, T)``.
        K, Kinv: per-latent prior blocks ``(xdim, T, T)``.
    """
    lam = jnp.exp(rho)
    lmy = lam - Y_tr
    u = jnp.einsum("nk,nt->kt", C, lmy)  # C_big @ lmy in block form
    a = 0.5 * jnp.einsum("kt,ktu,ku->", u, K, u)
    b = -jnp.vdot(d, jnp.sum(lmy, axis=1))
    prec = _posterior_precision(lam, C, Kinv, ridge)
    c = -0.5 * logdet_psd_mixed(prec)  # = 0.5 * logdet(posterior covariance)
    e = jnp.vdot(lam, rho - 1.0)
    return a + b + c + e


def _posterior_sandwich_diag(Sig, C, ridge, xdim, T):
    """``diag(C_big^T Sigma C_big)`` as ``(ydim, T)`` — the per-observation
    posterior variance of the linear predictor — plus the matching ridge
    correction so the value is the EXACT derivative of the ridged logdet in
    :func:`dual_cost` (``d logdet(prec + ridge*diag(prec)) / d lam``).

    Computed as one ``(ydim, xdim^2) @ (xdim^2, T)`` matmul against the
    flattened per-time covariance blocks (MXU form; a three-operand einsum
    lowers to T tiny f64 matmuls on TPU — CLAUDE.md item 9)."""
    ydim = C.shape[0]
    vsm, _ = cov_views(Sig, xdim, T)  # (T, xdim, xdim)
    CC = (C[:, :, None] * C[:, None, :]).reshape(ydim, xdim * xdim)
    s = CC @ vsm.reshape(T, xdim * xdim).T
    return s + ridge * ((C * C) @ jnp.diagonal(vsm, axis1=1, axis2=2).T)


def _dual_eval(rho, Y_tr, C, d, K, Kinv, ridge):
    """Dual cost, rho-space gradient, and the structure-exploiting Newton
    direction at ``rho`` — ONE posterior-precision factorization for all
    three (the heavy op both the cost's logdet and the Newton solve need).

    The dual Hessian in lambda space is ``G + diag(1/lam) + 0.5 M∘M`` with
    ``G = C_big^T K C_big`` and ``M = C_big^T Sigma C_big`` — three PSD
    pieces (the dual is convex). Dropping the Hadamard-square term leaves
    ``G + diag(1/lam)``, whose inverse by the Woodbury identity has
    capacitance ``K^{-1} + C_big diag(lam) C_big^T`` — EXACTLY the posterior
    precision already factored for the logdet. So a damped-Newton step costs
    the same one factorization as an L-BFGS cost evaluation, but converges
    in ~10-20 iterations instead of ~100-150 x 3 evals (the round-4 finding
    that the dual's 12,600-dim curvature lives in a 700-dim space). Khan et
    al. 2013 ("Fast Dual Variational Inference...") is the public anchor for
    this decomposition; the reference's own dual is the same objective
    (``funs/inference.py:196-256``).
    """
    xdim, T = K.shape[0], K.shape[1]
    lam = jnp.exp(rho)
    lmy = lam - Y_tr
    u = jnp.einsum("nk,nt->kt", C, lmy)
    Ku = jnp.einsum("ktu,ku->kt", K, u)
    a = 0.5 * jnp.vdot(u, Ku)
    b = -jnp.vdot(d, jnp.sum(lmy, axis=1))
    e = jnp.vdot(lam, rho - 1.0)
    prec = _posterior_precision(lam, C, Kinv, ridge)
    Sig, ld = inv_logdet_psd_mixed(prec)
    f = a + b - 0.5 * ld + e
    h = -(C @ Ku) + d[:, None]  # linear predictor at the posterior mean
    s = _posterior_sandwich_diag(Sig, C, ridge, xdim, T)
    g = rho - h - 0.5 * s  # dual gradient in lambda space
    # Newton direction -(G + diag(1/lam))^{-1} g, Woodbury form; mapped to
    # rho space (d rho = d lam / lam) so positivity is automatic under exp.
    w = lam * g
    z = Sig @ jnp.einsum("nk,nt->kt", C, w).reshape(-1)
    drho = C @ z.reshape(xdim, T) - g
    return f, lam * g, drho


def _newton_vi_init(rho0, dtype):
    """Batched initial carry for :func:`_newton_vi_steps` (lanes lead)."""
    R = rho0.shape[0]
    return (
        rho0,
        jnp.full((R,), jnp.inf, dtype=dtype),
        jnp.zeros_like(rho0),  # rho-space gradient at the incumbent
        jnp.zeros_like(rho0),  # Newton direction at the incumbent
        rho0,  # next trial point
        jnp.ones((R,), dtype=dtype),  # backtracking step scale
    )


def _newton_vi_steps(carry, Y_tr, C, d, K, Kinv, ridge, n_iter, clip_step=15.0):
    """Advance one trial's damped dual-Newton carry by ``n_iter`` iterations.

    Branchless deferred-accept scheme (one :func:`_dual_eval` per iteration,
    so line-search probes cost no extra factorization): evaluate the trial
    point; if it improves the incumbent, accept it and re-grow the step
    scale, else halve the scale and re-propose from the incumbent. Monotone
    by construction; safe under vmap (no while_loops — CLAUDE.md item 4).
    ``clip_step`` bounds the log-space move so ``exp`` cannot overflow on a
    wild cold-start direction (the backtracking absorbs the clip).
    """

    def body(c):
        rho_b, f_b, g_b, dr_b, rho_try, t = c
        f_try, g_try, dr_try = _dual_eval(rho_try, Y_tr, C, d, K, Kinv, ridge)
        f_try = jnp.where(jnp.isfinite(f_try), f_try, jnp.inf)
        ok = f_try < f_b
        rho_b = jnp.where(ok, rho_try, rho_b)
        f_b = jnp.where(ok, f_try, f_b)
        g_b = jnp.where(ok, g_try, g_b)
        dr_b = jnp.where(ok, dr_try, dr_b)
        t = jnp.where(ok, jnp.minimum(1.0, 2.0 * t), 0.5 * t)
        rho_try = rho_b + t * jnp.clip(dr_b, -clip_step, clip_step)
        return rho_b, f_b, g_b, dr_b, rho_try, t

    c, _ = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=n_iter)
    return c


#: Batched widths at and above this are known to crash this TPU's Mosaic
#: worker when running the big chunked dual-L-BFGS program at Stevenson-like
#: shapes (width probes: 10 survives, 25/50/100 crash; toy shapes are fine at
#: any width). The far smaller dual-Newton program runs the full 100-trial
#: batch in ONE dispatch, so ``'auto'`` switches to it at these widths.
LBFGS_CRASH_WIDTH = 25


def resolve_vi_solver(solver: str, n_trials: int) -> str:
    """Resolve the ``'auto'`` dual-solver choice at trace time.

    ``'auto'`` (the :class:`pgpfa.em.fit.FitConfig` default) picks the damped
    dual-Newton solver for batched widths where the L-BFGS program is known to
    crash this TPU's worker (``n_trials >= LBFGS_CRASH_WIDTH``) and the
    round-2 L-BFGS path below that — both reach the same converged bound
    (tested), so the switch only changes wall-clock, never results beyond
    optimizer-stopping noise. Explicit ``'lbfgs'``/``'newton'`` are honored
    verbatim.
    """
    if solver == "auto":
        return "newton" if n_trials >= LBFGS_CRASH_WIDTH else "lbfgs"
    if solver not in ("lbfgs", "newton"):
        raise ValueError(f"unknown VI solver {solver!r}")
    return solver


def vi_posterior_mean(rho, Y_tr, C, K):
    """``-K C_big (lambda - ybar)`` in block form (reference ``funs/inference.py:193-194``)."""
    lmy = jnp.exp(rho) - Y_tr
    u = jnp.einsum("nk,nt->kt", C, lmy)
    return -jnp.einsum("ktu,ku->kt", K, u)


@partial(
    jax.jit,
    static_argnames=(
        "compute_cov", "maxiter", "T", "bin_size_ms", "eps_noise", "solver",
    ),
)
def vi_estep_from_arrays(
    C,
    d,
    tau,
    Y,
    T: int,
    bin_size_ms: float,
    rho_init=None,
    gtol: float = 1e-8,
    maxiter: int = 150,
    compute_cov: bool = True,
    eps_noise: float = 0.001,
    ridge: float = 1e-6,
    solver: str = "lbfgs",
):
    """Batched dual variational inference over all trials.

    Args:
        solver: ``'lbfgs'`` — fixed-scan L-BFGS on the rho-space dual (the
            round-2 path); ``'newton'`` — damped dual-Newton via the Woodbury
            identity (:func:`_dual_eval`), ~10-20x fewer posterior-precision
            factorizations per solve for the same converged bound (parity
            pinned by tests/test_variational.py). Both reach the same
            stationary point (the same dual gradient is driven to ``gtol``).
            ``'auto'`` picks per :func:`resolve_vi_solver` (Newton at batched
            widths where the L-BFGS program crashes this TPU's worker).

    Returns:
        ``(InfRes, post_loglik, var_lower_bound, rho)`` mirroring the
        reference's ``(varInfRes, -post_lik, var_lowerBound, varOptimRes)``
        (``funs/inference.py:429-432``): ``post_loglik`` is minus the average
        Laplace objective evaluated at the VI posterior means;
        ``var_lower_bound`` is the average converged dual objective.
    """
    R, ydim, _ = Y.shape
    xdim = C.shape[1]
    solver = resolve_vi_solver(solver, R)
    K = rbf_kernel(tau, T, bin_size_ms, eps_noise)
    Kinv = blocks_inv(K)

    if rho_init is None:
        rho_init = jnp.zeros((R, ydim, T), dtype=C.dtype)

    # vmap over trials: every optimizer iteration becomes one batched
    # cost/gradient evaluation (batched f32 Cholesky + f64 refinement — MXU
    # work). Safe because the fixed-iteration scan optimizers have no
    # while_loops (the previous formulation crashed this TPU's worker and
    # forced sequential lax.map; see CLAUDE.md).
    #
    # The scan is driven in CHUNKS under an outer while_loop (while OUTSIDE
    # the vmap — the crash-prone topology was a while_loop-based optimizer
    # INSIDE vmap): once every trial's dual has individually converged
    # (gradient tolerance) or stopped improving by more than its own rounding
    # slack over a whole chunk, the remaining budget is skipped
    # (:func:`pgpfa.utils.optim.lbfgs_chunked_driver` — exact ``maxiter``
    # budget, per-trial slack). Warm-started E-steps converge in a fraction
    # of ``maxiter``, so this is a pure wall-clock win with the identical
    # per-iteration body (chunk boundaries do not change the scan math; the
    # early exit changes the result only below the stall slack, orders of
    # magnitude inside the 1e-5 converged-bound parity budget).
    slack_coef = 1e-13 if C.dtype == jnp.float64 else 1e-6
    if solver == "newton":
        init = _newton_vi_init(rho_init, C.dtype)
        make_step = lambda n: lambda c: jax.vmap(
            lambda ci, y: _newton_vi_steps(ci, y, C, d, K, Kinv, ridge, n)
        )(c, Y)
        carry = lbfgs_chunked_driver(make_step, init, maxiter, chunk=5,
                                     slack_coef=slack_coef, gtol=gtol)
        rho, bound = carry[0], carry[1]
    elif solver == "lbfgs":
        dual = lambda r, y: dual_cost(r, y, C, d, K, Kinv, ridge)
        tshape = rho_init.shape[1:]
        init = jax.vmap(lambda r0, y: lbfgs_fixed_init(lambda r: dual(r, y), r0))(
            rho_init, Y)
        make_step = lambda n: lambda c: jax.vmap(
            lambda ci, y: lbfgs_fixed_steps(lambda r: dual(r, y), ci, n, tshape)
        )(c, Y)
        carry = lbfgs_chunked_driver(make_step, init, maxiter, chunk=25,
                                     slack_coef=slack_coef, gtol=gtol)
        rho, bound = carry[0].reshape(rho_init.shape), carry[1]
    else:
        raise ValueError(f"unknown VI solver {solver!r}")
    means = jax.vmap(lambda r, y: vi_posterior_mean(r, y, C, K))(rho, Y)

    def trial_cov(r):
        return inv_psd_mixed(_posterior_precision(jnp.exp(r), C, Kinv, ridge))

    cov = jax.vmap(trial_cov)(rho)
    vsm, vsm_gp = jax.vmap(lambda c: cov_views(c, xdim, T))(cov)

    obj = jax.vmap(lambda m, y: neg_log_posterior(m, y, C, d, Kinv))(means, Y)
    res = InfRes(
        post_mean=means,
        post_vsm=vsm,
        post_vsm_gp=vsm_gp,
        post_cov=cov if compute_cov else None,
        trial_obj=obj,
        newton_iters=jnp.zeros((R,), dtype=jnp.int32),
    )
    return res, -jnp.mean(obj), jnp.mean(bound), rho


def vi_estep(params: Params, Y, T: int, bin_size_ms: float, **kw):
    """Convenience wrapper taking a :class:`Params` pytree."""
    return vi_estep_from_arrays(params.C, params.d, params.tau, Y, T, bin_size_ms, **kw)
