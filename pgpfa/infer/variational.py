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


def vi_posterior_mean(rho, Y_tr, C, K):
    """``-K C_big (lambda - ybar)`` in block form (reference ``funs/inference.py:193-194``)."""
    lmy = jnp.exp(rho) - Y_tr
    u = jnp.einsum("nk,nt->kt", C, lmy)
    return -jnp.einsum("ktu,ku->kt", K, u)


@partial(
    jax.jit,
    static_argnames=("compute_cov", "maxiter", "T", "bin_size_ms", "eps_noise"),
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
):
    """Batched dual variational inference over all trials.

    Returns:
        ``(InfRes, post_loglik, var_lower_bound, rho)`` mirroring the
        reference's ``(varInfRes, -post_lik, var_lowerBound, varOptimRes)``
        (``funs/inference.py:429-432``): ``post_loglik`` is minus the average
        Laplace objective evaluated at the VI posterior means;
        ``var_lower_bound`` is the average converged dual objective.
    """
    R, ydim, _ = Y.shape
    xdim = C.shape[1]
    K = rbf_kernel(tau, T, bin_size_ms, eps_noise)
    Kinv = blocks_inv(K)

    if rho_init is None:
        rho_init = jnp.zeros((R, ydim, T), dtype=C.dtype)

    # vmap over trials: every L-BFGS iteration becomes one batched
    # cost/gradient evaluation (batched f32 Cholesky + f64 refinement — MXU
    # work). Safe because the fixed-iteration scan optimizer has no
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
    dual = lambda r, y: dual_cost(r, y, C, d, K, Kinv, ridge)
    tshape = rho_init.shape[1:]
    init = jax.vmap(lambda r0, y: lbfgs_fixed_init(lambda r: dual(r, y), r0))(
        rho_init, Y)
    make_step = lambda n: lambda c: jax.vmap(
        lambda ci, y: lbfgs_fixed_steps(lambda r: dual(r, y), ci, n, tshape)
    )(c, Y)
    slack_coef = 1e-13 if C.dtype == jnp.float64 else 1e-6
    carry = lbfgs_chunked_driver(make_step, init, maxiter, chunk=25,
                                 slack_coef=slack_coef, gtol=gtol)
    rho, bound = carry[0].reshape(rho_init.shape), carry[1]
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
