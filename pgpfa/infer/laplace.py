"""Laplace E-step: batched Newton mode-finding on the latent posterior.

Reference semantics (``funs/inference.py:67-185``): for every trial, minimize
the negative unnormalized log posterior over ``x in R^{xdim*T}`` with Newton-CG,
then take posterior mean = mode and posterior covariance = ``inv(Hessian)`` at
the mode, extracting the per-latent ``(T, T)`` blocks (``post_vsmGP``) and the
per-time-bin ``(xdim, xdim)`` blocks (``post_vsm``).

TPU-native redesign: the per-trial ``scipy`` loop becomes ONE ``vmap``-batched
damped-Newton iteration under ``jit`` — every Newton step is a batched
structured-Hessian assembly + batched Cholesky solve (MXU work), with converged
trials frozen in the ``while_loop``. Warm-starting from the previous EM
iteration's modes (reference ``funs/engine.py:184-196``) is preserved by
threading the returned modes back in as ``x_init``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pgpfa.models.params import Params, rbf_kernel
from pgpfa.models.poisson_gpfa import linear_predictor, hessian_weights
from pgpfa.ops.blockmat import (
    assemble_hessian,
    blocks_inv,
    cov_views,
    inv_psd_structured,
    solve_psd_structured,
)


class InfRes(NamedTuple):
    """Posterior inference results, batched over trials.

    Field layout mirrors the reference's ``infRes`` dict
    (``funs/inference.py:176-180``), with lists replaced by stacked arrays.
    """

    post_mean: jnp.ndarray  # (R, xdim, T)
    post_vsm: jnp.ndarray  # (R, T, xdim, xdim)
    post_vsm_gp: jnp.ndarray  # (R, xdim, T, T)
    post_cov: Optional[jnp.ndarray]  # (R, xdim*T, xdim*T) or None
    trial_obj: jnp.ndarray  # (R,) converged objective values
    newton_iters: jnp.ndarray  # (R,) iterations used per trial

    def to_reference_dict(self):
        """Convert to the reference's list-of-arrays ``infRes`` format."""
        import numpy as np

        R = self.post_mean.shape[0]
        return {
            "post_mean": [np.asarray(self.post_mean[i]) for i in range(R)],
            "post_vsm": [np.asarray(self.post_vsm[i]) for i in range(R)],
            "post_vsmGP": [np.transpose(np.asarray(self.post_vsm_gp[i]), (1, 2, 0)) for i in range(R)],
            "post_cov": None if self.post_cov is None else [np.asarray(self.post_cov[i]) for i in range(R)],
        }


def _newton_solve(Y, X0, C, d, Kinv, weights, gtol, maxiter, max_backtracks=30):
    """Damped Newton for one trial. Shapes: Y (ydim,T), X0 (xdim,T).

    Termination: gradient inf-norm <= gtol, OR Newton decrement
    ``slope = g^T H^{-1} g <= 1e-12`` (expected remaining objective decrease
    ~ slope/2, i.e. well under the 1e-6 objective-parity budget). The
    decrement test is essential in f64: near the optimum the Armijo test
    stalls on 1-ULP rounding of the objective.
    """
    xdim, T = X0.shape
    D = xdim * T
    w = weights[:, None]
    t_min = 0.5**max_backtracks
    # dtype-calibrated tolerances: the f64 values are unreachable in the f32
    # fast mode and made every solve grind to maxiter with full backtracking
    # (measured 2.4x SLOWER than f64 before this).
    f64 = X0.dtype == jnp.float64
    dec_tol = 1e-12 if f64 else 3e-6
    slack_coef = 1e-13 if f64 else 5e-7

    Kinv32 = Kinv.astype(jnp.float32)

    def ls_eval(X, t, dX):
        """Objective at ``X - t dX`` returning (expA, f). The f64 exp is
        the E-step's per-iteration hot spot on TPU (~5.5 ms per call at
        Stevenson scale), so expA rides the carries and each point's exp
        is evaluated exactly ONCE — the accepted candidate's exp is reused by
        the gradient/Hessian instead of being recomputed."""
        Xt = X - t * dX
        A = linear_predictor(C, d, Xt)
        expA = jnp.exp(A)
        f = (
            jnp.sum(w * expA)
            - jnp.vdot(w * Y, A)
            + 0.5 * jnp.einsum("kt,ktu,ku->", Xt, Kinv, Xt)
        )
        return expA, f

    def grad_hess_from(X, expA):
        """Gradient + the Hessian's structured parts from a precomputed exp:
        the dense f64 Hessian is NEVER assembled (only an f32 copy for the
        factorization; all f64 products go through ``structured_mm`` — see
        pgpfa/ops/blockmat.py)."""
        G = C.T @ (w * (expA - Y)) + jnp.einsum("ktu,ku->kt", Kinv, X)
        W = hessian_weights(C, w * expA)
        L32 = jnp.linalg.cholesky(assemble_hessian(W.astype(jnp.float32), Kinv32))
        return G, W, L32

    def body(carry):
        # (G, W, L32, expA) ride in the carry so both grad_hess and the
        # exp run ONCE per accepted point.
        X, f, G, W, L32, expA, it, done = carry
        # f32 factorization + structured f64 iterative refinement: f64
        # triangular solves and dense f64 matmuls are pathologically slow on
        # TPU (see pgpfa/ops/blockmat.py).
        # ir_steps=1 (f64): one structured f64 refinement leaves relative
        # direction error ~(eps_f32 * kappa)^2 ~ 1e-8 — far below what Newton
        # needs (mode accuracy is set by the decrement test, not direction
        # noise). f32 fast mode: 0 — same-precision refinement is a no-op for
        # forward error and costs ~10 ms/body (CLAUDE.md rule 15).
        dX = solve_psd_structured(W, Kinv, G.reshape(D), L32,
                                  ir_steps=1 if f64 else 0).reshape(xdim, T)
        slope = jnp.vdot(G, dX)  # Newton decrement^2 = g^T H^{-1} g
        converged = slope <= dec_tol
        # 1-ULP slack: near the optimum f(X - t dX) can round a hair above f.
        slack = slack_coef * (1.0 + jnp.abs(f))

        def ls_cond(ls):
            t, f_try, _ = ls
            bad = ~jnp.isfinite(f_try) | (f_try > f - 1e-4 * t * slope + slack)
            return bad & (t > t_min)

        def ls_body(ls):
            t = 0.5 * ls[0]
            expA_t, f_try = ls_eval(X, t, dX)
            return t, f_try, expA_t

        expA1, f1 = ls_eval(X, 1.0, dX)
        t, f_try, expA_t = jax.lax.while_loop(
            ls_cond, ls_body, (1.0, f1, expA1)
        )
        accept = jnp.isfinite(f_try) & (f_try <= f + slack) & ~converged
        X_new = jnp.where(accept, X - t * dX, X)
        f_new = jnp.where(accept, jnp.minimum(f_try, f), f)
        # carried expA always matches the carried X
        expA_new = jnp.where(accept, expA_t, expA)
        G_new, W_new, L32_new = grad_hess_from(X_new, expA_new)
        if f64:
            stall = jnp.asarray(False)
        else:
            # f32 stall cutoff: an accepted step that improves f by less than
            # the rounding slack means the objective can no longer resolve
            # progress at this scale — the decrement test alone can sit just
            # above dec_tol on f32 gradient noise and grind a single trial to
            # maxiter (observed: one trial x 100 iters x full backtracking =
            # 2.7 s inside an otherwise 150 ms E-step, triggered by the
            # secant-extrapolated warm start at EM iteration 2). In f64 the
            # decrement test is reachable and this never fires.
            stall = accept & (f - f_try <= slack)
        done_new = converged | (jnp.max(jnp.abs(G_new)) <= gtol) | ~accept | stall
        # Freeze lanes that converged in an earlier iteration (vmapped
        # while_loop keeps executing the body for every lane until all stop).
        X_out = jnp.where(done, X, X_new)
        f_out = jnp.where(done, f, f_new)
        G_out = jnp.where(done, G, G_new)
        W_out = jnp.where(done, W, W_new)
        L32_out = jnp.where(done, L32, L32_new)
        expA_out = jnp.where(done, expA, expA_new)
        it_out = jnp.where(done, it, it + 1)
        return X_out, f_out, G_out, W_out, L32_out, expA_out, it_out, done | done_new

    def cond(carry):
        return (carry[-2] < maxiter) & ~carry[-1]

    expA0, f0 = ls_eval(X0, 0.0, X0)
    G0, W0, L32_0 = grad_hess_from(X0, expA0)
    done0 = jnp.max(jnp.abs(G0)) <= gtol
    X, f, _, W, L32, _, it, _ = jax.lax.while_loop(
        cond, body, (X0, f0, G0, W0, L32_0, expA0, jnp.asarray(0), done0)
    )
    # (W, L32) are evaluated AT the returned mode X (grad_hess runs once per
    # accepted step and frozen lanes carry their own consistent values), so
    # the caller can reuse the factorization for the posterior covariance.
    return X, f, it, W, L32


@partial(
    jax.jit,
    static_argnames=("compute_cov", "maxiter", "T", "bin_size_ms", "eps_noise"),
)
def laplace_estep_from_arrays(
    C,
    d,
    tau,
    Y,
    T: int,
    bin_size_ms: float,
    x_init=None,
    weights=None,
    gtol: float = 1e-8,
    maxiter: int = 100,
    compute_cov: bool = True,
    eps_noise: float = 0.001,
):
    """Batched Laplace inference over all trials.

    Args:
        C, d, tau: model parameters.
        Y: spike counts ``(R, ydim, T)``.
        x_init: warm-start modes ``(R, xdim, T)`` (zeros if None; reference
            ``funs/inference.py:99-102``).
        weights: optional per-neuron weights ``(ydim,)`` (1 = keep). Used to
            delete neurons for leave-one-out prediction (reference deletes rows
            of C/d/Y instead, ``funs/util.py:300-316`` — masking is the
            static-shape equivalent).
        compute_cov: keep the full ``(xdim*T)^2`` posterior covariance per
            trial. The M-step only needs the ``vsm``/``vsmGP`` views; full
            covariances are returned for API parity and diagnostics.

    Returns:
        ``(InfRes, post_loglik)`` where ``post_loglik = -mean(trial objectives)``
        matches the reference's second return value (``funs/inference.py:175,183``).
    """
    R, ydim, _ = Y.shape
    xdim = C.shape[1]
    K = rbf_kernel(tau, T, bin_size_ms, eps_noise)
    Kinv = blocks_inv(K)

    if x_init is None:
        x_init = jnp.zeros((R, xdim, T), dtype=C.dtype)
    if weights is None:
        weights = jnp.ones((ydim,), dtype=C.dtype)

    solve = jax.vmap(
        lambda y, x0: _newton_solve(y, x0, C, d, Kinv, weights, gtol, maxiter)
    )
    X, obj, iters, W_final, L32_final = solve(Y, x_init)

    def posterior_cov(W_tr, L32_tr):
        # (W, L32) come straight from the Newton solve's final iterate —
        # reusing the factorization saves a full batched Hessian reassembly
        # (exp + einsums) and a batched (xdim*T)^3 Cholesky per E-step.
        # The trailing f64 refinement step is REQUIRED: with an f32-floor
        # covariance the EM-trajectory parity degrades to ~4e-6 (> 1e-6
        # target; measured against the oracle) — the moments feed the M-step.
        # The refinement residual is computed structurally (never a dense
        # f64 matmul), and kappa(H) <~ 1e3-1e4 here makes the f32
        # Newton-Schulz steps unnecessary: cho_solve + ONE f64 step already
        # lands at ~1e-10 (measured at both toy and Stevenson conditioning).
        return inv_psd_structured(W_tr, Kinv, ns_steps=1, f64_steps=1, L32=L32_tr)

    cov = jax.vmap(posterior_cov)(W_final, L32_final)
    vsm, vsm_gp = jax.vmap(lambda c: cov_views(c, xdim, T))(cov)

    res = InfRes(
        post_mean=X,
        post_vsm=vsm,
        post_vsm_gp=vsm_gp,
        post_cov=cov if compute_cov else None,
        trial_obj=obj,
        newton_iters=iters,
    )
    post_loglik = -jnp.mean(obj)
    return res, post_loglik


def laplace_estep(params: Params, Y, T: int, bin_size_ms: float, **kw):
    """Convenience wrapper taking a :class:`Params` pytree."""
    return laplace_estep_from_arrays(params.C, params.d, params.tau, Y, T, bin_size_ms, **kw)
