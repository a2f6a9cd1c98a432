"""M-step for the observation parameters (C, d).

Expected-complete-data Poisson cost (reference ``funs/learning.py:20-91``,
provenance: PLDS M-step, Macke/Buesing/Sahani 2015)::

    cost(C, d) = -(1/R) sum_{r,n,t} [ Y*hh - exp(hh + rho/2) ]
    hh[n, t]  = (C m_r)[n, t] + d[n]
    rho[n, t] = C[n] @ vsm_r[t] @ C[n]        (posterior-covariance correction)

The reference loops over trials in Python and hand-codes the gradient; here the
cost is one batched einsum expression over the stacked ``(R, ...)`` posterior
moments, the gradient comes from autodiff (validated against the analytic form
in tests), and the optimizer is the jittable L-BFGS from
:mod:`pgpfa.utils.optim`. Online-EM variants add a Gaussian prior centered at
the previous parameters (reference ``funs/learning.py:445-534``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pgpfa.models.params import pack_cd, unpack_cd
from pgpfa.utils.optim import minimize_lbfgs


class CdResult(NamedTuple):
    C: jnp.ndarray
    d: jnp.ndarray
    cost: jnp.ndarray
    grad_norm: jnp.ndarray
    niter: jnp.ndarray


def cd_cost(vec: jnp.ndarray, Y: jnp.ndarray, means: jnp.ndarray, vsms: jnp.ndarray) -> jnp.ndarray:
    """Negative expected complete-data log-likelihood of (C, d), /R.

    Args:
        vec: packed parameters (see :func:`pgpfa.models.params.pack_cd`).
        Y: counts ``(R, ydim, T)``.
        means: posterior means ``(R, xdim, T)``.
        vsms: per-bin posterior covariances ``(R, T, xdim, xdim)``.
    """
    R, ydim, _ = Y.shape
    xdim = means.shape[1]
    C, d = unpack_cd(vec, xdim, ydim)
    hh = jnp.einsum("nk,rkt->rnt", C, means) + d[None, :, None]
    quad = jnp.einsum("nk,rtkl,nl->rnt", C, vsms, C)
    rate = jnp.exp(hh + 0.5 * quad)
    return -jnp.sum(Y * hh - rate) / R


def cd_cost_with_prior(
    vec: jnp.ndarray,
    Y: jnp.ndarray,
    means: jnp.ndarray,
    vsms: jnp.ndarray,
    center: jnp.ndarray,
    inv_prior_cov: jnp.ndarray,
) -> jnp.ndarray:
    """Cost plus a Gaussian proximal penalty centered at the old parameters.

    ``cost + 0.5 (v - v0)^T P (v - v0)`` with ``P`` positive semidefinite.
    The reference encodes the same penalty with a negative-definite
    ``invPriorCov`` and a flipped sign (``funs/learning.py:482-486``); here the
    convention is the standard positive one.
    """
    dv = vec - center
    return cd_cost(vec, Y, means, vsms) + 0.5 * dv @ (inv_prior_cov @ dv)


def cd_hessian(vec: jnp.ndarray, Y, means, vsms) -> jnp.ndarray:
    """Exact Hessian of :func:`cd_cost` via autodiff.

    Replaces the reference's 4th-order finite-difference Jacobian of the
    gradient (``funs/util.py:377-434``, used at ``funs/learning.py:545-549``)
    for the online 'hess' update rule.
    """
    import jax

    return jax.hessian(cd_cost)(vec, Y, means, vsms)


def _neuron_rates(theta, means, vsms):
    """Per-neuron linear predictor pieces. theta = [c (xdim), d] for ONE neuron.

    Returns (hh (R, T), u (R, T, xdim), vc, rate (R, T)) where
    ``u = m + vsm c`` is d(hh + q/2)/dc.
    """
    c, dn = theta[:-1], theta[-1]
    hh = jnp.einsum("k,rkt->rt", c, means) + dn
    vc = jnp.einsum("rtkl,l->rtk", vsms, c)
    q = jnp.einsum("rtk,k->rt", vc, c)
    u = jnp.swapaxes(means, 1, 2) + vc  # (R, T, xdim)
    rate = jnp.exp(hh + 0.5 * q)
    return hh, u, vc, rate


def _neuron_cost(theta, y_n, means, vsms, R):
    hh, _, _, rate = _neuron_rates(theta, means, vsms)
    return -jnp.sum(y_n * hh - rate) / R


def _neuron_grad_hess(theta, y_n, means, vsms, R):
    """Analytic gradient and (xdim+1)^2 Hessian of one neuron's cost."""
    hh, u, vc, rate = _neuron_rates(theta, means, vsms)
    g_c = -(jnp.einsum("rt,rkt->k", y_n, means) - jnp.einsum("rt,rtk->k", rate, u)) / R
    g_d = -jnp.sum(y_n - rate) / R
    g = jnp.concatenate([g_c, g_d[None]])

    H_cc = (
        jnp.einsum("rt,rtk,rtl->kl", rate, u, u)
        + jnp.einsum("rt,rtkl->kl", rate, vsms)
    ) / R
    H_cd = jnp.einsum("rt,rtk->k", rate, u) / R
    H_dd = jnp.sum(rate) / R
    top = jnp.concatenate([H_cc, H_cd[:, None]], axis=1)
    bot = jnp.concatenate([H_cd, H_dd[None]])[None, :]
    H = jnp.concatenate([top, bot], axis=0)
    return g, H


def learn_cd_newton(
    Y: jnp.ndarray,
    means: jnp.ndarray,
    vsms: jnp.ndarray,
    C0: jnp.ndarray,
    d0: jnp.ndarray,
    prior_blocks: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    n_iter: int = 10,
) -> CdResult:
    """Per-neuron batched Newton for the (C, d) M-step.

    TPU-first redesign of the reference's joint ``scipy.optimize.minimize``
    over vec(C, d) (``funs/learning.py:93-141``): the expected-complete-data
    cost SEPARATES per neuron — each neuron's ``(xdim+1)`` parameters are
    independent and the joint Hessian is block-diagonal — so the M-step is
    ``ydim`` tiny convex Newton problems batched with ``vmap``: a fixed
    iteration count of branchless guarded steps with ``(xdim+1)^2`` solves.
    Replaces hundreds of coupled L-BFGS zoom-linesearch iterations.

    Args:
        prior_blocks: optional ``(P (ydim, q, q), center (ydim, q))`` per-
            neuron Gaussian penalty ``0.5 (th - c)^T P_n (th - c)`` (online
            EM). The reference's joint-Hessian prior is exactly representable
            because the true joint Hessian IS block-diagonal per neuron.
    """
    R = Y.shape[0]
    q = C0.shape[1] + 1
    theta0 = jnp.concatenate([C0, d0[:, None]], axis=1)  # (ydim, q)
    Yn = jnp.swapaxes(Y, 0, 1)  # (ydim, R, T): neurons are the mapped axis

    if prior_blocks is None:
        cost_fn = lambda th, y_n: _neuron_cost(th, y_n, means, vsms, R)
        gh_fn = lambda th, y_n: _neuron_grad_hess(th, y_n, means, vsms, R)
        extra = (Yn,)
    else:
        Pb, center = prior_blocks

        def cost_fn(th, y_n, P_n, c_n):
            dv = th - c_n
            return _neuron_cost(th, y_n, means, vsms, R) + 0.5 * dv @ (P_n @ dv)

        def gh_fn(th, y_n, P_n, c_n):
            g, H = _neuron_grad_hess(th, y_n, means, vsms, R)
            return g + P_n @ (th - c_n), H + P_n

        extra = (Yn, Pb, center)

    def solve_one(th0, *args):
        def body(carry, _):
            th, f = carry
            g, H = gh_fn(th, *args)
            # SPD solve via f32 Cholesky + refinement: f64 LU (jnp.linalg.solve)
            # is not implemented on TPU.
            from pgpfa.ops.blockmat import solve_psd_mixed

            Hj = H + 1e-10 * jnp.eye(q, dtype=th.dtype)
            step = solve_psd_mixed(Hj, g)
            cand1 = th - step
            cand2 = th - 0.25 * step
            f1 = cost_fn(cand1, *args)
            f2 = cost_fn(cand2, *args)
            f1 = jnp.where(jnp.isfinite(f1), f1, jnp.inf)
            f2 = jnp.where(jnp.isfinite(f2), f2, jnp.inf)
            use2 = f2 < f1
            f_new = jnp.where(use2, f2, f1)
            th_new = jnp.where(use2, cand2, cand1)
            better = f_new < f
            return (jnp.where(better, th_new, th), jnp.minimum(f_new, f)), None

        (th, f), _ = jax.lax.scan(body, (th0, cost_fn(th0, *args)), None, length=n_iter)
        g, _ = gh_fn(th, *args)
        return th, f, jnp.max(jnp.abs(g))

    th, f_n, gn = jax.vmap(solve_one)(theta0, *extra)
    C, d = th[:, :-1], th[:, -1]
    return CdResult(
        C=C, d=d, cost=jnp.sum(f_n), grad_norm=jnp.max(gn),
        niter=jnp.asarray(n_iter),
    )


def learn_cd(
    Y: jnp.ndarray,
    means: jnp.ndarray,
    vsms: jnp.ndarray,
    C0: jnp.ndarray,
    d0: jnp.ndarray,
    prior: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    maxiter: int = 500,
    tol: float = 1e-9,
    method: str = "newton",
) -> CdResult:
    """Optimize (C, d) from the current posterior moments (jittable).

    Args:
        prior: optional ``(inv_prior_cov, center_vec)`` proximal penalty in
            packed-vector form (online EM, reference
            ``funs/learning.py:536-676``). A dense prior forces the L-BFGS
            path; per-neuron block priors should use :func:`learn_cd_newton`.
        method: 'newton' (per-neuron batched Newton; default) or 'lbfgs'
            (joint L-BFGS over the packed vector).
    """
    if method == "newton" and prior is None:
        return learn_cd_newton(Y, means, vsms, C0, d0, n_iter=min(maxiter, 10))
    v0 = pack_cd(C0, d0)
    if prior is None:
        fun = lambda v: cd_cost(v, Y, means, vsms)
    else:
        P, center = prior
        fun = lambda v: cd_cost_with_prior(v, Y, means, vsms, center, P)
    res = minimize_lbfgs(fun, v0, maxiter=maxiter, tol=tol)
    C, d = unpack_cd(res.x, C0.shape[1], C0.shape[0])
    return CdResult(C=C, d=d, cost=res.fun, grad_norm=res.grad_norm, niter=res.niter)


def update_d_closed_form(Y: jnp.ndarray, means: jnp.ndarray, vsms: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """Closed-form d given C and posterior moments.

    Moment-matching the mean rate: ``exp(d_n) * mean_{r,t} exp((Cm)_n + q_n/2)
    = mean_{r,t} Y_n``, i.e. ``d = log(meanY) - log(mean(exp(Cm + q/2)))``.
    The reference's ``update_d_closedForm`` (``funs/learning.py:318-358``)
    computes the same quantity but applies ``log`` and the normalization in an
    inconsistent order in its final line (``funs/learning.py:355``); this is
    the mathematically consistent form (intentional deviation, documented).
    """
    mean_y = jnp.mean(Y, axis=(0, 2)) + 1e-5
    hh = jnp.einsum("nk,rkt->rnt", C, means)
    quad = jnp.einsum("nk,rtkl,nl->rnt", C, vsms, C)
    mean_rate = jnp.mean(jnp.exp(hh + 0.5 * quad), axis=(0, 2))
    return jnp.log(mean_y) - jnp.log(mean_rate)
