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


def learn_cd(
    Y: jnp.ndarray,
    means: jnp.ndarray,
    vsms: jnp.ndarray,
    C0: jnp.ndarray,
    d0: jnp.ndarray,
    prior: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    maxiter: int = 500,
    tol: float = 1e-9,
) -> CdResult:
    """Optimize (C, d) from the current posterior moments (jittable).

    Args:
        prior: optional ``(inv_prior_cov, center_vec)`` proximal penalty for
            online EM (reference ``funs/learning.py:536-676``).
    """
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
