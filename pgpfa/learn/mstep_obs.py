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
    """All-neurons batched Newton for the (C, d) M-step.

    TPU-first redesign of the reference's joint ``scipy.optimize.minimize``
    over vec(C, d) (``funs/learning.py:93-141``): the expected-complete-data
    cost SEPARATES per neuron — each neuron's ``q = xdim+1`` parameters are
    independent and the joint Hessian is block-diagonal — so the M-step is
    ``ydim`` tiny convex Newton problems solved simultaneously with a fixed
    iteration count of branchless guarded steps.

    MXU formulation: posterior-moment tensors over the flattened
    ``s = R*T`` sample axis are precomputed ONCE (``m``, ``V``, ``m (x) m``,
    ``m (x) V``, ``V (x) V``), so every per-iteration sufficient statistic is
    one ``(ydim, s) @ (s, x^k)`` matmul against the current Poisson rates —
    no per-neuron broadcast intermediates. The ``V (x) V`` tensor is
    ``s * xdim^4`` entries; precomputation is gated at xdim <= 8 with a
    contraction fallback above.

    Args:
        prior_blocks: optional ``(P (ydim, q, q), center (ydim, q))`` per-
            neuron Gaussian penalty ``0.5 (th - c)^T P_n (th - c)`` (online
            EM). The reference's joint-Hessian prior is exactly representable
            because the true joint Hessian IS block-diagonal per neuron.
    """
    from pgpfa.ops.blockmat import solve_psd_mixed

    R, ydim, T = Y.shape
    xdim = C0.shape[1]
    q = xdim + 1
    s = R * T
    dt = C0.dtype

    # -- precomputed moment tensors over the flattened sample axis ----------
    M2 = jnp.swapaxes(means, 1, 2).reshape(s, xdim)  # (s, x)
    Vf = vsms.reshape(s, xdim * xdim)  # (s, x^2)
    # Hessian-statistics form: MXU matmul form by default — (ydim, s) @
    # (s, x^k) against precomputed m (x) m / m (x) V / V (x) V tensors.
    # The contraction fallback (u = m + V c; the whole second-moment block is
    # one weighted outer product sum_s rate * u u^T) exists for large xdim,
    # where the x^4 tensor is prohibitive. MEASURED both ways in f64 at
    # Stevenson scale (xdim 5): the fallback's (ydim, s, x) f64 elementwise
    # intermediates cost 4x MORE than the emulated-matmul FLOPs they save
    # (cd M-step 163 -> 661 ms/EM-iter) — the matmul form stays for BOTH
    # dtypes at small xdim despite CLAUDE.md 9's einsum warning; rule 9's
    # "measure on-chip" applies in both directions.
    contraction = xdim > 8
    if not contraction:
        P2 = (M2[:, :, None] * M2[:, None, :]).reshape(s, xdim * xdim)  # m (x) m
        MV = (M2[:, :, None] * Vf[:, None, :]).reshape(s, xdim**3)  # m (x) V
        VV = (Vf[:, :, None] * Vf[:, None, :]).reshape(s, xdim**4)  # V (x) V
    else:
        V3 = vsms.reshape(s, xdim, xdim)
    Yf = jnp.swapaxes(Y, 0, 1).reshape(ydim, s)  # (ydim, s)
    Ym = Yf @ M2  # (ydim, x): sum_s y m
    Ysum = jnp.sum(Yf, axis=1)  # (ydim,)

    theta0 = jnp.concatenate([C0, d0[:, None]], axis=1)  # (ydim, q)

    if prior_blocks is not None:
        Pb, center = prior_blocks

    def rates(theta):
        C, dn = theta[:, :-1], theta[:, -1]
        O = (C[:, :, None] * C[:, None, :]).reshape(ydim, xdim * xdim)
        eta = C @ M2.T + 0.5 * (O @ Vf.T) + dn[:, None]  # (ydim, s)
        return jnp.exp(eta), O

    def cost_from(theta, rate):
        """Per-neuron costs (ydim,) from precomputed rates. sum_s y*hh is
        linear in theta -> exact from the precomputed Ym/Ysum; only the rate
        sum needs fresh work. The f64 exp inside rates() is the M-step's
        single biggest cost on TPU (~5.5 ms per call at Stevenson scale), so
        rates ride the scan carry and each candidate's exp is evaluated ONCE
        and reused for the next iteration's gradient/Hessian."""
        C, dn = theta[:, :-1], theta[:, -1]
        y_hh = jnp.sum(C * Ym, axis=1) + dn * Ysum
        f = -(y_hh - jnp.sum(rate, axis=1)) / R
        if prior_blocks is not None:
            dv = theta - center
            f = f + 0.5 * jnp.einsum("nq,nqp,np->n", dv, Pb, dv)
        return f

    def grad_hess(theta, rate):
        C, dn = theta[:, :-1], theta[:, -1]
        W = (rate @ Vf).reshape(ydim, xdim, xdim)  # sum rate * V
        rsum = jnp.sum(rate, axis=1)

        if contraction:
            # u = m + V c per (neuron, sample); the gradient's rate moment
            # and the Hessian's full second-moment block are one weighted
            # sum/outer-product of u — two-operand contractions only
            # (three-operand f64 einsums lower to tiny-matmul streams,
            # CLAUDE.md 9). U is (ydim, s, x): 50 MB f64 at Stevenson scale.
            U = M2[None] + jnp.einsum("skl,nl->nsk", V3, C)
            RU = rate[:, :, None] * U
            A1Wc = jnp.sum(RU, axis=1)  # (ydim, x): sum rate * u
            S_uu = jnp.einsum("nsk,nsl->nkl", RU, U)  # sum rate * u u^T
            H_cc = (S_uu + W) / R
        else:
            A1 = rate @ M2  # (ydim, x): sum rate * m
            Wc = jnp.einsum("nkl,nl->nk", W, C)  # sum rate * (V c)
            A1Wc = A1 + Wc
            S_mm = (rate @ P2).reshape(ydim, xdim, xdim)
            S_mv = (rate @ MV).reshape(ydim, xdim, xdim, xdim)  # [n,k,l,j]: m_k V_lj
            T2 = jnp.einsum("nklj,nj->nkl", S_mv, C)  # sum rate * m (Vc)^T
            S_vv = (rate @ VV).reshape(ydim, xdim, xdim, xdim, xdim)  # [n,k,i,l,j]
            T4 = jnp.einsum("nkilj,ni,nj->nkl", S_vv, C, C)
            H_cc = (S_mm + T2 + jnp.swapaxes(T2, 1, 2) + T4 + W) / R

        g_c = -(Ym - A1Wc) / R
        g_d = -(Ysum - rsum) / R
        g = jnp.concatenate([g_c, g_d[:, None]], axis=1)  # (ydim, q)

        H_cd = A1Wc / R  # (ydim, x)
        H_dd = rsum / R
        top = jnp.concatenate([H_cc, H_cd[:, :, None]], axis=2)
        bot = jnp.concatenate([H_cd, H_dd[:, None]], axis=1)[:, None, :]
        H = jnp.concatenate([top, bot], axis=1)  # (ydim, q, q)
        if prior_blocks is not None:
            g = g + jnp.einsum("nqp,np->nq", Pb, theta - center)
            H = H + Pb
        return g, H

    eye_q = jnp.eye(q, dtype=dt)

    def body(carry, _):
        # Single-candidate damped Newton: ONE f64 exp per iteration (the
        # dominant TPU cost of this M-step). A rejected step shrinks the
        # per-neuron damping 4x for the retry and an accepted step resets it
        # — same guarded-monotone behavior as evaluating both candidates,
        # at half the exp count. All comparisons are exact f64, so the
        # iterates stay deterministic across compilation contexts (the
        # fused-fit == host-loop equality test pins this).
        th, f, rate, tdamp, acc = carry
        g, H = grad_hess(th, rate)
        # SPD solve via f32 Cholesky + refinement: f64 LU/trisolve are
        # unusable on TPU (see pgpfa/ops/blockmat.py).
        step = jax.vmap(solve_psd_mixed)(H + 1e-10 * eye_q, g)
        cand = th - tdamp[:, None] * step
        rate_c, _ = rates(cand)
        f_c = cost_from(cand, rate_c)
        f_c = jnp.where(jnp.isfinite(f_c), f_c, jnp.inf)
        # f32 fast mode: true improvements near convergence fall below f32's
        # cost resolution; a strict test then rejects them and the shrinking
        # damping stalls the iterate short of the optimum. The slack is 0 in
        # f64, keeping the default mode's exact monotone semantics.
        slack = (0.0 if dt == jnp.float64 else 2e-6) * (1.0 + jnp.abs(f))
        better = f_c < f + slack
        b2 = better[:, None]
        # the slack governs ACCEPTANCE only; the carried per-neuron cost
        # takes the min so the reported cost stays monotone in f32 too
        # (in f64 slack = 0 and the min is a no-op — bit-identical).
        return (
            jnp.where(b2, cand, th),
            jnp.where(better, jnp.minimum(f_c, f), f),
            jnp.where(b2, rate_c, rate),
            jnp.where(better, jnp.ones_like(tdamp), 0.25 * tdamp),
            acc + jnp.any(better).astype(jnp.int32),
        ), None

    rate0, _ = rates(theta0)
    tdamp0 = jnp.ones((ydim,), dtype=dt)
    carry0 = (theta0, cost_from(theta0, rate0), rate0, tdamp0,
              jnp.asarray(0, dtype=jnp.int32))
    (th, f_n, rate_f, _, acc), _ = jax.lax.scan(body, carry0, None, length=n_iter)
    g, _ = grad_hess(th, rate_f)
    C, d = th[:, :-1], th[:, -1]
    # niter = EFFECTIVE iterations (scan steps where >= 1 neuron accepted a
    # step), the stall diagnostic for learningDetails — the scan itself always
    # runs the fixed n_iter budget (branchless TPU control flow)
    return CdResult(
        C=C, d=d, cost=jnp.sum(f_n), grad_norm=jnp.max(jnp.abs(g)),
        niter=acc,
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
