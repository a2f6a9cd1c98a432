"""Vendored NumPy/SciPy oracle implementation of Poisson-GPFA.

This module re-derives the reference's math (model equations at reference
``funs/util.py:624-627``; objectives at ``funs/inference.py:12-65,196-256`` and
``funs/learning.py:20-91,175-255``) as an independent, dense NumPy
implementation. It exists solely so the JAX/TPU package can be parity-tested
against a host-side ground truth at ~1e-6 log-likelihood tolerance
(BASELINE.json north-star) without importing the reference repo.

Everything here is intentionally simple and dense; it is NOT a performance
path.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla
import scipy.optimize as sopt


# ---------------------------------------------------------------- kernels

def rbf_block(tau_sec: float, T: int, bin_ms: float, eps: float = 0.001) -> np.ndarray:
    """One T x T squared-exponential kernel block with diagonal jitter."""
    idx = np.arange(T, dtype=float) * bin_ms
    sq = (idx[:, None] - idx[None, :]) ** 2
    return (1.0 - eps) * np.exp(-0.5 * sq / (tau_sec * 1000.0) ** 2) + eps * np.eye(T)


def k_big(tau: np.ndarray, T: int, bin_ms: float, eps: float = 0.001) -> np.ndarray:
    """Dense block-diagonal prior covariance over the latent-major layout."""
    return sla.block_diag(*[rbf_block(float(tk), T, bin_ms, eps) for tk in np.ravel(tau)])


def cd_big(C: np.ndarray, d: np.ndarray, T: int):
    """Dense lifted observation operator: ``Cb`` is (xdim*T, ydim*T)."""
    Cb = np.kron(C, np.eye(T)).T
    db = np.repeat(np.ravel(d), T)
    return Cb, db


# ---------------------------------------------------- laplace objective

def nlp(x, ybar, Cb, db, Kinv):
    """Negative unnormalized log posterior over flattened latents."""
    act = Cb.T @ x + db
    return np.sum(np.exp(act)) - ybar @ act + 0.5 * x @ (Kinv @ x)


def nlp_grad(x, ybar, Cb, db, Kinv):
    act = Cb.T @ x + db
    return Cb @ (np.exp(act) - ybar) + Kinv @ x


def nlp_hess(x, ybar, Cb, db, Kinv):
    act = Cb.T @ x + db
    return (Cb * np.exp(act)[None, :]) @ Cb.T + Kinv


def laplace_infer(Y, C, d, tau, bin_ms, x_init=None, eps: float = 0.001):
    """Per-trial Newton-CG mode finding + Gaussian posterior moments.

    Args:
        Y: counts, shape (R, ydim, T).

    Returns:
        dict with stacked 'post_mean' (R, xdim, T), 'post_vsm' (R, T, xdim, xdim),
        'post_vsm_gp' (R, xdim, T, T), 'trial_obj' (R,), 'post_loglik' scalar,
        'modes' (R, xdim*T) for warm starting.
    """
    R, ydim, T = Y.shape
    xdim = C.shape[1]
    Kb = k_big(tau, T, bin_ms, eps)
    Kinv = np.linalg.inv(Kb)
    Cb, db = cd_big(C, d, T)

    means, vsms, vsm_gps, objs, modes = [], [], [], [], []
    for r in range(R):
        ybar = Y[r].reshape(ydim * T)
        x0 = np.zeros(xdim * T) if x_init is None else np.ravel(x_init[r])
        res = sopt.minimize(
            nlp,
            x0,
            args=(ybar, Cb, db, Kinv),
            method="Newton-CG",
            jac=nlp_grad,
            hess=nlp_hess,
            options={"maxiter": 10000, "xtol": 1e-12},
        )
        H = nlp_hess(res.x, ybar, Cb, db, Kinv)
        cov = np.linalg.inv(H)
        c4 = cov.reshape(xdim, T, xdim, T)
        means.append(res.x.reshape(xdim, T))
        vsms.append(np.einsum("ktlt->tkl", c4))
        vsm_gps.append(np.einsum("ktku->ktu", c4))
        objs.append(res.fun)
        modes.append(res.x)

    objs = np.asarray(objs)
    return {
        "post_mean": np.asarray(means),
        "post_vsm": np.asarray(vsms),
        "post_vsm_gp": np.asarray(vsm_gps),
        "trial_obj": objs,
        "post_loglik": -float(np.mean(objs)),
        "modes": np.asarray(modes),
    }


# ------------------------------------------------------ M-step: C and d

def pack_cd(C, d):
    return np.concatenate([C.T.reshape(-1), np.ravel(d)])


def unpack_cd(vec, xdim, ydim):
    return vec[: xdim * ydim].reshape(xdim, ydim).T, vec[xdim * ydim :]


def cd_cost(vec, Y, means, vsms):
    """Expected-complete-data Poisson cost for (C, d), averaged over trials.

    cost = -(1/R) * sum_{r,n,t} [ y*hh - exp(hh + rho/2) ],
    hh = C m + d,  rho[n,t] = C[n] @ vsm[t] @ C[n].
    """
    R, ydim, T = Y.shape
    xdim = means.shape[1]
    C, d = unpack_cd(vec, xdim, ydim)
    quad = np.einsum("nk,rtkl,nl->rnt", C, vsms, C)
    hh = np.einsum("nk,rkt->rnt", C, means) + d[None, :, None]
    rate = np.exp(hh + 0.5 * quad)
    return -float(np.sum(Y * hh - rate)) / R


def cd_cost_grad(vec, Y, means, vsms):
    R, ydim, T = Y.shape
    xdim = means.shape[1]
    C, d = unpack_cd(vec, xdim, ydim)
    quad = np.einsum("nk,rtkl,nl->rnt", C, vsms, C)
    hh = np.einsum("nk,rkt->rnt", C, means) + d[None, :, None]
    rate = np.exp(hh + 0.5 * quad)
    resid = Y - rate
    gC = np.einsum("rnt,rkt->nk", resid, means) - np.einsum("rnt,rtkl,nl->nk", rate, vsms, C)
    gd = np.sum(resid, axis=(0, 2))
    return -pack_cd(gC, gd) / R


def learn_cd(Y, means, vsms, C0, d0, method="TNC", prior=None):
    """Optimize (C, d); `prior` optionally adds a Gaussian penalty
    0.5 * (v - v0)^T P (v - v0) with P positive semidefinite."""
    v0 = pack_cd(C0, d0)
    if prior is None:
        fun, jac = cd_cost, cd_cost_grad
        args = (Y, means, vsms)
    else:
        P, center = prior

        def fun(v, *a):
            dv = v - center
            return cd_cost(v, *a) + 0.5 * dv @ (P @ dv)

        def jac(v, *a):
            return cd_cost_grad(v, *a) + P @ (v - center)

        args = (Y, means, vsms)
    # BFGS honors the tight gtol; TNC's projected-gradient test leaves
    # ~1e-5 parameter slop that breaks 1e-6 trajectory parity.
    res = sopt.minimize(fun, v0, args=args, jac=jac, method=method,
                        options={"gtol": 1e-12} if method == "BFGS" else {"gtol": 1e-10})
    C, d = unpack_cd(res.x, C0.shape[1], C0.shape[0])
    return C, d, float(res.fun)


# -------------------------------------------------------- M-step: tau

def pauto_sum(means, vsm_gps):
    """Sum over trials of second moments per latent: (xdim, T, T)."""
    return np.einsum("rkt,rku->ktu", means, means) + np.sum(vsm_gps, axis=0)


def tau_cost(p, pauto_k, R, T, eps: float = 0.001):
    """Negative GP marginal-likelihood term in p = log(gamma) space."""
    idx = np.arange(T, dtype=float)
    sq = (idx[:, None] - idx[None, :]) ** 2
    K = (1.0 - eps) * np.exp(-0.5 * np.exp(p) * sq) + eps * np.eye(T)
    sign, logdet = np.linalg.slogdet(K)
    Kinv = np.linalg.inv(K)
    f = -0.5 * R * sign * logdet - 0.5 * np.sum(Kinv * pauto_k)
    return -f


def learn_tau(means, vsm_gps, tau0, bin_ms, R=None, eps: float = 0.001):
    """Per-latent 1-D optimization of the timescale (p-space, BFGS)."""
    xdim, T = means.shape[1], means.shape[2]
    if R is None:
        R = means.shape[0]
    ps = pauto_sum(means, vsm_gps)
    out = np.empty(xdim)
    costs = np.empty(xdim)
    for k in range(xdim):
        tau_bins = tau0[k] * 1000.0 / bin_ms
        p0 = np.log(1.0 / tau_bins**2)
        res = sopt.minimize(tau_cost, np.asarray([p0]), args=(ps[k], R, T, eps),
                            options={"gtol": 1e-8})
        out[k] = np.exp(-0.5 * float(res.x[0])) * bin_ms / 1000.0
        costs[k] = res.fun
    return out, costs


# --------------------------------------------------- variational dual

def vi_dual_cost(rho, ybar, Cb, db, Kb, Kinv):
    """Dual VI objective in rho = log(lambda) space, one trial.

    Matches the bounded-lambda dual of the reference
    (``funs/inference.py:196-213``), including the 1e-6 relative diagonal
    ridge inside the posterior covariance.
    """
    lam = np.exp(rho)
    lmy = lam - ybar
    u = Cb @ lmy
    prec = Kinv + (Cb * lam[None, :]) @ Cb.T
    cov = np.linalg.inv(prec + 1e-6 * np.diag(np.diag(prec)))
    _, ld = np.linalg.slogdet(cov)
    a = 0.5 * u @ (Kb @ u)
    b = -db @ lmy
    c = 0.5 * ld
    e = lam @ (rho - 1.0)
    return a + b + c + e


def vi_infer_trial(y, C, d, tau, bin_ms, rho0=None, eps: float = 0.001):
    """L-BFGS-B on rho for one trial; returns posterior moments + bound."""
    ydim, T = y.shape
    xdim = C.shape[1]
    Kb = k_big(tau, T, bin_ms, eps)
    Kinv = np.linalg.inv(Kb)
    Cb, db = cd_big(C, d, T)
    ybar = y.reshape(ydim * T)
    if rho0 is None:
        rho0 = np.zeros(ydim * T)
    res = sopt.minimize(vi_dual_cost, rho0, args=(ybar, Cb, db, Kb, Kinv),
                        method="L-BFGS-B", options={"maxiter": 20000, "ftol": 1e-14, "gtol": 1e-9})
    lam = np.exp(res.x)
    mean = -(Kb @ (Cb @ (lam - ybar)))
    prec = Kinv + (Cb * lam[None, :]) @ Cb.T
    cov = np.linalg.inv(prec + 1e-6 * np.diag(np.diag(prec)))
    return {
        "rho": res.x,
        "bound": float(res.fun),
        "mean": mean.reshape(xdim, T),
        "cov": cov,
        "nlp_at_mean": float(nlp(mean, ybar, Cb, db, Kinv)),
    }


# -------------------------------------------- online EM (six update rules)

def cd_hessian(vec, Y, means, vsms):
    """Exact dense Hessian of :func:`cd_cost` in packed-vector layout.

    The cost separates per neuron, so the Hessian is block-diagonal per
    neuron in the packed layout (columns of C first, then d): neuron ``n``
    owns indices ``{k*ydim + n : k} + {xdim*ydim + n}``. Derivation: with
    ``u = m + V c`` (the derivative of ``hh + q/2`` w.r.t. ``c``),
    ``H_cc = (1/R) sum_s rate * (u u^T + V)``, ``H_cd = (1/R) sum_s rate u``,
    ``H_dd = (1/R) sum_s rate``.
    """
    R, ydim, T = Y.shape
    xdim = means.shape[1]
    C, d = unpack_cd(vec, xdim, ydim)
    D = xdim * ydim + ydim
    H = np.zeros((D, D))
    # flattened sample axis
    M = np.transpose(means, (0, 2, 1)).reshape(R * T, xdim)
    V = vsms.reshape(R * T, xdim, xdim)
    for n in range(ydim):
        c = C[n]
        hh = M @ c + d[n]
        q = np.einsum("skl,k,l->s", V, c, c)
        rate = np.exp(hh + 0.5 * q)
        u = M + V @ c
        Hcc = (np.einsum("s,sk,sl->kl", rate, u, u) + np.einsum("s,skl->kl", rate, V)) / R
        Hcd = (rate @ u) / R
        Hdd = np.sum(rate) / R
        ic = np.arange(xdim) * ydim + n
        idn = xdim * ydim + n
        H[np.ix_(ic, ic)] = Hcc
        H[ic, idn] = Hcd
        H[idn, ic] = Hcd
        H[idn, idn] = Hdd
    return H


def tau_cost_with_prior(p, pauto_k, R, T, bin_ms, old_tau_sec, stepsize, eps: float = 0.001):
    """Tau cost plus the online proximal penalty, in seconds
    (reference ``funs/learning.py:681-724``: regularizer
    ``0.5 (tau - oldTau)^2 / s^2`` with ``tau = binSize/1000 * exp(-p/2)``)."""
    tau_sec = np.exp(-0.5 * float(np.ravel(p)[0])) * bin_ms / 1000.0
    reg = 0.5 * (tau_sec - old_tau_sec) ** 2 / stepsize**2
    return tau_cost(p, pauto_k, R, T, eps) + reg


def learn_tau_with_prior(means, vsm_gps, tau0, bin_ms, stepsize, R=None, eps: float = 0.001):
    """Per-latent prior-regularized timescale update (online EM)."""
    xdim, T = means.shape[1], means.shape[2]
    if R is None:
        R = means.shape[0]
    ps = pauto_sum(means, vsm_gps)
    out = np.empty(xdim)
    costs = np.empty(xdim)
    for k in range(xdim):
        tau_bins = tau0[k] * 1000.0 / bin_ms
        p0 = np.log(1.0 / tau_bins**2)
        res = sopt.minimize(
            tau_cost_with_prior, np.asarray([p0]),
            args=(ps[k], R, T, bin_ms, tau0[k], stepsize, eps),
            options={"gtol": 1e-10},
        )
        out[k] = np.exp(-0.5 * float(res.x[0])) * bin_ms / 1000.0
        costs[k] = res.fun
    return out, costs


def update_d_closed_form(Y, means, vsms, C):
    """Closed-form d via rate moment matching (the package's consistent form
    of reference ``funs/learning.py:318-358``; see
    ``pgpfa/learn/mstep_obs.py:update_d_closed_form`` for the deviation note)."""
    mean_y = Y.mean(axis=(0, 2)) + 1e-5
    hh = np.einsum("nk,rkt->rnt", C, means)
    quad = np.einsum("nk,rtkl,nl->rnt", C, vsms, C)
    mean_rate = np.exp(hh + 0.5 * quad).mean(axis=(0, 2))
    return np.log(mean_y) - np.log(mean_rate)


def learn_c_only(Y, means, vsms, C0, d_fixed, prior=None, method="BFGS"):
    """C-only optimization at fixed d (non-joint online path, reference
    ``funs/learning.py:360-442,634-676``). Packed layout: columns of C."""
    xdim, ydim = C0.shape[1], C0.shape[0]
    v0 = C0.T.reshape(-1)

    def fun(v):
        vec = np.concatenate([v, d_fixed])
        f = cd_cost(vec, Y, means, vsms)
        if prior is not None:
            P, center = prior
            dv = v - center
            f = f + 0.5 * dv @ (P @ dv)
        return f

    def jac(v):
        vec = np.concatenate([v, d_fixed])
        g = cd_cost_grad(vec, Y, means, vsms)[: xdim * ydim]
        if prior is not None:
            P, center = prior
            g = g + P @ (v - center)
        return g

    res = sopt.minimize(fun, v0, jac=jac, method=method,
                        options={"gtol": 1e-12} if method == "BFGS" else {"gtol": 1e-10})
    return res.x.reshape(xdim, ydim).T, float(res.fun)


ONLINE_METHODS = ("balancingGamma", "sequentialAverage", "fullyUpdateAll", "hess", "diag", "grad")


def online_em_fit(
    Y,
    C0,
    d0,
    tau0,
    bin_ms,
    idx_seq,
    method="diag",
    step_pow=0.75,
    max_em_iter=None,
    update_cd_jointly=True,
    fully_update_tau=False,
    cd_method="BFGS",
    eps: float = 0.001,
):
    """Online/stochastic EM with an injected minibatch index sequence.

    Mirrors the package's online M-step semantics (the six update rules of
    reference ``funs/engine.py:316-399`` and the prior-regularized M-steps of
    ``funs/learning.py:536-866``), with the package's documented deviations:
    uniform 1/R cost normalization, positive-definite initial prior precision
    (identity), exact analytic curvature instead of finite differences, and
    the consistent closed-form d.

    Args:
        idx_seq: sequence of integer index arrays, one minibatch per EM iter
            (inject the same sequence into ``pgpfa.em.fit.fit_loop`` via its
            ``batch_indices`` argument for trajectory-parity tests).
        max_em_iter: schedule length N for ``gamma = linspace(0, 1, N)``
            (defaults to ``len(idx_seq)``).
    """
    C, d, tau = C0.copy(), np.ravel(d0).copy().astype(float), np.ravel(tau0).copy().astype(float)
    xdim, ydim = C.shape[1], C.shape[0]
    N = max_em_iter if max_em_iter is not None else len(idx_seq)
    Dj = xdim * ydim + ydim
    Dc = xdim * ydim
    P = np.eye(Dj if update_cd_jointly else Dc)
    cumH = P.copy()
    hist = {"post_loglik": [], "cd_cost": [], "params": []}

    for n, idx in enumerate(idx_seq):
        Yb = Y[np.asarray(idx)]
        Rb = Yb.shape[0]
        inf = laplace_infer(Yb, C, d, tau, bin_ms, eps=eps)
        hist["post_loglik"].append(inf["post_loglik"])
        means, vsms, vsm_gps = inf["post_mean"], inf["post_vsm"], inf["post_vsm_gp"]
        gamma = n / max(N - 1, 1)
        stepsize = 1.0 / (n + 1) ** step_pow

        if method in ("balancingGamma", "sequentialAverage", "fullyUpdateAll"):
            Cn, dn, cost = learn_cd(Yb, means, vsms, C, d, method=cd_method)
            taun, _ = learn_tau(means, vsm_gps, tau, bin_ms, eps=eps)
            mix = {"balancingGamma": gamma, "sequentialAverage": 0.5, "fullyUpdateAll": 0.0}[method]
            C = mix * C + (1 - mix) * Cn
            d = mix * d + (1 - mix) * dn
            new_tau = mix * tau + (1 - mix) * taun
            tau = taun if fully_update_tau else new_tau
        else:
            taun, _ = learn_tau_with_prior(means, vsm_gps, tau, bin_ms, stepsize, eps=eps)
            if update_cd_jointly:
                v0 = pack_cd(C, d)
                if method == "diag":
                    P_use = np.eye(Dj) / stepsize**2
                elif method == "hess":
                    P_use = cd_hessian(v0, Yb, means, vsms) + P
                    P = P_use
                if method in ("diag", "hess"):
                    C, d, cost = learn_cd(Yb, means, vsms, C, d, method=cd_method, prior=(P_use, v0))
                else:  # 'grad': one damped Newton step on the minibatch cost
                    g = cd_cost_grad(v0, Yb, means, vsms)
                    H = cd_hessian(v0, Yb, means, vsms)
                    v = v0 - stepsize * np.linalg.solve(H + 1e-10 * np.eye(Dj), g)
                    C, d = unpack_cd(v, xdim, ydim)
                    cost = cd_cost(v, Yb, means, vsms)
                    cumH = cumH + H
            else:
                d = update_d_closed_form(Yb, means, vsms, C)
                vc0 = C.T.reshape(-1)
                if method == "diag":
                    P_use = np.eye(Dc) / stepsize**2
                elif method == "hess":
                    vec0 = np.concatenate([vc0, d])
                    P_use = cd_hessian(vec0, Yb, means, vsms)[:Dc, :Dc] + P
                    P = P_use
                if method in ("diag", "hess"):
                    C, cost = learn_c_only(Yb, means, vsms, C, d, prior=(P_use, vc0), method=cd_method)
                else:
                    vec0 = np.concatenate([vc0, d])
                    g = cd_cost_grad(vec0, Yb, means, vsms)[:Dc]
                    H = cd_hessian(vec0, Yb, means, vsms)[:Dc, :Dc]
                    vc = vc0 - stepsize * np.linalg.solve(H + 1e-10 * np.eye(Dc), g)
                    C = vc.reshape(xdim, ydim).T
                    cost = cd_cost(np.concatenate([vc, d]), Yb, means, vsms)
                    cumH = cumH + H
            tau = taun

        hist["cd_cost"].append(float(cost))
        hist["params"].append({"C": C.copy(), "d": d.copy(), "tau": tau.copy()})
    return hist


# ------------------------------------------------------------ full EM

def em_fit(Y, C0, d0, tau0, bin_ms, n_iter=3, cd_method="TNC", eps: float = 0.001):
    """Batch Laplace-EM, warm-started E-steps. Returns per-iter history."""
    C, d, tau = C0.copy(), np.ravel(d0).copy(), np.ravel(tau0).copy()
    modes = None
    hist = {"post_loglik": [], "cd_cost": [], "tau": [], "params": []}
    for _ in range(n_iter):
        inf = laplace_infer(Y, C, d, tau, bin_ms, x_init=modes, eps=eps)
        modes = inf["modes"].reshape(Y.shape[0], C.shape[1], -1)
        hist["post_loglik"].append(inf["post_loglik"])
        C, d, cost = learn_cd(Y, inf["post_mean"], inf["post_vsm"], C, d, method=cd_method)
        tau, _ = learn_tau(inf["post_mean"], inf["post_vsm_gp"], tau, bin_ms, eps=eps)
        hist["cd_cost"].append(cost)
        hist["tau"].append(tau.copy())
        hist["params"].append({"C": C.copy(), "d": d.copy(), "tau": tau.copy()})
    return hist
