"""Shim for the reference's ``funs/learning.py`` public surface.

``infRes`` may be either the reference's dict-of-lists format or a
:class:`pgpfa.infer.laplace.InfRes`.
"""

import numpy as np

import jax.numpy as jnp

from pgpfa.data.synthetic import stack_experiment
from pgpfa.infer.laplace import InfRes
from pgpfa.learn.mstep_gp import learn_tau
from pgpfa.learn.mstep_obs import learn_cd


def _moments(infRes):
    if isinstance(infRes, InfRes):
        return infRes.post_mean, infRes.post_vsm, infRes.post_vsm_gp
    means = jnp.asarray(np.stack(infRes["post_mean"]))
    vsm = jnp.asarray(np.stack(infRes["post_vsm"]))
    vsm_gp = jnp.asarray(np.stack([np.transpose(v, (2, 0, 1)) for v in infRes["post_vsmGP"]]))
    return means, vsm, vsm_gp


def updateParams(oldParams, infRes, experiment, CdOptimMethod="newton", CdMaxIter=None,
                 tauMaxIter=None, verbose=False):
    """Batch M-step (reference ``funs/learning.py:295-309``).

    Returns ``(newParams, optimDetails)`` with the reference's dict shapes.
    """
    means, vsm, vsm_gp = _moments(infRes)
    Y = jnp.asarray(stack_experiment(experiment), dtype=means.dtype)
    C0 = jnp.asarray(oldParams["C"])
    d0 = jnp.asarray(np.ravel(oldParams["d"]))
    tau0 = jnp.asarray(np.ravel(oldParams["tau"]))
    cd = learn_cd(Y, means, vsm, C0, d0, maxiter=CdMaxIter or 10)
    tr = learn_tau(means, vsm_gp, tau0, float(experiment.binSize),
                   maxiter=tauMaxIter or 8)
    new_params = {"C": np.asarray(cd.C), "d": np.asarray(cd.d), "tau": np.asarray(tr.tau)}
    details = {"Cd": float(cd.cost), "tau": np.asarray(tr.cost)}
    return new_params, details


def makePrecomp(infRes):
    """Reference ``funs/learning.py:145-173``: list of per-latent dicts with
    the summed posterior second moments."""
    from pgpfa.learn.mstep_gp import pauto_sum

    means, _, vsm_gp = _moments(infRes)
    ps = np.asarray(pauto_sum(means, vsm_gp))
    xdim, T = means.shape[1], means.shape[2]
    idx = np.arange(T, dtype=float)
    tdif = idx[:, None] - idx[None, :]
    return [
        {"T": T, "Tdif": tdif, "difSq": tdif * tdif,
         "numTrials": means.shape[0], "PautoSum": ps[k]}
        for k in range(xdim)
    ]


# -- drivers (reference funs/learning.py:93-141, 257-293) --------------------


def learnLTparams(oldParams, infRes, experiment, CdOptimMethod="newton",
                  CdMaxIter=None, verbose=False):
    """Batch (C, d) M-step driver (reference ``funs/learning.py:93-141``).
    Returns ``(newC, newd, costFun)``."""
    means, vsm, _ = _moments(infRes)
    Y = jnp.asarray(stack_experiment(experiment), dtype=means.dtype)
    cd = learn_cd(Y, means, vsm, jnp.asarray(oldParams["C"]),
                  jnp.asarray(np.ravel(oldParams["d"])), maxiter=CdMaxIter or 10)
    return np.asarray(cd.C), np.asarray(cd.d), float(cd.cost)


def learnGPparams(oldParams, infRes, experiment, tauOptimMethod=None, verbose=False):
    """Batch tau M-step driver (reference ``funs/learning.py:257-293``).
    Returns ``(newTau, optimizeDetails)``."""
    means, _, vsm_gp = _moments(infRes)
    tr = learn_tau(means, vsm_gp, jnp.asarray(np.ravel(oldParams["tau"])),
                   float(experiment.binSize))
    return np.asarray(tr.tau), [{"cost": float(c)} for c in np.asarray(tr.cost)]


# -- public cost functions (reference funs/learning.py:20-91, 175-255) -------


def MStepObservationCost(vecCd, xdim, ydim, experiment, infRes):
    """Expected-complete-data (C, d) cost over the packed vector
    (reference ``funs/learning.py:20-49``; normalized by numTrials)."""
    from pgpfa.oracle import oracle_np as O

    means, vsm, _ = _moments(infRes)
    Y = np.asarray(stack_experiment(experiment), dtype=float)
    return float(O.cd_cost(np.asarray(vecCd, float), Y, np.asarray(means), np.asarray(vsm)))


def MStepObservationCost_grad(vecCd, xdim, ydim, experiment, infRes):
    """Analytic gradient of :func:`MStepObservationCost`
    (reference ``funs/learning.py:51-91``)."""
    from pgpfa.oracle import oracle_np as O

    means, vsm, _ = _moments(infRes)
    Y = np.asarray(stack_experiment(experiment), dtype=float)
    return O.cd_cost_grad(np.asarray(vecCd, float), Y, np.asarray(means), np.asarray(vsm))


def MStepGPtimescaleCost(p, precomp, epsNoise=0.001):
    """Per-latent GP-timescale cost in ``p = log gamma`` space
    (reference ``funs/learning.py:175-214``; exact symmetric computation
    instead of the reference's ceil/floor-split vector trick)."""
    from pgpfa.oracle import oracle_np as O

    return float(O.tau_cost(np.ravel(p)[0], precomp["PautoSum"],
                            precomp["numTrials"], precomp["T"], epsNoise))


def MStepGPtimescaleCost_grad(p, precomp, epsNoise=0.001):
    """Analytic gradient of :func:`MStepGPtimescaleCost`
    (reference ``funs/learning.py:216-255``)."""
    from pgpfa.learn.mstep_gp import tau_grad

    g = tau_grad(jnp.asarray(np.ravel(p)[0], dtype=jnp.float64),
                 jnp.asarray(precomp["PautoSum"]),
                 precomp["numTrials"],
                 jnp.asarray(precomp["difSq"], dtype=jnp.float64),
                 epsNoise)
    return np.asarray([float(g)])


def MStepGPtimescaleCostWithPrior(p, precomp, epsNoise, binSize, oldTau,
                                  regularizer_stepsize_tau):
    """Prior-regularized tau cost (reference ``funs/learning.py:681-724``):
    adds ``0.5 (tau - oldTau)^2 / s^2`` with tau in seconds."""
    from pgpfa.oracle import oracle_np as O

    return float(O.tau_cost_with_prior(
        np.ravel(p)[0], precomp["PautoSum"], precomp["numTrials"],
        precomp["T"], binSize, oldTau, regularizer_stepsize_tau, epsNoise))


def MStepObservationCostWithPrior(vecCd, oldParams, xdim, ydim, experiment,
                                  infRes, invPriorCov):
    """Reference ``funs/learning.py:445-486``: cost plus the Gaussian prior
    term in the REFERENCE's sign convention (``invPriorCov`` negative
    definite encodes a positive proximal penalty):
    ``datacost/numTrials - 0.5 dv^T invPriorCov dv``."""
    from pgpfa.models.params import pack_cd as _pack

    base = MStepObservationCost(vecCd, xdim, ydim, experiment, infRes)
    v0 = np.asarray(_pack(jnp.asarray(oldParams["C"]),
                          jnp.asarray(np.ravel(oldParams["d"]))))
    dv = np.asarray(vecCd, float) - v0
    return base - 0.5 * float(dv @ (np.asarray(invPriorCov) @ dv))


def MStepObservationCostWithPrior_grad(vecCd, oldParams, xdim, ydim,
                                       experiment, infRes, invPriorCov):
    """Gradient of :func:`MStepObservationCostWithPrior`
    (reference ``funs/learning.py:488-534``)."""
    from pgpfa.models.params import pack_cd as _pack

    g = MStepObservationCost_grad(vecCd, xdim, ydim, experiment, infRes)
    v0 = np.asarray(_pack(jnp.asarray(oldParams["C"]),
                          jnp.asarray(np.ravel(oldParams["d"]))))
    dv = np.asarray(vecCd, float) - v0
    return g - np.asarray(invPriorCov) @ dv


def MStep_C_costWithPrior(vecC, oldParams, xdim, ydim, experiment, infRes,
                          invPriorCov):
    """C-only cost at fixed d (reference ``funs/learning.py:360-397``).

    Faithful to the reference: ``vecC`` is the ROW-major flatten of C, the
    data term is NOT normalized by numTrials, and ``invPriorCov`` may be
    ``None`` (no prior) or negative definite (reference sign convention).
    """
    from pgpfa.oracle import oracle_np as O

    means, vsm, _ = _moments(infRes)
    Y = np.asarray(stack_experiment(experiment), dtype=float)
    R = Y.shape[0]
    C = np.asarray(vecC, float).reshape(ydim, xdim)
    d = np.ravel(np.asarray(oldParams["d"], float))
    vec = np.concatenate([C.T.reshape(-1), d])
    f = O.cd_cost(vec, Y, np.asarray(means), np.asarray(vsm)) * R
    if invPriorCov is not None:
        dv = np.asarray(vecC, float) - np.asarray(oldParams["C"], float).reshape(-1)
        f = f - 0.5 * float(dv @ (np.asarray(invPriorCov) @ dv))
    return f


def MStep_C_costWithPrior_grad(vecC, oldParams, xdim, ydim, experiment,
                               infRes, invPriorCov):
    """Gradient of :func:`MStep_C_costWithPrior`
    (reference ``funs/learning.py:399-442``)."""
    from pgpfa.oracle import oracle_np as O

    means, vsm, _ = _moments(infRes)
    Y = np.asarray(stack_experiment(experiment), dtype=float)
    R = Y.shape[0]
    C = np.asarray(vecC, float).reshape(ydim, xdim)
    d = np.ravel(np.asarray(oldParams["d"], float))
    vec = np.concatenate([C.T.reshape(-1), d])
    gcol = O.cd_cost_grad(vec, Y, np.asarray(means), np.asarray(vsm))[: xdim * ydim] * R
    g = gcol.reshape(xdim, ydim).T.reshape(-1)  # column-packed -> row-major
    if invPriorCov is not None:
        dv = np.asarray(vecC, float) - np.asarray(oldParams["C"], float).reshape(-1)
        g = g - np.asarray(invPriorCov) @ dv
    return g


def update_d_closedForm(oldParams, infRes, experiment):
    """Closed-form d (reference ``funs/learning.py:318-358``; the package's
    consistent moment-matching form — see
    ``pgpfa.learn.mstep_obs.update_d_closed_form`` for the deviation note)."""
    from pgpfa.learn.mstep_obs import update_d_closed_form

    means, vsm, _ = _moments(infRes)
    Y = jnp.asarray(stack_experiment(experiment), dtype=means.dtype)
    return np.asarray(update_d_closed_form(Y, means, vsm, jnp.asarray(oldParams["C"])))


# -- online drivers (reference funs/learning.py:536-676, 833-966) ------------


def updateParamsWithPrior(oldParams, infRes, experiment, CdOptimMethod=None,
                          tauOptimMethod=None, regularizer_stepsize_Cd=1.0,
                          regularizer_stepsize_tau=1.0, prevInvPriorCov=None,
                          covOpts="useDiag", verbose=False,
                          updateCdJointly=True, hessTol=None):
    """Prior-regularized online M-step (reference ``funs/learning.py:833-866``).

    Returns ``(newParams, optimDetails, invPriorCov)``. Deviations (see
    PARITY.md): ``prevInvPriorCov``/returned ``invPriorCov`` use the standard
    POSITIVE precision convention (the reference stores the negated penalty
    and seeds the recursion with a sign-flipped identity), and the curvature
    for ``covOpts='useHessian'`` is the exact Hessian instead of the
    reference's finite-difference ``approx_jacobian``.
    """
    from pgpfa.learn.mstep_obs import cd_hessian, update_d_closed_form
    from pgpfa.models.params import pack_cd as _pack

    means, vsm, vsm_gp = _moments(infRes)
    Y = jnp.asarray(stack_experiment(experiment), dtype=means.dtype)
    C0 = jnp.asarray(oldParams["C"])
    d0 = jnp.asarray(np.ravel(oldParams["d"]))
    tau0 = jnp.asarray(np.ravel(oldParams["tau"]))
    xdim, ydim = C0.shape[1], C0.shape[0]

    if updateCdJointly:
        v0 = _pack(C0, d0)
        n = v0.shape[0]
        if covOpts == "useHessian":
            prev = jnp.asarray(prevInvPriorCov) if prevInvPriorCov is not None else jnp.eye(n, dtype=v0.dtype)
            P = cd_hessian(v0, Y, means, vsm) + prev
        else:
            P = jnp.eye(n, dtype=v0.dtype) / regularizer_stepsize_Cd**2
        cd = learn_cd(Y, means, vsm, C0, d0, prior=(P, v0), method="lbfgs")
        newC, newd, cost = np.asarray(cd.C), np.asarray(cd.d), float(cd.cost)
    else:
        newd_j = update_d_closed_form(Y, means, vsm, C0)
        vC0 = C0.T.reshape(-1)
        n = vC0.shape[0]

        def c_cost(vC):
            from pgpfa.learn.mstep_obs import cd_cost as _cd_cost

            return _cd_cost(jnp.concatenate([vC, newd_j]), Y, means, vsm)

        if covOpts == "useHessian":
            import jax as _jax

            prev = jnp.asarray(prevInvPriorCov) if prevInvPriorCov is not None else jnp.eye(n, dtype=vC0.dtype)
            P = _jax.hessian(c_cost)(vC0) + prev
        else:
            P = jnp.eye(n, dtype=vC0.dtype) / regularizer_stepsize_Cd**2
        from pgpfa.utils.optim import minimize_lbfgs

        fun = lambda v: c_cost(v) + 0.5 * (v - vC0) @ (P @ (v - vC0))
        res = minimize_lbfgs(fun, vC0, maxiter=500, tol=1e-9)
        newC = np.asarray(res.x.reshape(xdim, ydim).T)
        newd, cost = np.asarray(newd_j), float(res.fun)

    tr = learn_tau(means, vsm_gp, tau0, float(experiment.binSize),
                   prior=(tau0, regularizer_stepsize_tau))
    newParams = {"C": newC, "d": newd, "tau": np.asarray(tr.tau)}
    details = {"Cd": cost, "tau": np.asarray(tr.cost)}
    return newParams, details, np.asarray(P)


def updateParamsWithGradDescent(oldParams, infRes, experiment, stepSize,
                                cumHess=None, regularizer_stepsize_tau=1.0,
                                tauOptimMethod=None, updateCdJointly=True,
                                verbose=False, hessTol=None):
    """One damped Newton step on the (C, d) cost plus the prior-regularized
    tau update (reference ``funs/learning.py:932-966``). Returns
    ``(newParams, optimDetails, hess)`` with the exact (positive, cost-
    convention) Hessian in place of the reference's finite-difference one.
    """
    import jax as _jax

    from pgpfa.learn.mstep_obs import cd_cost as _cd_cost, cd_hessian, update_d_closed_form
    from pgpfa.models.params import pack_cd as _pack, unpack_cd as _unpack
    from pgpfa.ops.blockmat import solve_psd_mixed

    means, vsm, vsm_gp = _moments(infRes)
    Y = jnp.asarray(stack_experiment(experiment), dtype=means.dtype)
    C0 = jnp.asarray(oldParams["C"])
    d0 = jnp.asarray(np.ravel(oldParams["d"]))
    tau0 = jnp.asarray(np.ravel(oldParams["tau"]))
    xdim, ydim = C0.shape[1], C0.shape[0]

    if updateCdJointly:
        v0 = _pack(C0, d0)
        g = _jax.grad(lambda v: _cd_cost(v, Y, means, vsm))(v0)
        H = cd_hessian(v0, Y, means, vsm)
        v = v0 - stepSize * solve_psd_mixed(H + 1e-10 * jnp.eye(v0.shape[0], dtype=v0.dtype), g)
        newC_j, newd_j = _unpack(v, xdim, ydim)
    else:
        newd_j = update_d_closed_form(Y, means, vsm, C0)
        vC0 = C0.T.reshape(-1)
        c_cost = lambda vC: _cd_cost(jnp.concatenate([vC, newd_j]), Y, means, vsm)
        g = _jax.grad(c_cost)(vC0)
        H = _jax.hessian(c_cost)(vC0)
        vC = vC0 - stepSize * solve_psd_mixed(H + 1e-10 * jnp.eye(vC0.shape[0], dtype=vC0.dtype), g)
        newC_j = vC.reshape(xdim, ydim).T

    tr = learn_tau(means, vsm_gp, tau0, float(experiment.binSize),
                   prior=(tau0, regularizer_stepsize_tau))
    newParams = {"C": np.asarray(newC_j), "d": np.asarray(newd_j), "tau": np.asarray(tr.tau)}
    details = {"Cd": None, "tau": np.asarray(tr.cost)}
    return newParams, details, np.asarray(H)
