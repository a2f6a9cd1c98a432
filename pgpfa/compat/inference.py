"""Shim for the reference's ``funs/inference.py`` public surface.

The reference functions operate on dense ``C_big``/``K_bigInv``
materializations; the shims accept the same experiment/params inputs and run
the batched block-structured solvers.
"""

import numpy as np

import jax.numpy as jnp

from pgpfa.data.synthetic import stack_experiment
from pgpfa.infer.laplace import laplace_estep_from_arrays
from pgpfa.infer.variational import vi_estep_from_arrays


def _unpack(experiment, params):
    Y = stack_experiment(experiment)
    C = jnp.asarray(params["C"])
    d = jnp.asarray(np.ravel(params["d"]))
    tau = jnp.asarray(np.ravel(params["tau"]))
    return C, d, tau, jnp.asarray(Y, dtype=C.dtype), Y.shape[-1]


# -- public objective surface (reference funs/inference.py:12-65,186-256) ----


def negLogPosteriorUnNorm(xbar, ybar, C_big, d_big, K_bigInv, xdim=None, ydim=None):
    """Negative unnormalized log posterior over flattened latents
    (reference ``funs/inference.py:12-32``). Dense-argument form for user
    code that builds ``C_big``/``K_bigInv`` via :mod:`pgpfa.compat.util`."""
    from pgpfa.oracle import oracle_np as O

    return float(O.nlp(np.ravel(np.asarray(xbar, float)), np.ravel(np.asarray(ybar, float)),
                       np.asarray(C_big, float), np.ravel(np.asarray(d_big, float)),
                       np.asarray(K_bigInv, float)))


def negLogPosteriorUnNorm_grad(xbar, ybar, C_big, d_big, K_bigInv, xdim=None, ydim=None):
    """Analytic gradient (reference ``funs/inference.py:34-48``)."""
    from pgpfa.oracle import oracle_np as O

    return O.nlp_grad(np.ravel(np.asarray(xbar, float)), np.ravel(np.asarray(ybar, float)),
                      np.asarray(C_big, float), np.ravel(np.asarray(d_big, float)),
                      np.asarray(K_bigInv, float))


def negLogPosteriorUnNorm_hess(xbar, ybar, C_big, d_big, K_bigInv, xdim=None, ydim=None):
    """Analytic Hessian (reference ``funs/inference.py:50-65``; returned
    dense)."""
    from pgpfa.oracle import oracle_np as O

    return O.nlp_hess(np.ravel(np.asarray(xbar, float)), np.ravel(np.asarray(ybar, float)),
                      np.asarray(C_big, float), np.ravel(np.asarray(d_big, float)),
                      np.asarray(K_bigInv, float))


def VIPostCov(K_bigInv, C_big, lamb):
    """Variational posterior covariance/precision with the reference's
    relative diagonal ridge (``funs/inference.py:188-191``)."""
    prec = np.asarray(K_bigInv, float) + (np.asarray(C_big, float) * np.ravel(lamb)[None, :]) @ np.asarray(C_big, float).T
    cov = np.linalg.inv(prec + 1e-6 * np.diag(np.diag(prec)))
    return cov, prec


def VIPostMean(K_big, C_big, y_bar, lamb):
    """``-K C_big (lambda - ybar)`` (reference ``funs/inference.py:193-194``)."""
    return -np.asarray(K_big, float) @ (np.asarray(C_big, float) @ (np.ravel(lamb) - np.ravel(y_bar)))


def dualProblem(lamb, ybar, C_big, K_big, K_bigInv, d_big):
    """Dual VI objective over ``lambda`` (reference ``funs/inference.py:196-213``)."""
    from pgpfa.oracle import oracle_np as O

    return float(O.vi_dual_cost(np.log(np.ravel(np.asarray(lamb, float))),
                                np.ravel(np.asarray(ybar, float)),
                                np.asarray(C_big, float), np.ravel(np.asarray(d_big, float)),
                                np.asarray(K_big, float), np.asarray(K_bigInv, float)))


def dualProblem_grad(lamb, ybar, C_big, K_big, K_bigInv, d_big):
    """Dual gradient over ``lambda`` (reference ``funs/inference.py:215-219``;
    like the reference, the tiny ridge's own lambda-dependence is neglected)."""
    lamb = np.ravel(np.asarray(lamb, float))
    ybar = np.ravel(np.asarray(ybar, float))
    Cb = np.asarray(C_big, float)
    cov, _ = VIPostCov(K_bigInv, Cb, lamb)
    lmy = lamb - ybar
    return (Cb.T @ (np.asarray(K_big, float) @ (Cb @ lmy))
            - np.ravel(np.asarray(d_big, float)) + np.log(lamb)
            - 0.5 * np.einsum("ki,kl,li->i", Cb, cov, Cb))


def dualProblemRho(rho, ybar, C_big, K_big, K_bigInv, d_big):
    """Dual objective over ``rho = log lambda``
    (reference ``funs/inference.py:222-244``)."""
    from pgpfa.oracle import oracle_np as O

    return float(O.vi_dual_cost(np.ravel(np.asarray(rho, float)),
                                np.ravel(np.asarray(ybar, float)),
                                np.asarray(C_big, float), np.ravel(np.asarray(d_big, float)),
                                np.asarray(K_big, float), np.asarray(K_bigInv, float)))


def dualProblemRho_grad(rho, ybar, C_big, K_big, K_bigInv, d_big):
    """Dual gradient over ``rho`` (reference ``funs/inference.py:246-256``)."""
    rho = np.ravel(np.asarray(rho, float))
    return dualProblem_grad(np.exp(rho), ybar, C_big, K_big, K_bigInv, d_big) * np.exp(rho)


def laplace(experiment, params, prevOptimRes=None, returnOptimRes=True, verbose=False, **kw):
    """Reference signature (``funs/inference.py:67``): returns
    ``(infRes, -post_lik[, optimRes])`` with the reference's dict format."""
    C, d, tau, Y, T = _unpack(experiment, params)
    x_init = None
    if prevOptimRes is not None:
        x_init = jnp.asarray(np.stack([np.reshape(x, (C.shape[1], T)) for x in prevOptimRes]))
    inf, pll = laplace_estep_from_arrays(C, d, tau, Y, T, float(experiment.binSize), x_init=x_init)
    res = inf.to_reference_dict()
    if returnOptimRes:
        modes = [np.asarray(inf.post_mean[i]).reshape(-1) for i in range(Y.shape[0])]
        return res, float(pll), modes
    return res, float(pll)


def dualVariational(experiment, params, optimizeLogLambda=True, prevOptimRes=None,
                    returnOptimRes=True, verbose=False, **kw):
    """Reference signature (``funs/inference.py:259``). Always optimizes in
    log-lambda space (the reference's own unconstrained variant)."""
    C, d, tau, Y, T = _unpack(experiment, params)
    rho_init = None
    if prevOptimRes is not None:
        rho_init = jnp.asarray(np.stack([np.reshape(r, (C.shape[0], T)) for r in prevOptimRes]))
    inf, pll, vlb, rho = vi_estep_from_arrays(C, d, tau, Y, T, float(experiment.binSize), rho_init=rho_init)
    res = inf.to_reference_dict()
    if returnOptimRes:
        rhos = [np.asarray(rho[i]).reshape(-1) for i in range(Y.shape[0])]
        return res, float(pll), float(vlb), rhos
    return res, float(pll), float(vlb)
