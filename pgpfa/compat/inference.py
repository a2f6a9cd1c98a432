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
