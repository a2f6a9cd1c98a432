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
