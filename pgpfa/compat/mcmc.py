"""Shim for the reference's ``funs/mcmc.py``."""

import numpy as np


def PosteriorMCMC(experiment, params, maxSampleIter, trial, seed: int = 0):
    """Reference signature (``funs/mcmc.py:9``): returns the raw sample array
    ``(maxSampleIter, xdim*T)`` for one trial's latent posterior."""
    from pgpfa.data.synthetic import stack_experiment
    from pgpfa.infer.mcmc import posterior_mcmc_from_arrays

    import jax.numpy as jnp

    Y = stack_experiment(experiment)
    C = jnp.asarray(params["C"])
    d = jnp.asarray(np.ravel(params["d"]))
    tau = jnp.asarray(np.ravel(params["tau"]))
    res = posterior_mcmc_from_arrays(
        C, d, tau, jnp.asarray(Y[trial], dtype=C.dtype), Y.shape[-1],
        float(experiment.binSize), n_samples=maxSampleIter, seed=seed,
    )
    n = res.samples.shape[0]
    return np.asarray(res.samples).reshape(n, -1)
