"""Parameter initialization (Poisson-PCA).

Reference ``funs/util.py:505-558``: concatenate all trials into one raster,
moment-convert the Poisson mean/covariance to the latent Gaussian scale
(``lamb = log|cov + mu mu^T - diag(mu)| - log(mu mu^T)``), take the top-xdim
eigenvectors of ``lamb`` as C, ``d = log(mean)``, random tau in [0.1, 0.6) s.

Determinism fixes vs the reference (SURVEY.md §7 hard part 5): ``lamb`` is
explicitly symmetrized and decomposed with ``eigh`` (the reference uses
``np.linalg.eig`` on the nominally-symmetric matrix, which can return complex
values from rounding asymmetry), and each eigenvector's sign is normalized so
its largest-magnitude entry is positive.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize_params(xdim: int, ydim: int, experiment=None, seed: int = 0):
    """Initialize Poisson-GPFA parameters.

    Args:
        xdim: latent dimensionality to fit.
        ydim: number of neurons.
        experiment: optional dataset (anything with ``.data[r]['Y']`` or a
            stacked ``.Y``); if given, Poisson-PCA is used, otherwise random.
        seed: RNG seed for the random pieces (tau; and C/d in random mode).

    Returns:
        dict ``{'C', 'd', 'tau'}`` (reference-compatible).
    """
    rng = np.random.default_rng(seed)
    if experiment is None:
        return {
            "C": rng.uniform(-1.0, 1.0, size=(ydim, xdim)),
            "d": rng.standard_normal(ydim) * 2.0 - 2.0,
            "tau": rng.uniform(0.0, 0.5, size=xdim),
        }

    from pgpfa.data.synthetic import stack_experiment

    Y = stack_experiment(experiment)  # (R, ydim, T)
    raster = np.concatenate([Y[r] for r in range(Y.shape[0])], axis=1)
    mean_y = raster.mean(axis=1) + 1e-10
    cov_y = np.cov(raster)

    outer = np.outer(mean_y, mean_y)
    lamb = np.log(np.abs(cov_y + outer - np.diag(mean_y))) - np.log(outer)
    lamb = 0.5 * (lamb + lamb.T)

    evals, evecs = np.linalg.eigh(lamb)
    order = np.argsort(evals)[::-1]
    evecs = evecs[:, order[:xdim]]
    # Deterministic sign: largest-|.| entry of each eigenvector positive.
    flips = np.sign(evecs[np.argmax(np.abs(evecs), axis=0), np.arange(xdim)])
    flips = np.where(flips == 0, 1.0, flips)
    evecs = evecs * flips[None, :]

    return {
        "C": evecs,
        "d": np.log(mean_y),
        "tau": rng.uniform(0.1, 0.6, size=xdim),
    }
