"""Reference-compatible module layout.

``mackelab/poisson-gpfa`` exposes ``funs.engine`` / ``funs.util`` /
``funs.inference`` / ``funs.learning`` / ``funs.mcmc`` / ``funs.datamanager``;
these shims mirror that layout and its public names, so reference user code
ports with an import swap::

    # before:  import funs.util as util;  import funs.engine as engine
    from pgpfa.compat import util, engine

    train = util.dataset(xdim=2, ydim=20, numTrials=5, ...)
    fit = engine.PPGPFAfit(experiment=train, initParams=util.initializeParams(2, 20, train))
"""

from pgpfa.compat import datamanager, engine, inference, learning, mcmc, util  # noqa: F401

__all__ = ["engine", "util", "inference", "learning", "mcmc", "datamanager"]
