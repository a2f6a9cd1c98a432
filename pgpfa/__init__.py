"""pgpfa — a TPU-native (JAX/XLA/Pallas) Poisson Gaussian-Process Factor Analysis framework.

A ground-up rebuild of the capabilities of ``mackelab/poisson-gpfa`` (reference
mounted at /root/reference) designed for TPU execution:

* trials are a batch axis (``vmap``) and a shard axis (``shard_map`` over a
  ``jax.sharding.Mesh``) instead of serial Python loops,
* the GP prior covariance is kept in its per-latent block form ``(xdim, T, T)``
  — the reference's dense ``K_big``/``C_big`` Kronecker materializations
  (reference ``funs/util.py:594-619``) are never formed,
* the Laplace E-step is a batched damped-Newton solve under ``jit``
  (reference: per-trial ``scipy.optimize`` Newton-CG, ``funs/inference.py:94-126``),
* M-steps run a jittable L-BFGS (reference: ``scipy.optimize.minimize``),
* the full EM loop is one compiled ``lax.scan`` program.

Model (reference ``funs/util.py:624-627``)::

    x ~ GP(0, K(tau))           per-latent RBF kernel over time bins
    y ~ Poisson(exp(C x + d))   exponential-link spike counts

Precision: double precision is enabled on import (required for the 1e-6
log-likelihood parity target vs the NumPy/SciPy oracle). Set ``PGPFA_X64=0``
in the environment before import to keep 32-bit defaults (faster on TPU).
"""

import os as _os

import jax as _jax

if _os.environ.get("PGPFA_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

from pgpfa.models.params import Params, pack_cd, unpack_cd, rbf_kernel  # noqa: E402
from pgpfa.data.synthetic import dataset  # noqa: E402
from pgpfa.data.init import initialize_params  # noqa: E402
from pgpfa.em.fit import PPGPFAfit, FitConfig, fit  # noqa: E402

initializeParams = initialize_params  # reference-API alias (funs/util.py:505)

__all__ = [
    "Params",
    "pack_cd",
    "unpack_cd",
    "rbf_kernel",
    "dataset",
    "initialize_params",
    "initializeParams",
    "PPGPFAfit",
    "FitConfig",
    "fit",
]

__version__ = "0.1.0"
