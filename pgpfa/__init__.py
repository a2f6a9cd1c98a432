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

# Faithful f32 matmuls everywhere: TPU's default f32 matmul precision is
# bf16-grade, which silently degrades the f32 stages of the mixed-precision
# solvers. The hot matmuls are f64 (unaffected); the f32 ones are small.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the fused EM program is large (batched Newton
# + L-BFGS + scan) and TPU compiles run minutes; caching makes that a one-time
# cost per (shape, config). Opt out with PGPFA_COMPILE_CACHE=0 or point
# PGPFA_COMPILE_CACHE_DIR elsewhere.


def _machine_tag():
    """Fingerprint the host CPU's feature flags. XLA:CPU AOT executables
    cached on a host with different vector-unit features load with SIGILL
    warnings and can differ in rounding (observed as a 1-ULP fused-vs-loop
    flake) — keying the cache by CPU features makes cross-machine reuse
    impossible while identical fleet machines still share everything."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


if _os.environ.get("PGPFA_COMPILE_CACHE", "1") != "0":
    _cache_dir = _os.environ.get(
        "PGPFA_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "pgpfa",
                      "jax-" + _machine_tag()),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

from pgpfa.models.params import Params, pack_cd, unpack_cd, rbf_kernel  # noqa: E402
from pgpfa.data.synthetic import dataset  # noqa: E402
from pgpfa.data.init import initialize_params  # noqa: E402
from pgpfa.data.batching import subsample_trials, seen_trials  # noqa: E402
from pgpfa.em.fit import PPGPFAfit, FitConfig, FitResult, fit, fit_loop  # noqa: E402
from pgpfa.em.isolated import fit_isolated  # noqa: E402
from pgpfa.infer.laplace import laplace_estep, laplace_estep_from_arrays  # noqa: E402
from pgpfa.infer.variational import vi_estep, vi_estep_from_arrays  # noqa: E402
from pgpfa.infer.mcmc import posterior_mcmc, posterior_mcmc_batched, posterior_mcmc_from_arrays  # noqa: E402
from pgpfa.diag.crossval import crossValidation, split_train_test  # noqa: E402
from pgpfa.diag.loo import leave_one_out_prediction  # noqa: E402
from pgpfa.diag.metrics import subspace_angle, js_logdet_div, mean_cov_y_from_params  # noqa: E402
from pgpfa.parallel.sharded import fit_sharded  # noqa: E402
from pgpfa.utils.io import save_variables, open_variables, save_checkpoint, load_checkpoint  # noqa: E402

# reference-API aliases (funs/util.py names)
initializeParams = initialize_params
subsampleTrials = subsample_trials
seenTrials = seen_trials
saveVariables = save_variables
openVariables = open_variables
leaveOneOutPrediction = leave_one_out_prediction
subspaceAngle = subspace_angle
JSLogdetDiv = js_logdet_div
getMeanCovYfromParams = mean_cov_y_from_params
splitTrainingTestDataset = split_train_test

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
    "FitResult",
    "fit",
    "fit_loop",
    "fit_sharded",
    "laplace_estep",
    "laplace_estep_from_arrays",
    "vi_estep",
    "vi_estep_from_arrays",
    "posterior_mcmc",
    "posterior_mcmc_batched",
    "posterior_mcmc_from_arrays",
    "crossValidation",
    "split_train_test",
    "leave_one_out_prediction",
    "subspace_angle",
    "js_logdet_div",
    "mean_cov_y_from_params",
    "subsample_trials",
    "seen_trials",
    "save_variables",
    "open_variables",
    "save_checkpoint",
    "load_checkpoint",
]

__version__ = "0.1.0"
