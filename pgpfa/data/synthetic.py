"""Synthetic Poisson-GPFA dataset generation (jax.random based).

Reference: the ``dataset`` class (``funs/util.py:621-886``) draws ground-truth
parameters, builds the dense ``K_big`` and samples each trial with
``np.random.multivariate_normal`` in a Python loop. Here sampling is a pure
jitted function over a ``jax.random`` key: latents are drawn per-latent from
the ``(T, T)`` Cholesky factors (never forming ``K_big``) and all trials are
sampled as one batched operation.

The :class:`dataset` wrapper class reproduces the reference's public attribute
surface (``data``/``T``/``trialDur``/``binSize``/``numTrials``/``params``/
``avgFR``/...) so downstream code written against the reference keeps working.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pgpfa.models.params import Params, rbf_kernel


def sample_params(
    key,
    xdim: int,
    ydim: int,
    d_offset: float = -1.0,
    fixed_tau: Optional[np.ndarray] = None,
    dtype=jnp.float64,
) -> Params:
    """Draw ground-truth parameters.

    Distribution parity with the reference (``funs/util.py:709-726``):
    ``C ~ U(-0.5, 0.5)``, ``d ~ U(-2, 0) + dOffset``,
    ``tau ~ |U(0, 1)| + 0.01`` seconds (unless fixed).
    """
    kc, kd, kt = jax.random.split(key, 3)
    C = jax.random.uniform(kc, (ydim, xdim), dtype=dtype) - 0.5
    d = jax.random.uniform(kd, (ydim,), dtype=dtype) * (-2.0) + d_offset
    if fixed_tau is not None:
        tau = jnp.asarray(fixed_tau, dtype=dtype).reshape(-1)
    else:
        tau = jax.random.uniform(kt, (xdim,), dtype=dtype) + 0.01
    return Params(C=C, d=d, tau=tau)


@partial(jax.jit, static_argnames=("num_trials", "T", "bin_size_ms", "draw_same_x", "eps_noise"))
def sample_trials(
    key,
    params: Params,
    num_trials: int,
    T: int,
    bin_size_ms: float,
    draw_same_x: bool = False,
    eps_noise: float = 0.001,
):
    """Sample latents and spike counts for all trials at once.

    Returns:
        ``(X, Y)`` with shapes ``(R, xdim, T)`` and ``(R, ydim, T)``.
    """
    xdim = params.C.shape[1]
    K = rbf_kernel(params.tau, T, bin_size_ms, eps_noise)
    L = jnp.linalg.cholesky(K)  # (xdim, T, T)

    kx, ky = jax.random.split(key)
    n_draws = 1 if draw_same_x else num_trials
    z = jax.random.normal(kx, (n_draws, xdim, T), dtype=params.C.dtype)
    X = jnp.einsum("ktu,rku->rkt", L, z)
    if draw_same_x:
        X = jnp.broadcast_to(X, (num_trials, xdim, T))
    rates = jnp.exp(jnp.einsum("nk,rkt->rnt", params.C, X) + params.d[None, :, None])
    Y = jax.random.poisson(ky, rates).astype(params.C.dtype)
    return X, Y


def sample_params_numpy(rng, xdim, ydim, d_offset=-1.0, fixed_tau=None):
    """NumPy twin of :func:`sample_params` (platform-independent bits)."""
    C = rng.uniform(-0.5, 0.5, size=(ydim, xdim))
    d = rng.uniform(0.0, 1.0, size=ydim) * (-2.0) + d_offset
    tau = (
        np.ravel(np.asarray(fixed_tau))
        if fixed_tau is not None
        else rng.uniform(0.0, 1.0, size=xdim) + 0.01
    )
    return Params(C=jnp.asarray(C), d=jnp.asarray(d), tau=jnp.asarray(tau))


def sample_trials_numpy(rng, params: Params, num_trials, T, bin_size_ms, draw_same_x=False, eps_noise=0.001):
    """NumPy twin of :func:`sample_trials`.

    Used where bit-identical data across platforms matters (e.g. the benchmark
    data must match between the CPU reference-baseline process and the TPU
    bench process; jax.random results can differ across backends).
    """
    C = np.asarray(params.C)
    d = np.asarray(params.d)
    K = np.asarray(rbf_kernel(params.tau, T, bin_size_ms, eps_noise))
    L = np.linalg.cholesky(K)
    xdim = C.shape[1]
    n_draws = 1 if draw_same_x else num_trials
    z = rng.standard_normal((n_draws, xdim, T))
    X = np.einsum("ktu,rku->rkt", L, z)
    if draw_same_x:
        X = np.broadcast_to(X, (num_trials, xdim, T))
    rates = np.exp(np.einsum("nk,rkt->rnt", C, X) + d[None, :, None])
    Y = rng.poisson(rates).astype(float)
    return X, Y


class dataset:
    """Multi-trial synthetic spike-count dataset (reference-compatible surface).

    Reference: ``funs/util.py:621-886``. The broken Gaussian ``model='gpfa'``
    sampling path of the reference (``funs/util.py:753-775``, malformed
    covariance) is intentionally not reproduced.

    Args:
        backend: 'jax' (default; on-device sampling) or 'numpy'
            (platform-independent bits — use for cross-process benchmarks).
    """

    def __init__(
        self,
        trialDur: int = 1000,
        binSize: int = 10,
        drawSameX: bool = False,
        numTrials: int = 20,
        xdim: int = 3,
        ydim: int = 30,
        seed: int = 12,
        dOffset: float = -1.0,
        fixTau: bool = False,
        fixedTau=None,
        params=None,
        verbose: bool = False,
        backend: str = "jax",
    ):
        self.trialDur = int(trialDur)
        self.binSize = int(binSize)
        self.drawSameX = bool(drawSameX)
        self.numTrials = int(numTrials)
        self.xdim = int(xdim)
        self.ydim = int(ydim)
        self.seed = int(seed)
        self.T = int(trialDur // binSize)

        if backend == "numpy":
            rng = np.random.default_rng(self.seed)
            if params is None:
                p = sample_params_numpy(
                    rng, xdim, ydim, d_offset=dOffset,
                    fixed_tau=fixedTau if fixTau else None,
                )
            elif isinstance(params, Params):
                p = params
            else:
                p = Params.from_dict(params)
            X, Y = sample_trials_numpy(
                rng, p, self.numTrials, self.T, float(self.binSize), drawSameX
            )
        else:
            key = jax.random.PRNGKey(self.seed)
            kp, ks = jax.random.split(key)
            if params is None:
                p = sample_params(
                    kp, xdim, ydim, d_offset=dOffset,
                    fixed_tau=fixedTau if fixTau else None,
                )
            elif isinstance(params, Params):
                p = params
            else:
                p = Params.from_dict(params)
            X, Y = sample_trials(ks, p, self.numTrials, self.T, float(self.binSize), drawSameX)
        self.X = np.asarray(X)
        self.Y = np.asarray(Y)
        self.params = p.to_dict()
        self.data = [{"X": self.X[r], "Y": self.Y[r]} for r in range(self.numTrials)]

        self.getAvgFiringRate()
        self.getAllRaster()
        self.getMeanAndVariance()
        try:
            self.fitPolynomialToMeanVar()
        except Exception:  # curve fit can fail on degenerate data; diagnostic only
            self.curve_p = None
            self.curve_p_cov = None
        if verbose:
            print(
                f"pgpfa.dataset: xdim={xdim} ydim={ydim} trials={numTrials} "
                f"T={self.T} binSize={binSize}ms avgFR={np.mean(self.avgFR):.3f}Hz"
            )

    # -- statistics (reference: funs/util.py:792-814,840-848) ---------------

    def getAvgFiringRate(self):
        totals = self.Y.sum(axis=(0, 2))
        self.avgFR = totals / self.numTrials / (self.trialDur / 1000.0)
        self.totalSpkCt = float(self.Y.sum())
        return self.avgFR

    def getAllRaster(self):
        # (ydim, R*T) — trials concatenated along time.
        self.all_raster = np.concatenate([self.Y[r] for r in range(self.numTrials)], axis=1)
        return self.all_raster

    def getMeanAndVariance(self):
        # Per-(neuron, trial) mean and variance across time bins. (The
        # reference allocates (ydim, T*R) and fills only the first R columns,
        # funs/util.py:798-806; here the arrays are exactly (ydim, R).)
        self.means = self.Y.mean(axis=2).T
        self.variances = self.Y.var(axis=2).T

    def fitPolynomialToMeanVar(self):
        import scipy.optimize as sopt

        m = self.means.reshape(-1)
        v = self.variances.reshape(-1)
        p, cov = sopt.curve_fit(lambda x, a, b: a * x**b, m, v, maxfev=100000)
        self.curve_p = p
        self.curve_p_cov = cov

    # -- plots ----------------------------------------------------------------

    def plotTrajectory(self, trialToShow: int = 0):
        from pgpfa.diag.plotting import plot_dataset_trajectory

        return plot_dataset_trajectory(self, trialToShow)

    def plotParams(self):
        from pgpfa.diag.plotting import plot_dataset_params

        return plot_dataset_params(self)

    def plotMeanVsVariance(self):
        from pgpfa.diag.plotting import plot_mean_vs_variance

        return plot_mean_vs_variance(self)


def stack_experiment(experiment) -> np.ndarray:
    """Stack any reference-style experiment (``.data[r]['Y']``) to ``(R, ydim, T)``."""
    if hasattr(experiment, "Y") and isinstance(getattr(experiment, "Y"), np.ndarray):
        return experiment.Y
    return np.stack([np.asarray(tr["Y"]) for tr in experiment.data], axis=0)
