"""Component tests: MCMC gold standard, LOO prediction, cross-validation,
loaders, persistence, plotting smoke."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import pgpfa


@pytest.fixture(scope="module")
def small():
    train = pgpfa.dataset(
        xdim=2, ydim=12, numTrials=8, trialDur=600, binSize=20,
        dOffset=0.5, fixTau=True, fixedTau=np.array([0.15, 0.3]), seed=7,
    )
    init = pgpfa.initializeParams(2, 12, train, seed=0)
    return train, init


def test_mcmc_agrees_with_laplace(small):
    """ESS posterior mean/marginal-sd agree with the Laplace approximation
    (SURVEY.md §4 item 4: MCMC as gold standard)."""
    train, _ = small
    from pgpfa.infer.laplace import laplace_estep_from_arrays
    from pgpfa.infer.mcmc import posterior_mcmc_from_arrays

    C = jnp.asarray(train.params["C"])
    d = jnp.asarray(train.params["d"])
    tau = jnp.asarray(train.params["tau"])
    Y = jnp.asarray(train.Y, dtype=jnp.float64)
    inf, _ = laplace_estep_from_arrays(C, d, tau, Y[:1], train.T, 20.0)

    res = posterior_mcmc_from_arrays(
        C, d, tau, Y[0], train.T, 20.0, n_samples=4000, seed=1
    )
    samples = np.asarray(res.samples)[1000:]  # burn-in
    mcmc_mean = samples.mean(axis=0)
    lap_mean = np.asarray(inf.post_mean[0])
    lap_sd = np.sqrt(np.diagonal(np.asarray(inf.post_vsm_gp[0]), axis1=1, axis2=2))
    # mean agreement within a fraction of the posterior sd
    z = np.abs(mcmc_mean - lap_mean) / lap_sd
    assert np.mean(z) < 0.5, f"mean |z| = {np.mean(z)}"
    # marginal sd agreement within 35% on average (MCMC noise + Laplace bias)
    mcmc_sd = samples.std(axis=0)
    ratio = mcmc_sd / lap_sd
    assert 0.65 < np.mean(ratio) < 1.35, f"sd ratio mean = {np.mean(ratio)}"


def test_mcmc_speculative_step_equals_sequential(small):
    """The speculative transition (round 5: up to n_spec bracket candidates
    per ONE batched likelihood call) is a pure latency transformation — it
    must reproduce the sequential rejection loop's samples BIT-EXACTLY from
    the same key stream (same uniforms, same shrink rule, same first-accept
    state), chained over many transitions so bracket-continuation paths
    (no-accept-within-n_spec rounds) are exercised too."""
    import jax

    from pgpfa.infer.mcmc import (
        _prior_chol,
        elliptical_slice_step,
        elliptical_slice_step_spec,
    )
    from pgpfa.models.params import rbf_kernel

    train, _ = small
    C = jnp.asarray(train.params["C"])
    d = jnp.asarray(train.params["d"])
    K = rbf_kernel(jnp.asarray(train.params["tau"]).ravel(), train.T, 20.0, 1e-3)
    chol = _prior_chol(K, C.dtype)
    Y = jnp.asarray(train.Y[0], dtype=jnp.float64)

    def log_lik(X):
        A = C @ X + d[:, None]
        return jnp.vdot(Y, A) - jnp.sum(jnp.exp(A))

    seq = jax.jit(lambda k, x, ll: elliptical_slice_step(
        k, x, log_lik, chol, ll_cur=ll))
    # n_spec=2 maximizes multi-round continuations per transition
    spec = jax.jit(lambda k, x, ll: elliptical_slice_step_spec(
        k, x, log_lik, chol, ll, n_spec=2))

    x = jnp.zeros((C.shape[1], train.T), dtype=jnp.float64)
    ll = log_lik(x)
    xs, lls = x, ll
    xq, llq = x, ll
    for k in jax.random.split(jax.random.PRNGKey(3), 150):
        xs, lls = seq(k, xs, lls)
        xq, llq = spec(k, xq, llq)
    assert float(jnp.max(jnp.abs(xs - xq))) == 0.0
    # the carried log-likelihood is computed by a BATCHED reduction in the
    # speculative path (vmapped log_lik) — reduction tiling differs from the
    # unbatched eval by ~1 ULP (observed 5.7e-14 at |ll|~300), the CLAUDE.md
    # item-12 rounding class; the accepted STATES above stay bit-equal
    assert float(jnp.abs(lls - llq)) < 1e-11 * max(1.0, float(jnp.abs(lls)))


def test_mcmc_f32_chain_agrees_with_laplace(small):
    """The f32 single chain (the bench latency-regime row) samples the same
    posterior: the f32 target perturbation (~1e-7 relative log-density) is
    far below Monte-Carlo noise, so the Laplace-agreement bounds of the f64
    chain must hold unchanged."""
    train, _ = small
    from pgpfa.infer.laplace import laplace_estep_from_arrays
    from pgpfa.infer.mcmc import posterior_mcmc_from_arrays

    C = jnp.asarray(train.params["C"])
    d = jnp.asarray(train.params["d"])
    tau = jnp.asarray(train.params["tau"])
    Y = jnp.asarray(train.Y, dtype=jnp.float64)
    inf, _ = laplace_estep_from_arrays(C, d, tau, Y[:1], train.T, 20.0)

    res = posterior_mcmc_from_arrays(
        C.astype(jnp.float32), d.astype(jnp.float32), tau.astype(jnp.float32),
        Y[0].astype(jnp.float32), train.T, 20.0, n_samples=4000, seed=1
    )
    assert res.samples.dtype == jnp.float32
    samples = np.asarray(res.samples)[1000:]
    mcmc_mean = samples.mean(axis=0)
    lap_mean = np.asarray(inf.post_mean[0])
    lap_sd = np.sqrt(np.diagonal(np.asarray(inf.post_vsm_gp[0]), axis1=1, axis2=2))
    z = np.abs(mcmc_mean - lap_mean) / lap_sd
    assert np.mean(z) < 0.5, f"mean |z| = {np.mean(z)}"
    ratio = samples.std(axis=0) / lap_sd
    assert 0.65 < np.mean(ratio) < 1.35, f"sd ratio mean = {np.mean(ratio)}"


def test_loo_prediction(small):
    train, init = small
    from pgpfa.diag.loo import leave_one_out_prediction

    pred, err = leave_one_out_prediction(train.params, train.Y, 20.0)
    assert pred.shape == train.Y.shape
    assert np.isfinite(err) and err > 0
    # true-params prediction should beat a constant mean-rate prediction
    const = np.broadcast_to(
        train.Y.mean(axis=(0, 2))[None, :, None], train.Y.shape
    )
    err_const = float(np.sum((train.Y - const) ** 2))
    assert err < err_const


def test_cross_validation(small):
    train, _ = small
    from pgpfa.diag.crossval import crossValidation

    cv = crossValidation(
        train, numTrainingTrials=6, numTestTrials=2, maxXdim=3, maxEMiter=2
    )
    assert len(cv.errs) == 3
    assert 1 <= cv.optimXdim <= 3
    assert all(np.isfinite(e) for e in cv.errs)


def test_stevenson_loader(tmp_path):
    """Loader validated on a synthetic file with the reference schema."""
    import scipy.io as sio

    from pgpfa.data.loaders import StevensonDataset

    rng = np.random.default_rng(0)
    spikes = rng.poisson(0.01, size=(20, 4 * 1400))
    path = os.path.join(tmp_path, "stevenson.mat")
    sio.savemat(path, {"spikes": spikes, "timeBase": np.arange(spikes.shape[1])})
    ds = StevensonDataset(path, trialDur=1400, binSize=10)
    assert ds.T == 140 and ds.ydim == 20
    assert ds.numTrials == 2  # second half of 4 trials
    assert ds.Y.shape == (2, 20, 140)
    np.testing.assert_allclose(ds.Y.sum(), spikes[:, 2 * 1400 :].sum())


def test_matlab_dataset_loader(tmp_path):
    import scipy.io as sio

    from pgpfa.data.loaders import MATLABdataset

    rng = np.random.default_rng(1)
    rec = np.zeros((1, 3), dtype=[("spkcount", "O"), ("trialDur", "O")])
    for i in range(3):
        rec[0, i]["spkcount"] = rng.poisson(0.5, size=(8, 25))
        rec[0, i]["trialDur"] = np.asarray([[0.5]])
    path = os.path.join(tmp_path, "ppgpfa.mat")
    sio.savemat(path, {"dataPPGPFA": rec})
    ds = MATLABdataset(path)
    assert ds.numTrials == 3 and ds.ydim == 8 and ds.T == 25
    assert ds.trialDur == 500 and ds.binSize == 20


def test_persistence(tmp_path, small):
    from pgpfa.utils.io import (
        load_checkpoint,
        open_variables,
        save_checkpoint,
        save_variables,
    )

    train, init = small
    p = os.path.join(tmp_path, "v.pkl")
    save_variables({"a": np.arange(3)}, p)
    out = open_variables(p)
    np.testing.assert_array_equal(out["a"], np.arange(3))

    cp = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(cp, init, em_iter=7, warm=np.zeros((2, 2)))
    state = load_checkpoint(cp)
    assert state["em_iter"] == 7
    np.testing.assert_allclose(state["params"]["C"], init["C"])
    assert state["warm"].shape == (2, 2)


def test_batching_helpers(small):
    from pgpfa.data.batching import seen_trials, subsample_trials

    train, _ = small
    sub = subsample_trials(train, 3, rng=np.random.default_rng(0))
    assert sub.numTrials == 3 and sub.Y.shape[0] == 3
    assert len(set(sub.batchTrIdx)) == 3
    seen = seen_trials(train, [0, 2, 2])
    assert seen.numTrials == 3


def test_plotting_smoke(small):
    import matplotlib

    matplotlib.use("Agg")
    train, init = small
    fit = pgpfa.PPGPFAfit(
        experiment=train, initParams=init, EMmode="Batch", maxEMiter=2,
        getPredictionErr=True,
    )
    fit.plotTrajectory(0)
    fit.plotTrajectories()
    fit.plotParamSeq()
    fit.plotFitDetails()
    fit.plotOptimParams()
    fit.plotParamComparison()
    fit.plotCovAnalysis()
    fit.plotLNOprediction(0, 0)
    fit.orthonormalizeTrajectories()
    assert fit.x_tilde.shape == (train.numTrials, 2, train.T)
    train.plotTrajectory()
    train.plotParams()
    train.plotMeanVsVariance()
    import matplotlib.pyplot as plt

    plt.close("all")


def test_crcns_loader(tmp_path):
    """Spike-time-table loader on a schema-faithful pandas pickle
    (reference funs/util.py:74-110)."""
    import pandas as pd

    from pgpfa.data.loaders import load_crcns_data

    # 3 units; spikes placed at bin centers so the histogram is unambiguous.
    bin_s = 0.02  # 20 ms
    total_bins = 100  # 2 s -> 2 pseudo-trials of 1000 ms / 20 ms = 50 bins
    rng = np.random.default_rng(5)
    rows = []
    expected = np.zeros((3, total_bins))
    for u in range(3):
        for b in range(total_bins):
            k = rng.poisson(0.8)
            expected[u, b] = k
            rows += [{"unit": u, "time": (b + 0.5) * bin_s}] * k
    # np.histogram infers the range PER UNIT from that unit's min/max times
    # (reference funs/util.py:97-98 semantics) — anchor every unit's range to
    # the full recording so the bin grids align with `expected`.
    for u in range(3):
        rows += [{"unit": u, "time": 0.0}, {"unit": u, "time": total_bins * bin_s}]
        expected[u, 0] += 1
        expected[u, -1] += 1
    table = pd.DataFrame(rows)
    path = os.path.join(tmp_path, "crcns.pkl")
    table.to_pickle(path)

    ds = load_crcns_data(path, trialDur=1000, binSize=20)
    assert ds.ydim == 3 and ds.T == 50 and ds.numTrials == 2
    assert ds.Y.shape == (2, 3, 50)
    got = np.concatenate([ds.data[r]["Y"] for r in range(2)], axis=1)
    np.testing.assert_allclose(got, expected)


def test_gpfa_cv_comparison_loader(tmp_path):
    """data/dat.mat-schema loader (reference funs/util.py:130-153): 1 x R
    struct array `dat` with object field `spikes`, ms-resolution rasters."""
    import scipy.io as sio

    from pgpfa.data.loaders import loadDataForGPFA_CV_comparison

    rng = np.random.default_rng(6)
    R, ydim, dur = 4, 6, 401  # reference drops the last column: trialDur=400
    rec = np.zeros((1, R), dtype=[("spikes", "O")])
    rasters = []
    for i in range(R):
        r = rng.poisson(0.02, size=(ydim, dur))
        rasters.append(r)
        rec[0, i]["spikes"] = r
    path = os.path.join(tmp_path, "dat.mat")
    sio.savemat(path, {"dat": rec})

    ds = loadDataForGPFA_CV_comparison(path, binSize=20)
    assert ds.ydim == ydim and ds.trialDur == 400 and ds.T == 20
    assert ds.Y.shape == (R, ydim, 20)
    # binning parity: sum of adjacent 20-ms columns
    exp0 = rasters[0][:, :400].reshape(ydim, 20, 20).sum(axis=2)
    np.testing.assert_allclose(ds.data[0]["Y"], exp0)
    assert np.isfinite(ds.avgFR).all() and ds.avgFR.shape == (ydim,)


def test_high_data_loader(tmp_path):
    """data/ex1_spikecounts.mat-schema loader (reference funs/util.py:155-178)."""
    import scipy.io as sio

    from pgpfa.data.loaders import loadDataHighData

    rng = np.random.default_rng(7)
    R, ydim, dur = 3, 5, 200
    rec = np.zeros((1, R), dtype=[("data", "O")])
    rasters = []
    for i in range(R):
        r = rng.poisson(0.05, size=(ydim, dur))
        rasters.append(r)
        rec[0, i]["data"] = r
    path = os.path.join(tmp_path, "ex1_spikecounts.mat")
    sio.savemat(path, {"D": rec})

    ds = loadDataHighData(path, binSize=10)
    assert ds.ydim == ydim and ds.T == 20 and ds.numTrials == R
    exp1 = rasters[1].reshape(ydim, 20, 10).sum(axis=2)
    np.testing.assert_allclose(ds.data[1]["Y"], exp1)
    assert ds.raster.shape == (ydim, 20 * R)


@pytest.mark.parametrize("shrink", ["adaptive", "fixed"])
def test_mcmc_batched_agrees_with_laplace(small, shrink):
    """Both batched ESS transitions — 'adaptive' (one early-exit while_loop
    over all chains, the round-4 default) and 'fixed' (branchless 40-shrink
    lockstep scan) — sample the same posterior, checked against the Laplace
    moments."""
    train, _ = small
    from pgpfa.infer.laplace import laplace_estep_from_arrays
    from pgpfa.infer.mcmc import posterior_mcmc_batched

    C = jnp.asarray(train.params["C"])
    d = jnp.asarray(train.params["d"])
    tau = jnp.asarray(train.params["tau"])
    Y = jnp.asarray(train.Y, dtype=jnp.float64)
    inf, _ = laplace_estep_from_arrays(C, d, tau, Y[:2], train.T, 20.0)

    res = posterior_mcmc_batched(C, d, tau, Y[:2], train.T, 20.0,
                                 n_samples=4000, seed=1, shrink=shrink)
    assert res.samples.shape[:2] == (2, 4000)
    for r in range(2):
        samples = np.asarray(res.samples[r])[1000:]
        mcmc_mean = samples.mean(axis=0)
        lap_mean = np.asarray(inf.post_mean[r])
        lap_sd = np.sqrt(np.diagonal(np.asarray(inf.post_vsm_gp[r]), axis1=1, axis2=2))
        assert np.max(np.abs(mcmc_mean - lap_mean) / lap_sd) < 0.5
        mcmc_sd = samples.std(axis=0)
        np.testing.assert_allclose(mcmc_sd, lap_sd, rtol=0.35)


def test_mcmc_prior_chol_guard_on_ill_conditioned_kernel():
    """The guarded prior factor must stay finite where a raw f32 Cholesky
    fails (round-3 advisor: kappa(K) ~ 1e7 kernels NaN the f32 factor and
    previously NaN-ed every sample silently)."""
    import jax.numpy as jnp

    from pgpfa.infer.mcmc import _prior_chol
    from pgpfa.models.params import rbf_kernel
    from pgpfa.ops.blockmat import chol32

    # long trial + long timescale + tiny jitter: kappa(K) >> 1e7
    K = rbf_kernel(jnp.asarray([5.0]), 400, 10.0, 1e-6)
    assert not bool(jnp.all(jnp.isfinite(chol32(K)))), (
        "test premise: the raw f32 factor must fail on this kernel"
    )
    L = _prior_chol(K, jnp.float64)
    assert bool(jnp.all(jnp.isfinite(L)))
    # the factor must reproduce a usable prior draw covariance: L L^T ~ K
    # (jitter-retry perturbs the diagonal at <= 1e-5 relative; f64 fallback
    # is exact)
    rec = jnp.einsum("ktu,kvu->ktv", L, L)
    err = float(jnp.max(jnp.abs(rec - K)) / jnp.max(jnp.abs(K)))
    assert err < 1e-4


def test_cross_validation_padded_equals_unpadded(small):
    """pad_xdim=True (one compiled shape for the whole sweep) must reproduce
    the unpadded sweep: the zero-column embedding is exact, not an
    approximation (see pgpfa/diag/crossval.py docstring)."""
    import numpy as np

    from pgpfa.diag.crossval import crossValidation

    train, init = small
    cv_pad = crossValidation(train, numTrainingTrials=3, numTestTrials=2,
                             maxXdim=3, maxEMiter=2, pad_xdim=True)
    cv_raw = crossValidation(train, numTrainingTrials=3, numTestTrials=2,
                             maxXdim=3, maxEMiter=2, pad_xdim=False)
    np.testing.assert_allclose(cv_pad.errs, cv_raw.errs, rtol=1e-8)
    assert cv_pad.optimXdim == cv_raw.optimXdim
    # the padded fit's extra columns stayed EXACTLY zero through EM, and the
    # stripped user-facing params match the unpadded fit closely
    for k, (fp, fr) in enumerate(zip(cv_pad.fits, cv_raw.fits), start=1):
        assert np.asarray(fp.C).shape == (train.ydim, k)
        np.testing.assert_allclose(np.asarray(fp.C), np.asarray(fr.C),
                                   rtol=0, atol=1e-8)
