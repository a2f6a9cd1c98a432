"""Reference-API compatibility shims: a reference user's script runs with an
import swap, and the shim functions return the reference's shapes/formats."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from pgpfa.compat import util

    train = util.dataset(
        xdim=2, ydim=10, numTrials=5, trialDur=400, binSize=20,
        dOffset=0.5, fixTau=True, fixedTau=np.array([0.1, 0.3]), seed=2,
    )
    init = util.initializeParams(2, 10, train, seed=0)
    return train, init


def test_reference_workflow(setup):
    """The reference example.py workflow through the compat modules."""
    from pgpfa.compat import engine

    train, init = setup
    fit = engine.PPGPFAfit(
        experiment=train, initParams=init,
        inferenceMethod="laplace", EMmode="Batch", maxEMiter=3,
    )
    assert len(fit.posteriorLikelihood) == 3
    assert fit.optimParams["C"].shape == (10, 2)
    assert "post_vsmGP" in fit.infRes
    assert fit.infRes["post_vsmGP"][0].shape == (train.T, train.T, 2)


def test_inference_shim(setup):
    from pgpfa.compat import inference

    train, init = setup
    res, pll, modes = inference.laplace(train, init)
    assert len(res["post_mean"]) == train.numTrials
    assert res["post_mean"][0].shape == (2, train.T)
    assert np.isfinite(pll)
    # warm restart with the returned optimizer state
    res2, pll2, _ = inference.laplace(train, init, prevOptimRes=modes)
    np.testing.assert_allclose(pll2, pll, atol=1e-8)

    vres, vpll, vlb, rhos = inference.dualVariational(train, init)
    assert np.isfinite(vlb)
    assert len(rhos) == train.numTrials


def test_learning_shim(setup):
    from pgpfa.compat import inference, learning

    train, init = setup
    res, pll, _ = inference.laplace(train, init)
    new_params, details = learning.updateParams(init, res, train)
    assert new_params["C"].shape == (10, 2)
    assert np.isfinite(details["Cd"])
    pre = learning.makePrecomp(res)
    assert len(pre) == 2 and pre[0]["PautoSum"].shape == (train.T, train.T)


def test_mcmc_shim(setup):
    from pgpfa.compat import mcmc

    train, init = setup
    samples = mcmc.PosteriorMCMC(train, train.params, 50, trial=0)
    assert samples.shape == (50, 2 * train.T)


def test_util_shims(setup):
    from pgpfa.compat import util

    train, init = setup
    Cb, db = util.makeCd_big(init, train.T)
    assert Cb.shape == (2 * train.T, 10 * train.T)
    Kb, K = util.makeK_big(init, train.trialDur, train.binSize)
    assert Kb.shape == (2 * train.T, 2 * train.T)
    assert K.shape == (2, train.T, train.T)
    vec = util.CdtoVecCd(init["C"], init["d"])
    C2, d2 = util.vecCdtoCd(vec, 2, 10)
    np.testing.assert_allclose(C2, init["C"])
    np.testing.assert_allclose(d2, init["d"])
