"""Shim for the reference's ``funs/util.py`` public surface."""

from pgpfa.data.batching import seen_trials as seenTrials  # noqa: F401
from pgpfa.data.batching import subsample_trials as subsampleTrials  # noqa: F401
from pgpfa.data.init import initialize_params as initializeParams  # noqa: F401
from pgpfa.data.loaders import (  # noqa: F401
    load_crcns_data,
    loadDataForGPFA_CV_comparison,
    loadDataHighData,
    MATLABdataset,
)
from pgpfa.data.synthetic import dataset  # noqa: F401
from pgpfa.diag.crossval import crossValidation, split_train_test as splitTrainingTestDataset  # noqa: F401
from pgpfa.diag.loo import leave_one_out_prediction as leaveOneOutPrediction  # noqa: F401
from pgpfa.diag.metrics import js_logdet_div as JSLogdetDiv  # noqa: F401
from pgpfa.diag.metrics import mean_cov_y_from_params as getMeanCovYfromParams  # noqa: F401
from pgpfa.diag.metrics import mvnpdf, mvnpdf_use_inv_cov  # noqa: F401
from pgpfa.diag.metrics import subspace_angle as subspaceAngle  # noqa: F401
from pgpfa.diag.plotting import plot_loo_prediction as plotLeaveOneOutPrediction  # noqa: F401
from pgpfa.diag.plotting import raster, simple_axis as simpleaxis  # noqa: F401
from pgpfa.utils.io import Printer, open_variables as openVariables  # noqa: F401
from pgpfa.utils.io import save_variables as saveVariables  # noqa: F401
from pgpfa.utils.io import stars, tic, toc  # noqa: F401


def makeCd_big(params, T):
    """Dense lifted (C, d) operators — reference ``funs/util.py:594-597``.

    Provided for compatibility/testing only: the compute paths never
    materialize these (the whole point of the block-structured redesign).
    """
    import numpy as np

    C = np.asarray(params["C"])
    d = np.ravel(np.asarray(params["d"]))
    C_big = np.kron(C, np.eye(T)).T
    d_big = np.repeat(d, T)
    return C_big, d_big


def makeK_big(params, trialDur, binSize, epsNoise=0.001):
    """Dense block-diagonal GP covariance — reference ``funs/util.py:599-619``.

    Compatibility/plotting helper; compute paths use the per-latent block form
    (:func:`pgpfa.models.params.rbf_kernel`).
    """
    import numpy as np
    import scipy.linalg as sla

    from pgpfa.models.params import rbf_kernel

    T = int(trialDur // binSize)
    K = np.asarray(rbf_kernel(np.ravel(np.asarray(params["tau"])), T, float(binSize), epsNoise))
    return sla.block_diag(*K), K


def getCdErrorBars(params, experiment, infRes):
    """Inverse-Hessian standard errors for the packed (C, d) estimate —
    reference signature (``funs/util.py:436-447``).

    The reference numerically differentiates the M-step gradient
    (``nd.Jacobian``); here the EXACT autodiff Hessian is used
    (:func:`pgpfa.diag.metrics.cd_error_bars`), so the error bars carry no
    finite-difference noise.

    Args:
        params: dict with ``C (ydim, xdim)`` and ``d (ydim,)``.
        experiment: reference-style experiment (``data[tr]['Y']``).
        infRes: reference-format inference result (``post_mean`` list of
            ``(xdim, T)``, ``post_vsm`` list of ``(T, xdim, xdim)``).
    """
    import numpy as np

    from pgpfa.data.synthetic import stack_experiment
    from pgpfa.diag.metrics import cd_error_bars

    Y = stack_experiment(experiment)
    means = np.stack([np.asarray(m) for m in infRes["post_mean"]])
    vsms = np.stack([np.asarray(v) for v in infRes["post_vsm"]])
    return cd_error_bars(params, Y, means, vsms)


def approx_jacobian(x, func, epsilon, *args):
    """Fourth-order central-difference Jacobian of ``func`` at ``x`` —
    reference signature (``funs/util.py:377-434``).

    Kept for API parity with user code; inside pgpfa every Jacobian/Hessian
    the reference approximated numerically is exact autodiff
    (e.g. :func:`getCdErrorBars` above). ``epsilon=None`` selects the
    rounding-optimal step ``(eps_f64)^(1/3) * max(|x|, 0.1)`` per coordinate
    (what the reference's statsmodels helper computes for s=3).
    """
    import numpy as np

    x0 = np.atleast_1d(np.asarray(x, dtype=float))
    n = x0.size
    if epsilon is None:
        eps = np.finfo(float).eps ** (1.0 / 3.0) * np.maximum(np.abs(x0), 0.1) / 2.0
    else:
        eps = np.full(n, epsilon, dtype=float) / 2.0
    f0 = np.atleast_1d(np.asarray(func(x0, *args), dtype=float))
    jac = np.zeros([n, f0.size])
    dx = np.zeros(n)
    for i in range(n):
        dx[i] = eps[i]
        jac[i] = (
            -np.asarray(func(x0 + 2 * dx, *args))
            + 8 * np.asarray(func(x0 + dx, *args))
            - 8 * np.asarray(func(x0 - dx, *args))
            + np.asarray(func(x0 - 2 * dx, *args))
        ) / (12 * dx[i])
        dx[i] = 0.0
    return jac.T


def CdtoVecCd(C, d):
    """Pack (reference ``funs/util.py:560-574``)."""
    import numpy as np

    from pgpfa.models.params import pack_cd

    return np.asarray(pack_cd(np.asarray(C), np.ravel(np.asarray(d))))


def vecCdtoCd(vecCd, xdim, ydim):
    """Unpack (reference ``funs/util.py:576-592``)."""
    import numpy as np

    from pgpfa.models.params import unpack_cd

    C, d = unpack_cd(np.asarray(vecCd), xdim, ydim)
    return np.asarray(C), np.asarray(d)
