"""Cross-validated latent-dimensionality selection.

Reference (``funs/util.py:180-261``): split train/test trials, fit every
``xdim`` in ``1..maxXdim`` with the chosen learning method, score each by
leave-one-neuron-out prediction error on the test set, pick the argmin.

This port keeps the reference's class surface (``optimXdim``, ``errs``,
``fits``) but runs each fit as the fused compiled EM and the LOO scoring as
one batched solve. The reference's ``plotPredictionError`` references a
nonexistent ``self.method`` attribute (``funs/util.py:256`` — latent bug);
here the attribute is ``learningMethod`` and the plot uses it.
"""

from __future__ import annotations

import copy
from typing import Optional

import numpy as np

from pgpfa.data.synthetic import stack_experiment
from pgpfa.diag.loo import leave_one_out_prediction
from pgpfa.em.fit import FitConfig, fit


def split_train_test(experiment, num_training: int, num_test: int):
    """First-``num_training`` / next-``num_test`` trial split
    (reference ``funs/util.py:263-275``)."""
    if num_training + num_test > experiment.numTrials:
        raise ValueError(
            "numTrainingTrials + numTestTrials must not exceed the number of trials"
        )
    train = copy.copy(experiment)
    test = copy.copy(experiment)
    train.data = experiment.data[:num_training]
    train.numTrials = num_training
    if hasattr(train, "Y"):
        train.Y = experiment.Y[:num_training]
    test.data = experiment.data[num_training : num_training + num_test]
    test.numTrials = num_test
    if hasattr(test, "Y"):
        test.Y = experiment.Y[num_training : num_training + num_test]
    return train, test


class crossValidation:
    """Sweep xdim = 1..maxXdim; score by LOO prediction error on held-out trials."""

    def __init__(
        self,
        experiment,
        numTrainingTrials: int = 10,
        numTestTrials: int = 2,
        maxXdim: int = 6,
        maxEMiter: int = 3,
        batchSize: int = 5,
        inferenceMethod: str = "laplace",
        learningMethod: str = "batch",  # 'batch' | 'diag' | 'hess' | 'grad'
        seed: int = 0,
        verbose: bool = False,
    ):
        from pgpfa.data.init import initialize_params

        train, test = split_train_test(experiment, numTrainingTrials, numTestTrials)
        Y_train = stack_experiment(train)
        Y_test = stack_experiment(test)
        bin_ms = float(experiment.binSize)

        errs, fits = [], []
        for xdim in range(1, maxXdim + 1):
            if verbose:
                print(f"crossValidation: fitting xdim={xdim}/{maxXdim}")
            init = initialize_params(xdim, train.ydim, train, seed=seed)
            if learningMethod == "batch":
                cfg = FitConfig(
                    inference_method=inferenceMethod, em_mode="batch",
                    max_em_iter=maxEMiter,
                )
            else:
                cfg = FitConfig(
                    inference_method=inferenceMethod, em_mode="online",
                    online_update=learningMethod, max_em_iter=maxEMiter,
                    batch_size=min(batchSize, numTrainingTrials),
                )
            res = fit(init, Y_train, bin_ms, cfg, seed=seed)
            params = {
                "C": np.asarray(res.C),
                "d": np.asarray(res.d),
                "tau": np.asarray(res.tau),
            }
            _, err = leave_one_out_prediction(params, Y_test, bin_ms)
            errs.append(err)
            fits.append(res)

        self.inferenceMethod = inferenceMethod
        self.learningMethod = learningMethod
        self.errs = errs
        self.fits = fits
        self.maxXdim = maxXdim
        self.optimXdim = int(np.argmin(errs)) + 1

    def plotPredictionError(self):
        from pgpfa.diag.plotting import plot_cv_prediction_error

        return plot_cv_prediction_error(self)
