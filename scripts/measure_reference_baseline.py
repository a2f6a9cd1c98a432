"""Measure the reference implementation's wall-clock per EM iteration.

Runs the ORIGINAL mackelab/poisson-gpfa code at /root/reference (unmodified,
imported in place) on data saved by bench.py, and prints one JSON line with
seconds/iteration. Run as a subprocess; keeps the reference's import hacks and
its missing `statsmodels` dependency contained.

Usage:
    python scripts/measure_reference_baseline.py DATA.npz N_ITERS
"""

import json
import os
import sys
import time
import types

import numpy as np


def _install_statsmodels_stub():
    """statsmodels is not installed in this image; the reference imports
    statsmodels.tools.numdiff at module scope but batch EM never calls it."""
    root = types.ModuleType("statsmodels")
    tools = types.ModuleType("statsmodels.tools")
    numdiff = types.ModuleType("statsmodels.tools.numdiff")

    def _get_epsilon(x, s, epsilon, n):
        if epsilon is None:
            epsilon = 1e-6
        return np.full(n, epsilon)

    def approx_fprime(x, f, epsilon=None, args=(), centered=False):
        raise NotImplementedError("statsmodels stub: not needed for batch EM")

    numdiff._get_epsilon = _get_epsilon
    numdiff.approx_fprime = approx_fprime
    numdiff.approx_hess = approx_fprime
    numdiff.Jacobian = approx_fprime
    tools.numdiff = numdiff
    root.tools = tools
    sys.modules["statsmodels"] = root
    sys.modules["statsmodels.tools"] = tools
    sys.modules["statsmodels.tools.numdiff"] = numdiff


class _Experiment:
    """Minimal experiment object with the reference's expected surface."""

    def __init__(self, Y, trial_dur, bin_size):
        self.data = [{"Y": Y[r]} for r in range(Y.shape[0])]
        self.numTrials = Y.shape[0]
        self.ydim = Y.shape[1]
        self.T = Y.shape[2]
        self.trialDur = trial_dur
        self.binSize = bin_size


def main():
    data_path, n_iters = sys.argv[1], int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "laplace"
    blob = np.load(data_path)
    Y = blob["Y"]
    init = {"C": blob["C0"], "d": np.ravel(blob["d0"]), "tau": np.ravel(blob["tau0"])}

    os.environ.setdefault("MPLBACKEND", "Agg")
    _install_statsmodels_stub()
    os.chdir("/root/reference")
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/funs")
    import funs.engine as engine  # noqa: E402

    exp = _Experiment(Y, float(blob["trialDur"]), float(blob["binSize"]))

    if mode in ("laplace", "variational"):
        t0 = time.time()
        fit = engine.PPGPFAfit(
            experiment=exp,
            initParams=init,
            inferenceMethod=mode,
            EMmode="Batch",
            maxEMiter=n_iters,
        )
        elapsed = time.time() - t0
        out = {
            "mode": mode,
            "sec_per_iter": elapsed / n_iters,
            "total_sec": elapsed,
            "n_iters": n_iters,
            "post_loglik": [float(v) for v in fit.posteriorLikelihood],
            "shape": list(Y.shape),
        }
        if mode == "variational":
            out["var_lower_bound"] = [float(v) for v in fit.variationalLowerBound]
    elif mode == "online":
        # online-EM 'diag' rule, batch of 10 trials (reference engine.py:243-450).
        # The reference draws minibatches inside util.subsampleTrials and does
        # NOT store the stream; wrap it (measurement instrumentation, not a
        # code change) so the per-iteration batchTrIdx can be replayed through
        # pgpfa's fit_loop(batch_indices=...) for trajectory parity against
        # the ACTUAL reference semantics (VERDICT round-2 directive 2).
        seen_idx = []
        orig_subsample = engine.util.subsampleTrials

        def recording_subsample(experiment, batchSize):
            sub = orig_subsample(experiment, batchSize)
            seen_idx.append([int(i) for i in sub.batchTrIdx])
            return sub

        # patch the module object engine actually holds (it does a top-level
        # `import util` from /root/reference/funs)
        engine.util.subsampleTrials = recording_subsample
        np.random.seed(0)
        t0 = time.time()
        fit = engine.PPGPFAfit(
            experiment=exp,
            initParams=init,
            inferenceMethod="laplace",
            EMmode="Online",
            batchSize=10,
            onlineParamUpdateMethod="diag",
            maxEMiter=n_iters,
        )
        elapsed = time.time() - t0
        out = {
            "mode": mode,
            "sec_per_iter": elapsed / n_iters,
            "total_sec": elapsed,
            "n_iters": n_iters,
            "batch_size": 10,
            "update_rule": "diag",
            "numpy_seed": 0,
            "post_loglik": [float(v) for v in fit.posteriorLikelihood],
            "batch_indices": seen_idx,
            "shape": list(Y.shape),
        }
    elif mode == "mcmc":
        import funs.mcmc as mcmc  # noqa: E402

        t0 = time.time()
        samples = mcmc.PosteriorMCMC(exp, init, n_iters, 0)
        elapsed = time.time() - t0
        out = {
            "mode": mode,
            "samples_per_sec": n_iters / elapsed,
            "total_sec": elapsed,
            "n_samples": n_iters,
            "sample_mean_norm": float(np.linalg.norm(samples.mean(axis=0))),
            "shape": list(Y.shape),
        }
    elif mode in ("cv", "cv_stevenson"):
        import funs.util as util  # noqa: E402

        if mode == "cv":
            n_train, n_test, max_xdim = max(Y.shape[0] - 2, 2), 2, 3
        else:
            # the feasible Stevenson slice (round-4 bench row): first 10
            # trials train / next 2 test, xdim sweep 1..5 — the SAME slice
            # pgpfa's bench.py stevenson_cv row runs.
            n_train, n_test, max_xdim = 10, 2, 5
        t0 = time.time()
        cv = util.crossValidation(
            exp, numTrainingTrials=n_train, numTestTrials=n_test,
            maxXdim=max_xdim, maxEMiter=n_iters,
        )
        elapsed = time.time() - t0
        out = {
            "mode": mode,
            "total_sec": elapsed,
            "max_xdim": max_xdim,
            "n_train": n_train,
            "n_test": n_test,
            "n_iters": n_iters,
            "optim_xdim": int(cv.optimXdim),
            "errs": [float(e) for e in cv.errs],
            "shape": list(Y.shape),
        }
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    # leading newline: the reference's Printer leaves an unterminated line on
    # stdout, which would otherwise concatenate with the JSON
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
