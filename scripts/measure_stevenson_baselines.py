"""Measure the reference's Stevenson-scale VI and CV baselines (round 4).

Runs the ORIGINAL mackelab/poisson-gpfa code (CPU, subprocess per config via
measure_reference_baseline.py) on the exact Stevenson-shaped surrogate
bench.py uses, and writes:

* BASELINE_MEASURED_VI_STEVENSON.json — dual-variational batch EM at the
  Stevenson shape (90n x 140t), first-10-trials slice, ONE EM iteration
  (BASELINE.json config 2 at flagship scale). The full 100-trial iteration is
  infeasible to measure directly: ONE reference dual solve (bounded-lambda
  L-BFGS-B over the 12,600-dim per-trial dual, funs/inference.py:315-324)
  takes >10 min on this CPU, so a full iteration is >17 h. The reference's
  E-step and M-step moment sums are per-trial loops (linear in trials), so
  sec_per_iter on the slice extrapolates linearly; pgpfa's bench row runs the
  SAME 10-trial slice for vs_baseline and the full 100 trials for the
  absolute number.
* BASELINE_MEASURED_CV_STEVENSON.json — crossValidation latent-dim sweep on a
  feasible Stevenson slice: first 10 trials training / next 2 test, maxXdim=5,
  maxEMiter=3 (the SAME slice pgpfa's bench row runs — VERDICT r3 item 1).

Usage: python scripts/measure_stevenson_baselines.py [vi|cv|both] [vi_iters] [vi_trials]
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

VI_ITERS = 1
VI_TRIALS = 10
CV_TRAIN, CV_TEST, CV_MAX_XDIM, CV_EM_ITERS = 10, 2, 5, 3


def _measure(path, n_iters, mode):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/measure_reference_baseline.py"),
         path, str(n_iters), mode],
        capture_output=True, text=True, timeout=24 * 3600,
    )
    if out.returncode != 0:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"reference measurement failed for mode {mode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    vi_iters = int(sys.argv[2]) if len(sys.argv) > 2 else VI_ITERS
    vi_trials = int(sys.argv[3]) if len(sys.argv) > 3 else VI_TRIALS

    from pgpfa.data.init import initialize_params
    from pgpfa.data.surrogate import stevenson_surrogate

    ds = stevenson_surrogate(xdim=5, seed=2011)
    init = initialize_params(5, ds.ydim, ds, seed=0)
    f = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
    np.savez(f.name, Y=ds.Y, C0=init["C"], d0=init["d"], tau0=init["tau"],
             trialDur=ds.trialDur, binSize=ds.binSize)

    if which in ("vi", "both"):
        fvi = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
        np.savez(fvi.name, Y=ds.Y[:vi_trials], C0=init["C"], d0=init["d"],
                 tau0=init["tau"], trialDur=ds.trialDur, binSize=ds.binSize)
        print(f"measuring stevenson variational x{vi_iters} on first "
              f"{vi_trials} trials (slow)...", file=sys.stderr, flush=True)
        res = _measure(fvi.name, vi_iters, "variational")
        res["n_trials_slice"] = vi_trials
        res["note"] = ("reference dual VI is a per-trial scipy loop; "
                       "sec_per_iter is linear in trials (one dual solve "
                       ">10 min => full 100-trial iteration >17h, infeasible)")
        with open(os.path.join(REPO, "BASELINE_MEASURED_VI_STEVENSON.json"), "w") as fo:
            json.dump(res, fo, indent=1)
        print(json.dumps(res), flush=True)
        os.unlink(fvi.name)

    if which in ("cv", "both"):
        print("measuring stevenson cv slice...", file=sys.stderr, flush=True)
        res = _measure(f.name, CV_EM_ITERS, "cv_stevenson")
        with open(os.path.join(REPO, "BASELINE_MEASURED_CV_STEVENSON.json"), "w") as fo:
            json.dump(res, fo, indent=1)
        print(json.dumps(res), flush=True)

    os.unlink(f.name)


if __name__ == "__main__":
    main()
