"""Measure every reference baseline the bench suite compares against.

Runs the ORIGINAL mackelab/poisson-gpfa code (CPU, subprocess per config via
measure_reference_baseline.py) on the exact data bench.py uses, and writes:

* BASELINE_MEASURED.json      — Stevenson-scale batch Laplace EM (4 iters)
* BASELINE_MEASURED_VI.json   — toy synthetic variational EM
* BASELINE_MEASURED_MCMC.json — elliptical-slice sampling throughput (toy)
* BASELINE_MEASURED_CV.json   — CV latent-dim sweep, maxXdim=3 (toy)

Usage: python scripts/measure_all_baselines.py [stevenson_iters]
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


def _save_problem(Y, init, trial_dur, bin_size):
    f = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
    np.savez(f.name, Y=Y, C0=init["C"], d0=init["d"], tau0=init["tau"],
             trialDur=trial_dur, binSize=bin_size)
    return f.name


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
    stevenson_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import pgpfa
    from pgpfa.data.init import initialize_params
    from pgpfa.data.surrogate import stevenson_surrogate

    # toy config (bench.py secondary configs / reference example.py shape)
    synth = pgpfa.dataset(xdim=2, ydim=20, numTrials=5, trialDur=1000, binSize=20,
                          dOffset=1, fixTau=True, fixedTau=np.linspace(0.1, 0.5, 2),
                          seed=123, backend="numpy")
    init_s = pgpfa.initializeParams(2, 20, synth, seed=0)
    toy = _save_problem(synth.Y, init_s, synth.trialDur, synth.binSize)

    jobs = [
        ("BASELINE_MEASURED_VI.json", toy, 10, "variational"),
        ("BASELINE_MEASURED_MCMC.json", toy, 500, "mcmc"),
        ("BASELINE_MEASURED_CV.json", toy, 3, "cv"),
    ]
    for fname, path, n, mode in jobs:
        print(f"measuring {mode}...", file=sys.stderr, flush=True)
        res = _measure(path, n, mode)
        with open(os.path.join(REPO, fname), "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res), flush=True)

    # Stevenson-scale MCMC (single chain — the reference has no batching)
    ds = stevenson_surrogate(xdim=5, seed=2011)
    init = initialize_params(5, ds.ydim, ds, seed=0)
    big = _save_problem(ds.Y, init, ds.trialDur, ds.binSize)
    print("measuring stevenson mcmc...", file=sys.stderr, flush=True)
    res = _measure(big, 200, "mcmc")
    with open(os.path.join(REPO, "BASELINE_MEASURED_MCMC_STEVENSON.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)

    # Stevenson-scale online-EM 'diag' (batch 10) — the bench's online row
    print("measuring stevenson online 'diag'...", file=sys.stderr, flush=True)
    res = _measure(big, 5, "online")
    with open(os.path.join(REPO, "BASELINE_MEASURED_ONLINE.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)

    # Stevenson-scale batch Laplace (the headline denominator) last — longest
    print(f"measuring stevenson laplace x{stevenson_iters}...", file=sys.stderr, flush=True)
    res = _measure(big, stevenson_iters, "laplace")
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)

    os.unlink(toy)
    os.unlink(big)


if __name__ == "__main__":
    main()
