"""Benchmark: full batch Laplace-EM throughput on the Stevenson-shaped workload.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

* value        — steady-state EM iterations/second of the fused ``lax.scan``
                 fit on the default device (TPU when available), f64.
* vs_baseline  — speedup of seconds/EM-iteration vs the ORIGINAL reference
                 implementation (/root/reference, NumPy/SciPy, single CPU
                 process) on the same data and init. The reference timing is
                 measured once by scripts/measure_reference_baseline.py and
                 cached in BASELINE_MEASURED.json (re-measure with
                 --measure-baseline).

Workload (BASELINE.json config #4 stand-in): Stevenson-2011-shaped surrogate —
ydim=90, T=140 (1400 ms / 10 ms bins), 100 trials, xdim=5 fit with timescale
learning. The real .mat blob is stripped from the mounted reference.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

XDIM = 5
SEED = 2011
BENCH_ITERS = 10
BASELINE_ITERS = 2


def build_problem():
    import numpy as np

    from pgpfa.data.init import initialize_params
    from pgpfa.data.surrogate import stevenson_surrogate

    ds = stevenson_surrogate(xdim=XDIM, seed=SEED)
    init = initialize_params(XDIM, ds.ydim, ds, seed=0)
    return ds, init


def measure_baseline(ds, init, n_iters=BASELINE_ITERS):
    import numpy as np
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        np.savez(
            f.name,
            Y=ds.Y,
            C0=init["C"],
            d0=init["d"],
            tau0=init["tau"],
            trialDur=ds.trialDur,
            binSize=ds.binSize,
        )
        path = f.name
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/measure_reference_baseline.py"), path, str(n_iters)],
        capture_output=True,
        text=True,
        timeout=24 * 3600,
    )
    os.unlink(path)
    if out.returncode != 0:
        print(out.stdout, file=sys.stderr)
        print(out.stderr, file=sys.stderr)
        raise RuntimeError("reference baseline measurement failed")
    result = json.loads(out.stdout.strip().splitlines()[-1])
    with open(CACHE, "w") as f:
        json.dump(result, f, indent=1)
    return result


def main():
    ds, init = build_problem()

    if "--measure-baseline" in sys.argv or not os.path.exists(CACHE):
        print("measuring reference baseline (original scipy code)...", file=sys.stderr)
        baseline = measure_baseline(ds, init)
    else:
        with open(CACHE) as f:
            baseline = json.load(f)

    import jax
    import numpy as np

    from pgpfa.em.fit import FitConfig, fit_loop

    cfg = FitConfig(max_em_iter=BENCH_ITERS)
    print(f"bench device: {jax.devices()[0]}", file=sys.stderr)

    t0 = time.time()
    res = fit_loop(init, ds.Y, ds.binSize, cfg)
    res.post_loglik.block_until_ready()
    compile_and_run = time.time() - t0

    t0 = time.time()
    res = fit_loop(init, ds.Y, ds.binSize, cfg)
    res.post_loglik.block_until_ready()
    steady = time.time() - t0

    iters_per_sec = BENCH_ITERS / steady
    sec_per_iter = steady / BENCH_ITERS
    speedup = baseline["sec_per_iter"] / sec_per_iter

    # first-iteration parity sanity (same data + init as the reference run)
    parity = None
    if baseline.get("post_loglik"):
        parity = abs(float(np.asarray(res.post_loglik)[0]) - baseline["post_loglik"][0])
    print(
        f"compile+first run: {compile_and_run:.1f}s; steady: {sec_per_iter:.3f}s/iter; "
        f"reference: {baseline['sec_per_iter']:.1f}s/iter; "
        f"first-iter nPLL abs diff vs reference: {parity}",
        file=sys.stderr,
    )

    if "--all-configs" in sys.argv:
        secondary_configs(file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "batch Laplace-EM throughput, Stevenson-shaped (90n x 140t x 100tr, xdim=5), f64",
                "value": round(iters_per_sec, 4),
                "unit": "EM iters/sec",
                "vs_baseline": round(speedup, 2),
            }
        )
    )


def secondary_configs(file=sys.stderr, iters: int = 10):
    """Time the remaining BASELINE.json workload configs (secondary metrics,
    stderr): example.py-style synthetic Laplace EM, variational EM on the same
    data, and stochastic/online EM ('diag') on the Stevenson-shaped data."""
    import numpy as np

    import pgpfa
    from pgpfa.em.fit import FitConfig, fit_loop

    synth = pgpfa.dataset(xdim=2, ydim=20, numTrials=5, trialDur=1000, binSize=20,
                          dOffset=1, fixTau=True, fixedTau=np.linspace(0.1, 0.5, 2),
                          seed=123, backend="numpy")
    init_s = pgpfa.initializeParams(2, 20, synth, seed=0)
    ds, init = build_problem()

    jobs = [
        ("synthetic Laplace-EM (example.py config)", synth, init_s,
         FitConfig(max_em_iter=iters)),
        ("Stevenson-shaped online-EM 'diag' (batch 10)", ds, init,
         FitConfig(em_mode="online", online_update="diag", batch_size=10,
                   max_em_iter=iters)),
        # VI maps trials sequentially (lax.map) — the vmapped while_loop
        # form crashed this TPU's worker; see pgpfa/infer/variational.py.
        ("synthetic variational-EM", synth, init_s,
         FitConfig(inference_method="variational", max_em_iter=iters)),
    ]
    for name, data, ip, cfg in jobs:
        try:
            res = fit_loop(ip, data.Y, data.binSize, cfg)  # compile
            float(np.asarray(res.post_loglik)[-1])
            t0 = time.time()
            res = fit_loop(ip, data.Y, data.binSize, cfg)
            float(np.asarray(res.post_loglik)[-1])
            dt = time.time() - t0
            print(
                json.dumps({"metric": name, "value": round(iters / dt, 4),
                            "unit": "EM iters/sec"}),
                file=file,
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            print(
                json.dumps({"metric": name, "error": str(e)[:200]}), file=file
            )


if __name__ == "__main__":
    main()
