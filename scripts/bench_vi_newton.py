"""Probe + measure the dual-Newton VI solver at Stevenson scale (TPU).

Answers the three round-5 questions about the variational E-step:
1. does the FULL-WIDTH (100-trial) batched dual solve run without crashing
   the worker when the solver is the small dual-Newton program (the chunked
   L-BFGS crashed at vmap width >= 25 and wedged after ~10-20 dispatches)?
2. does a MULTI-ITERATION fit survive in ONE process?
3. per-EM-iteration wall clock, cold and warm.

Prints one JSON line. Usage:
    python scripts/bench_vi_newton.py [n_trials] [n_iters] [cold] [warm] [chunk]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_problem
from pgpfa.em.fit import FitConfig, _chunked_estep, _phase_programs


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cold = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    warm = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    import jax
    import jax.numpy as jnp

    ds, init = build_problem()
    Y = jnp.asarray(ds.Y[:n_trials], dtype=jnp.float64)
    T = Y.shape[-1]
    cfg = FitConfig(inference_method="variational", max_em_iter=n_iters,
                    vi_solver="newton", vi_maxiter=cold, vi_maxiter_warm=warm)
    estep, mstep_batch, _ = _phase_programs(T, float(ds.binSize), cfg)
    if chunk:
        estep = _chunked_estep(estep, chunk)

    C = jnp.asarray(init["C"]); d = jnp.asarray(np.ravel(init["d"]))
    tau = jnp.asarray(np.ravel(init["tau"]))
    warm_rho = None
    warm_prev = None
    iter_secs, plls, vlbs = [], [], []
    print(f"device: {jax.devices()[0]}; n_trials={n_trials} iters={n_iters} "
          f"budgets=({cold},{warm}) chunk={chunk or 'off'}", file=sys.stderr)
    for n in range(n_iters):
        t0 = time.time()
        ex = None if warm_rho is None else 2.0 * warm_rho - warm_prev
        inf, pll, vlb, new_warm = estep(C, d, tau, Y, ex)
        float(pll)  # scalar readback: sync through the tunnel
        t_e = time.time() - t0
        warm_prev = new_warm if warm_rho is None else warm_rho
        warm_rho = new_warm
        t0 = time.time()
        cd, tr = mstep_batch(C, d, tau, Y, inf)
        C, d, tau = cd.C, cd.d, tr.tau
        float(tr.cost[0])
        t_m = time.time() - t0
        iter_secs.append(t_e + t_m)
        plls.append(float(pll)); vlbs.append(float(vlb))
        print(f"iter {n}: estep {t_e:.1f}s mstep {t_m:.1f}s "
              f"pll {plls[-1]:.6f} vlb {vlbs[-1]:.6f}", file=sys.stderr)
    print(json.dumps({
        "n_trials": n_trials, "n_iters": n_iters,
        "cold_budget": cold, "warm_budget": warm, "chunk": chunk,
        "iter_secs": [round(s, 3) for s in iter_secs],
        "sec_per_iter_cold": iter_secs[0],
        "sec_per_iter_warm": (float(np.mean(iter_secs[1:]))
                              if len(iter_secs) > 1 else None),
        "post_loglik": plls, "var_lower_bound": vlbs,
    }), flush=True)


if __name__ == "__main__":
    main()
