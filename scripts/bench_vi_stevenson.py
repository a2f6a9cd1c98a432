"""One-shot Stevenson-scale variational-EM measurement (subprocess worker).

Runs ONE chunked host-loop variational EM iteration on the full 100-trial
Stevenson-shaped workload and prints a single JSON line. bench.py invokes
this in a FRESH process because the tunneled v5e's TPU worker wedges (hangs
with no error) after ~10-20 dispatches of the 12,600-dim dual L-BFGS
program at this shape — one EM iteration (10 chunk dispatches at the proven
width of 10 trials + the M-steps) completes reliably, a second one in the
same process does not. The per-process compile cost is amortized by the
persistent compilation cache (~/.cache/pgpfa/jax), so the one-call wall
time is execution-dominated; it still INCLUDES cache-hit compile/trace
overhead, which biases the reported speedup DOWN (conservative).

Usage: python scripts/bench_vi_stevenson.py [n_trials] [n_iters] [solver]

``solver`` is ``lbfgs`` (default; the round-2/4 chunked path) or ``newton``
(the round-5 damped dual-Newton solver — a far smaller XLA program that runs
the full 100-trial batch in ONE dispatch, no trial chunking needed).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_problem
from pgpfa.em.fit import FitConfig, fit_loop


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    solver = sys.argv[3] if len(sys.argv) > 3 else "lbfgs"
    ds, init = build_problem()
    Y = ds.Y[:n_trials]
    cfg = FitConfig(inference_method="variational", max_em_iter=n_iters,
                    vi_solver=solver,
                    vi_trial_chunk=10 if solver == "lbfgs" else None)
    t0 = time.time()
    res = fit_loop(init, Y, ds.binSize, cfg, record_iter_sec=True)
    pll = np.asarray(res.post_loglik)
    vlb = np.asarray(res.var_lower_bound)
    dt = time.time() - t0
    print(json.dumps({
        "n_trials": n_trials,
        "n_iters": n_iters,
        "solver": solver,
        "total_sec": dt,
        "sec_per_iter": dt / n_iters,
        "iter_secs": [round(float(s), 3) for s in np.asarray(res.iter_sec)],
        "post_loglik": pll.tolist(),
        "var_lower_bound": vlb.tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
