"""Probe: does the FUSED whole-EM variational program run at Stevenson scale
with the dual-Newton solver?

Round 2-4 status: the fused ``fit()`` with ``inference_method='variational'``
crashed this tunneled v5e's worker at the Stevenson shape (the
``scan{while_loop{scan}}`` chunked dual L-BFGS inside the whole-EM scan was
the suspect topology — README "Known performance limits"). The dual-Newton
solver shrinks the inner program by ~an order of magnitude; if the fused
program now runs, variational EM gets the same one-dispatch whole-fit path
as Laplace (and the host-loop's per-phase dispatch overhead disappears).

Prints one JSON line. Usage:
    python scripts/exp_fused_vi_newton.py [n_trials] [n_iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_problem
from pgpfa.em.fit import FitConfig, fit


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax.numpy as jnp

    ds, init = build_problem()
    Y = jnp.asarray(ds.Y[:n_trials], dtype=jnp.float64)
    cfg = FitConfig(inference_method="variational", max_em_iter=n_iters,
                    vi_solver="newton")
    t0 = time.time()
    res = fit(init, Y, ds.binSize, cfg)
    pll_last = float(np.asarray(res.post_loglik)[-1])  # sync
    t_first = time.time() - t0  # includes compile
    t0 = time.time()
    res = fit(init, Y, ds.binSize, cfg)
    pll_last = float(np.asarray(res.post_loglik)[-1])
    dt = time.time() - t0
    print(json.dumps({
        "n_trials": n_trials, "n_iters": n_iters,
        "fused_total_sec": dt,
        "fused_sec_per_iter": dt / n_iters,
        "first_call_sec_incl_compile": round(t_first, 1),
        "post_loglik": np.asarray(res.post_loglik).tolist(),
        "var_lower_bound": np.asarray(res.var_lower_bound).tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
