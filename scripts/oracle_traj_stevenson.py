"""Extend the cached exact-oracle EM trajectory at Stevenson scale.

Runs the independent NumPy/SciPy oracle (``pgpfa/oracle``) on the exact data
and init ``bench.py`` uses, for N batch Laplace-EM iterations, and writes
``ORACLE_TRAJ_STEVENSON.json`` (same format as the round-2 10-iteration
cache; the first 10 values must reproduce it bit-for-bit — the oracle is
deterministic). This is the long-horizon side of the converged-value parity
statistic (VERDICT round 2, directive 6).

Usage: python scripts/oracle_traj_stevenson.py [n_iter] [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bench import build_problem  # noqa: E402
from pgpfa.oracle import oracle_np as onp  # noqa: E402


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ORACLE_TRAJ_STEVENSON.json",
    )
    ds, init = build_problem()
    t0 = time.time()
    hist = onp.em_fit(
        ds.Y.astype(float), np.asarray(init["C"]), np.asarray(init["d"]),
        np.asarray(init["tau"]), float(ds.binSize), n_iter=n_iter,
    )
    elapsed = time.time() - t0
    out = {
        "post_loglik": [float(v) for v in hist["post_loglik"]],
        "tau": [[float(x) for x in t] for t in hist["tau"]],
        "desc": (
            "exact NumPy/SciPy oracle (pgpfa/oracle), Stevenson surrogate, "
            f"same data/init as bench.py; {n_iter} batch Laplace-EM iterations"
        ),
        "sec_per_iter": elapsed / n_iter,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"n_iter": n_iter, "sec_per_iter": elapsed / n_iter,
                      "final_pll": out["post_loglik"][-1]}))


if __name__ == "__main__":
    main()
