"""Quick TPU parity probe: nPLL trajectory vs the recorded reference run
(BASELINE_MEASURED.json), per iteration. ~1 bench-tenth of the cost.

Run: python scripts/parity_check.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build_problem

import jax  # noqa: E402

from pgpfa.em.fit import FitConfig, fit_loop  # noqa: E402


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    ref = np.asarray(base["post_loglik"])
    orc = None
    orc_path = os.path.join(root, "ORACLE_TRAJ_STEVENSON.json")
    if os.path.exists(orc_path):
        with open(orc_path) as f:
            orc = np.asarray(json.load(f)["post_loglik"])
    n = len(orc) if orc is not None else len(ref)
    ds, init = build_problem()
    print(f"device: {jax.devices()[0]}", flush=True)
    res = fit_loop(init, ds.Y, ds.binSize, FitConfig(max_em_iter=n))
    ours = np.asarray(res.post_loglik)
    diff = np.abs(ours[: len(ref)] - ref)
    print("ref :", " ".join(f"{v:.6f}" for v in ref), flush=True)
    print("ours:", " ".join(f"{v:.6f}" for v in ours), flush=True)
    print("diff vs ref:", " ".join(f"{v:.2e}" for v in diff), flush=True)
    print(f"max abs diff vs reference ({len(ref)} iters): {diff.max():.3e}", flush=True)
    if orc is not None:
        d_o = np.abs(ours[: len(orc)] - orc)
        print("diff vs exact oracle:", " ".join(f"{v:.2e}" for v in d_o), flush=True)
        print(f"max abs diff vs oracle ({len(orc)} iters): {d_o.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
