"""Oracle online-EM trajectory on the reference's OWN recorded minibatch stream.

Runs the independent NumPy/SciPy oracle (``pgpfa/oracle``) online-EM on the
exact data/init ``bench.py`` uses, injecting the minibatch index stream the
ACTUAL reference code drew during the baseline measurement
(``BASELINE_MEASURED_ONLINE_TRAJ.json``). Writes ``ORACLE_ONLINE_TRAJ.json``.

Why: ``bench.py`` reports package-vs-reference per-iteration online nPLL
diffs on this stream. The oracle implements the package's documented online
deviations (exact analytic curvature, consistent closed-form d, PD identity
prior init — ``pgpfa/oracle/oracle_np.py:online_em_fit``) in an independent
dense scipy implementation, so oracle-vs-reference on the SAME stream is the
floor those deviations + trajectory chaos impose on ANY implementation of
this spec — decomposing the package-vs-reference delta into "spec deviation"
(shared with the oracle) and "implementation" (package-vs-oracle) parts.

Usage: python scripts/oracle_online_traj.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bench import build_problem, _load  # noqa: E402
from pgpfa.oracle import oracle_np as onp  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ORACLE_ONLINE_TRAJ.json",
    )
    base = _load("BASELINE_MEASURED_ONLINE_TRAJ.json")
    idx_seq = [np.asarray(i) for i in base["batch_indices"]]
    ds, init = build_problem()
    t0 = time.time()
    hist = onp.online_em_fit(
        ds.Y.astype(float), np.asarray(init["C"]), np.asarray(init["d"]),
        np.asarray(init["tau"]), float(ds.binSize), idx_seq,
        method=base.get("update_rule", "diag"),
        max_em_iter=len(idx_seq),
    )
    elapsed = time.time() - t0
    oracle_pll = [float(v) for v in hist["post_loglik"]]
    ref_pll = [float(v) for v in base["post_loglik"]][: len(oracle_pll)]
    diffs = [abs(a - b) for a, b in zip(oracle_pll, ref_pll)]
    out = {
        "desc": (
            "oracle (package-spec, independent scipy impl) online 'diag' EM on "
            "the reference's recorded minibatch stream; same data/init as "
            "bench.py. per_iter_absdiff_vs_reference is the floor the "
            "documented online deviations + chaos impose on any "
            "implementation of this spec."
        ),
        "update_rule": base.get("update_rule", "diag"),
        "n_iters": len(oracle_pll),
        "post_loglik": oracle_pll,
        "reference_post_loglik": ref_pll,
        "per_iter_absdiff_vs_reference": [round(d, 9) for d in diffs],
        "maxabs_vs_reference": max(diffs),
        "sec_per_iter": elapsed / max(1, len(oracle_pll)),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("per_iter_absdiff_vs_reference", "maxabs_vs_reference",
                       "sec_per_iter")}))


if __name__ == "__main__":
    main()
