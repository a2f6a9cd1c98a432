"""Weak-scaling report for the trial-sharded fused EM (SCALING.md source).

Runs on the virtual 8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=8), so WALL-CLOCK numbers share one physical core and are NOT a
scaling measurement — the exact, hardware-independent evidence is the
COLLECTIVE count and byte volume per EM iteration, read from the compiled
GSPMD HLO of the very program `fit_sharded` executes. On a real slice the
all-reduces ride ICI.

Writes SCALING_REPORT.json and prints a markdown table.

Usage: python scripts/scaling_report.py [trials_per_device] [em_iters]
"""

import json
import os
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("PGPFA_COMPILE_CACHE", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pgpfa  # noqa: E402
from pgpfa.em.fit import FitConfig, _fit_scan  # noqa: E402
from pgpfa.models.params import Params  # noqa: E402
from pgpfa.parallel.mesh import make_mesh, replicated, trial_sharding  # noqa: E402

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
                "all-to-all")
_SHAPE_RE = re.compile(r"(f32|f64|bf16|s32|u32|pred)\[([0-9,]*)\]")
_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}


def collective_stats(hlo_text):
    """Count collective ops and sum their output byte volumes from HLO text."""
    counts, bytes_total = {}, 0
    for line in hlo_text.splitlines():
        s = line.strip()
        # match op names like `%all-reduce.3 = f64[5,140,140] all-reduce(...)`
        for kind in _COLLECTIVES:
            if re.search(rf"= [^=]*\b{kind}(\.|\()", s) or f" {kind}(" in s:
                counts[kind] = counts.get(kind, 0) + 1
                m = _SHAPE_RE.search(s)
                if m:
                    dt, dims = m.group(1), m.group(2)
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    bytes_total += n * _BYTES.get(dt, 4)
                break
    return counts, bytes_total


def main():
    trials_per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    em_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    devices = jax.devices()
    assert len(devices) >= 8, "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"

    # Stevenson-shaped trials (smaller T to keep the CPU run quick; the
    # collective structure is shape-generic)
    ydim, T, xdim = 30, 60, 3
    rng = np.random.default_rng(0)
    cfg = FitConfig(max_em_iter=em_iters)
    rows = []
    for n_dev in (1, 2, 4, 8):
        R = trials_per_device * n_dev
        ds = pgpfa.dataset(xdim=xdim, ydim=ydim, numTrials=R, trialDur=T * 20,
                           binSize=20, dOffset=1, fixTau=True,
                           fixedTau=np.linspace(0.1, 0.3, xdim), seed=1,
                           backend="numpy")
        init = pgpfa.initializeParams(xdim, ydim, ds, seed=0)
        p = Params.from_dict(init)
        mesh = make_mesh(devices[:n_dev])
        Y = jax.device_put(jnp.asarray(ds.Y, dtype=p.C.dtype), trial_sharding(mesh))
        rep = replicated(mesh)
        args = (jax.device_put(p.C, rep), jax.device_put(p.d, rep),
                jax.device_put(p.tau, rep), Y, T, 20.0, cfg,
                jax.device_put(jax.random.PRNGKey(0), rep))

        lowered = _fit_scan.lower(*args)
        compiled = lowered.compile()
        counts, vol = collective_stats(compiled.as_text())

        res = _fit_scan(*args)  # warm
        float(np.asarray(res.post_loglik)[-1])
        t0 = time.time()
        res = _fit_scan(*args)
        float(np.asarray(res.post_loglik)[-1])
        dt = time.time() - t0

        rows.append({
            "devices": n_dev, "trials": R,
            "trials_per_device": trials_per_device,
            "collectives_in_program": counts,
            "collective_bytes_in_program": vol,
            "wall_sec_per_iter_cpu_virtual": round(dt / em_iters, 4),
            "final_pll": float(np.asarray(res.post_loglik)[-1]),
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    # exactness across device counts: identical data prefix -> the 8-trial
    # problem is NOT identical across rows (R grows), so instead rerun the
    # largest problem on 1 vs 8 devices and compare
    ds = pgpfa.dataset(xdim=xdim, ydim=ydim, numTrials=trials_per_device * 8,
                       trialDur=T * 20, binSize=20, dOffset=1, fixTau=True,
                       fixedTau=np.linspace(0.1, 0.3, xdim), seed=1,
                       backend="numpy")
    init = pgpfa.initializeParams(xdim, ydim, ds, seed=0)
    from pgpfa.parallel.sharded import fit_sharded
    r1 = fit_sharded(init, ds.Y, 20.0, cfg, mesh=make_mesh(devices[:1]))
    r8 = fit_sharded(init, ds.Y, 20.0, cfg, mesh=make_mesh(devices[:8]))
    exact = float(np.max(np.abs(np.asarray(r1.post_loglik) - np.asarray(r8.post_loglik))))
    out = {"rows": rows, "pll_maxabs_1dev_vs_8dev": exact,
           "shape": {"ydim": ydim, "T": T, "xdim": xdim},
           "em_iters": em_iters}
    with open(os.path.join(REPO, "SCALING_REPORT.json"), "w") as f:
        json.dump(out, f, indent=1)

    print("| devices | trials | all-reduces in program | collective bytes | CPU-virtual s/iter |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['devices']} | {r['trials']} | "
              f"{r['collectives_in_program'].get('all-reduce', 0)} | "
              f"{r['collective_bytes_in_program']} | "
              f"{r['wall_sec_per_iter_cpu_virtual']} |")
    print(f"1-dev vs 8-dev pll maxabs: {exact:.3e}")


if __name__ == "__main__":
    main()
