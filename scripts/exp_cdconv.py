"""Diagnostic: does the cd M-step converge within its fixed Newton budget at
Stevenson scale? Prints the cd gradient inf-norm after each EM iteration's
M-step for several n_iter budgets, plus the resulting nPLL trajectory drift.

Run: python scripts/exp_cdconv.py
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from bench import build_problem
from pgpfa.em.fit import FitConfig, _phase_programs
from pgpfa.models.params import Params


def run(cfg, n_em=4):
    ds, init = build_problem()
    p = Params.from_dict(init)
    Y = jnp.asarray(ds.Y, dtype=p.C.dtype)
    estep, mstep_batch, _ = _phase_programs(Y.shape[-1], float(ds.binSize), cfg)
    C, d, tau = p.C, p.d, p.tau
    warm = None
    gnorms, plls = [], []
    for n in range(n_em):
        inf, pll, vlb, warm = estep(C, d, tau, Y, warm)
        cd, tr = mstep_batch(C, d, tau, Y, inf)
        C, d, tau = cd.C, cd.d, tr.tau
        gnorms.append(float(cd.grad_norm))
        plls.append(float(pll))
    return gnorms, plls


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    base = None
    for n_iter in (6, 8):
        cfg = FitConfig(max_em_iter=4, cd_newton_iters=n_iter)
        g, pll = run(cfg)
        if base is None:
            base = pll
        drift = max(abs(a - b) for a, b in zip(pll, base))
        print(f"cd_newton_iters={n_iter:2d}: gnorm/EM-iter="
              f"{['%.2e' % x for x in g]}  nPLL drift vs first cfg: {drift:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
