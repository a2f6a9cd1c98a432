"""Long-trial example: the banded (block-tridiagonal) E-step.

Fits trials with T = 1000 time bins — where the dense path would hold a
(xdim*T)^2 Hessian per trial — through ``FitConfig(time_block=s)``, the
linear-in-T sequence-scaling path (``pgpfa/ops/blocktridiag.py``).

Run:  python examples/example_longtrial.py
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pgpfa
from pgpfa.ops.blocktridiag import btd_truncation_error

xdim, ydim, T, n_trials, bin_ms = 2, 15, 1000, 3, 10
tau_true = np.array([0.05, 0.08])  # short timescales vs the 10 s trial

rng = np.random.default_rng(0)
C = rng.uniform(-0.4, 0.4, (ydim, xdim))
d = rng.uniform(-1.0, -0.2, ydim)

# sample latents from the GP prior, observations from the Poisson model
from pgpfa.oracle.oracle_np import rbf_block

X = np.stack([
    np.stack([rng.multivariate_normal(np.zeros(T), rbf_block(tau_true[k], T, bin_ms))
              for k in range(xdim)])
    for _ in range(n_trials)
])
Y = rng.poisson(np.exp(np.einsum("nk,rkt->rnt", C, X) + d[None, :, None])).astype(float)

# block size: block * bin >= 6 * tau -> banding truncation ~1e-8
block = 50
print(f"banding truncation at tau={tau_true}: "
      f"{btd_truncation_error(tau_true, bin_ms, block):.2e}")

cfg = pgpfa.FitConfig(max_em_iter=10, time_block=block)
res = pgpfa.fit_loop({"C": C + 0.1 * rng.standard_normal(C.shape),
                      "d": d, "tau": np.array([0.06, 0.06])},
                     Y, bin_ms, cfg)

pll = np.asarray(res.post_loglik)
print(f"nPLL: {pll[0]:.2f} -> {pll[-1]:.2f}")
print(f"tau estimated: {np.asarray(res.tau)} (true {tau_true})")
