"""Long-trial scaling benchmark: banded (block-tridiagonal) vs dense FULL EM
iteration (E-step + both M-steps) wall time as T grows. The reference's
T-scaling wall is the dense (xdim*T)^2/3 Hessian work in the E-step AND the
dense (T, T) logdet/solve work in the tau M-step (funs/learning.py:175-255);
the banded path is O(T s^2) time / O(T s) memory END-TO-END — the tau M-step
runs on the banded moments directly (pgpfa/learn/mstep_gp.py:tau_cost_banded)
and the (xdim, T, T) PautoSum is never materialized.

Prints one line per (T, path) with seconds per EM iteration on the default
device, plus a posterior-mode checksum at each size. `--estep` restores the
round-2 E-step-only measurement.

Run: python scripts/bench_longt.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pgpfa.infer.laplace import laplace_estep_from_arrays
from pgpfa.infer.laplace_longt import laplace_estep_banded

XDIM, YDIM, R, BIN = 2, 30, 16, 10.0
TAU = np.array([0.05, 0.08])
S = 50  # block: 500 ms >= 6 * 80 ms


def problem(T, seed=0):
    rng = np.random.default_rng(seed)
    from pgpfa.oracle.oracle_np import rbf_block

    C = rng.uniform(-0.4, 0.4, (YDIM, XDIM))
    d = rng.uniform(-1.0, -0.2, YDIM)
    # one Cholesky per latent, reused across trials (multivariate_normal
    # refactors the TxT kernel per draw — minutes at T=4000)
    import scipy.linalg as sla

    Ls = [sla.cholesky(rbf_block(TAU[k], T, BIN), lower=True) for k in range(XDIM)]
    X = np.stack([
        np.stack([Ls[k] @ rng.standard_normal(T) for k in range(XDIM)])
        for _ in range(R)
    ])
    Y = rng.poisson(np.exp(np.einsum("nk,rkt->rnt", C, X) + d[None, :, None])).astype(float)
    return jnp.asarray(C), jnp.asarray(d), jnp.asarray(TAU), jnp.asarray(Y)


def timed(fn, sync, reps=3):
    out = fn()
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        sync(out)
    return (time.time() - t0) / reps, out


def run_one(T, path, estep_only=False):
    """One (T, path) measurement in this process; prints one line."""
    from pgpfa.em.fit import FitConfig, _estep, _learn_tau_from_inf
    from pgpfa.learn.mstep_obs import learn_cd

    C, d, tau, Y = problem(T)
    cfg = FitConfig(time_block=S if path == "banded" else None)

    if estep_only:
        if path == "banded":
            t, out = timed(lambda: laplace_estep_banded(C, d, tau, Y, T, BIN, S),
                           lambda o: float(np.asarray(o[1])))
        else:
            t, out = timed(lambda: laplace_estep_from_arrays(C, d, tau, Y, T, BIN,
                                                             compute_cov=False),
                           lambda o: float(np.asarray(o[1])))
        m0 = float(jnp.asarray(out[0].post_mean[0, 0, :3]).sum())
        print(f"T={T:5d}  {path:6s}: {t * 1e3:8.1f} ms/E-step  "
              f"(mode[0,0,:3] sum {m0:+.6f})", flush=True)
        return

    @jax.jit
    def em_iter(C, d, tau, Y):
        inf, pll, _, _ = _estep(C, d, tau, Y, T, BIN, None, cfg)
        cd = learn_cd(Y, inf.post_mean, inf.post_vsm, C, d,
                      maxiter=cfg.cd_newton_iters, tol=cfg.cd_tol)
        tr = _learn_tau_from_inf(inf, tau, BIN, cfg)
        # scalar readbacks only (tunnel rule: CLAUDE.md item 8)
        return pll, jnp.sum(cd.C), tr.tau, jnp.sum(inf.post_mean[0, 0, :3])

    t, out = timed(lambda: em_iter(C, d, tau, Y),
                   lambda o: float(np.asarray(o[0])))
    print(f"T={T:5d}  {path:6s}: {t * 1e3:8.1f} ms/EM-iter  "
          f"(tau {np.asarray(out[2]).round(4)}, mode checksum {float(out[3]):+.6f})",
          flush=True)


def main():
    # Each (T, path) runs in a fresh process: the tunneled chip accumulates
    # allocator state across big back-to-back programs in one process and
    # RESOURCE_EXHAUSTEDs well under nominal HBM.
    import subprocess

    estep_flag = ["--estep"] if "--estep" in sys.argv else []
    unit = "E-step" if estep_flag else "full EM iteration"
    print(f"xdim={XDIM} ydim={YDIM} R={R} block={S} bins of {BIN} ms ({unit})",
          flush=True)
    for T in (250, 500, 1000, 2000, 4000, 8000):
        for path in ("banded", "dense"):
            if path == "dense" and T > 2000:
                continue  # (R, (xdim T)^2) f64 covariance exceeds HBM
            if T > 4000 and estep_flag:
                continue
            r = subprocess.run(
                [sys.executable, __file__, str(T), path] + estep_flag,
                capture_output=True, text=True, timeout=2400)
            line = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
            if r.returncode != 0:
                line = f"T={T:5d}  {path:6s}: FAILED ({r.stderr.strip().splitlines()[-1][:120]})"
            print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and not sys.argv[1].startswith("-"):
        run_one(int(sys.argv[1]), sys.argv[2], estep_only="--estep" in sys.argv)
    else:
        main()
