"""Marginal cost of one Newton body inside the f32 E-step (realistic inputs).

Times the vmapped ``_newton_solve`` at maxiter = 0..4 on the bench workload
from a realistic warm start; successive differences give the true in-program
cost of one body (assemble + chol + solve + line search) without the per-call
dispatch floor distorting per-op microbenchmarks.

Run: PGPFA_X64=0 python scripts/exp_newton_body.py [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from bench import build_problem
from pgpfa.em.fit import FitConfig
from pgpfa.infer.laplace import _newton_solve, laplace_estep_from_arrays
from pgpfa.models.params import Params, rbf_kernel
from pgpfa.ops.blockmat import blocks_inv


def timed(name, fn, reps):
    out = fn()
    float(np.asarray(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    float(np.asarray(out))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ds, init = build_problem()
    cfg = FitConfig()
    p = Params.from_dict(init)
    Y = jnp.asarray(ds.Y, dtype=p.C.dtype)
    R, ydim, T = Y.shape
    xdim = p.C.shape[1]
    print(f"device: {jax.devices()[0]}; dtype={p.C.dtype}")

    K = rbf_kernel(p.tau, T, float(ds.binSize), cfg.eps_noise)
    Kinv = blocks_inv(K)
    w = jnp.ones((ydim,), dtype=p.C.dtype)

    # realistic warm start: converged modes at the init params
    inf0, _ = laplace_estep_from_arrays(
        p.C, p.d, p.tau, Y, T, float(ds.binSize),
        gtol=cfg.newton_gtol, maxiter=cfg.newton_maxiter, compute_cov=False)
    warm = inf0.post_mean
    float(np.asarray(warm)[0, 0, 0])

    for mi in [0, 1, 2, 3, 4]:
        newton = jax.jit(jax.vmap(
            lambda y, x0: _newton_solve(y, x0, p.C, p.d, Kinv, w,
                                        cfg.newton_gtol, mi)))
        out = {}

        def fn(newton=newton):
            out["r"] = newton(Y, warm)
            return out["r"][1][0]

        timed(f"newton maxiter={mi} (warm)", fn, reps)

    # cold start for comparison
    zeros = jnp.zeros_like(warm)
    for mi in [0, 4]:
        newton = jax.jit(jax.vmap(
            lambda y, x0: _newton_solve(y, x0, p.C, p.d, Kinv, w,
                                        cfg.newton_gtol, mi)))
        timed(f"newton maxiter={mi} (cold)", lambda newton=newton: newton(Y, zeros)[1][0], reps)

    # covariance-from-factor path (what follows the loop)
    def cov_path():
        inf, pll = laplace_estep_from_arrays(
            p.C, p.d, p.tau, Y, T, float(ds.binSize), x_init=warm,
            gtol=cfg.newton_gtol, maxiter=0, compute_cov=False,
            eps_noise=cfg.eps_noise)
        return pll

    timed("E-step maxiter=0 (grad_hess + cov + views)", jax.jit(cov_path), reps)


if __name__ == "__main__":
    main()
