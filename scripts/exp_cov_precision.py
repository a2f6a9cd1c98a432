"""Experiment: precision schedule of the posterior-covariance refinement.

At Stevenson scale, times inv_psd_structured variants (reusing the Newton
factor) and measures view accuracy vs a doubly-f64-refined truth, to decide
whether the f64 refinement step (the E-step's dominant cost candidate) can be
replaced by pure-f32 Newton-Schulz steps.

Run: python scripts/exp_cov_precision.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from bench import build_problem
from pgpfa.em.fit import FitConfig
from pgpfa.infer.laplace import _newton_solve
from pgpfa.models.params import Params, rbf_kernel
from pgpfa.ops.blockmat import blocks_inv, cov_views, inv_psd_structured

cfg = FitConfig()


def main():
    ds, init = build_problem()
    p = Params.from_dict(init)
    Y = jnp.asarray(ds.Y, dtype=p.C.dtype)
    R, ydim, T = Y.shape
    xdim = p.C.shape[1]
    print(f"device: {jax.devices()[0]}", flush=True)

    K = rbf_kernel(p.tau, T, float(ds.binSize), cfg.eps_noise)
    Kinv = blocks_inv(K)
    w = jnp.ones((ydim,), dtype=p.C.dtype)
    newton = jax.jit(jax.vmap(
        lambda y, x0: _newton_solve(y, x0, p.C, p.d, Kinv, w,
                                    cfg.newton_gtol, cfg.newton_maxiter)))
    X, obj, iters, W, L32 = newton(Y, jnp.zeros((R, xdim, T), dtype=p.C.dtype))
    float(np.asarray(obj[0]))
    print("newton done", flush=True)

    def cov_fn(ns, f64):
        def f(W_tr, L_tr):
            c = inv_psd_structured(W_tr, Kinv, ns_steps=ns, f64_steps=f64, L32=L_tr)
            return cov_views(c, xdim, T)
        return jax.jit(jax.vmap(f))

    # truth: two f64 refinement steps
    vsm_t, gp_t = cov_fn(2, 2)(W, L32)
    float(vsm_t[0, 0, 0, 0])
    print("truth done", flush=True)

    variants = [("ns1_f64x1 (current)", 1, 1), ("ns2_f32only", 2, 0),
                ("ns3_f32only", 3, 0), ("ns0 (cho_solve only)", 0, 0)]
    for name, ns, f64 in variants:
        f = cov_fn(ns, f64)
        vsm, gp = f(W, L32)
        float(vsm[0, 0, 0, 0])  # compile+sync
        t0 = time.time()
        for _ in range(3):
            vsm, gp = f(W, L32)
            float(vsm[0, 0, 0, 0])
        dt = (time.time() - t0) / 3
        dv = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))
        e_vsm = float(dv(vsm, vsm_t))
        e_gp = float(dv(gp, gp_t))
        # scale for relative error context
        s_gp = float(jnp.max(jnp.abs(gp_t)))
        print(f"{name:24s} {dt * 1e3:8.1f} ms  err vsm={e_vsm:.2e} "
              f"vsmGP={e_gp:.2e} (|vsmGP|max={s_gp:.2e})", flush=True)


if __name__ == "__main__":
    main()
