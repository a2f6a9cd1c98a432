"""Per-phase wall-clock breakdown of the headline benchmark workload.

Times, on the default device (real TPU when available), each piece of one
steady-state EM iteration of the Stevenson-shaped fit:

  * E-step total (jitted phase program used by fit_loop)
  * Newton mode-finding alone (compute_cov path split)
  * posterior covariance + views alone
  * (C, d) M-step
  * tau M-step

Every timing forces a scalar readback (tunnel-safe sync; see CLAUDE.md rule 6).
Run: python scripts/profile_phases.py [n_reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from bench import build_problem
from pgpfa.em.fit import FitConfig, _phase_programs
from pgpfa.infer.laplace import _newton_solve, laplace_estep_from_arrays
from pgpfa.learn.mstep_gp import learn_tau
from pgpfa.learn.mstep_obs import learn_cd
from pgpfa.models.params import Params, rbf_kernel
from pgpfa.ops.blockmat import blocks_inv


def timed(name, fn, readback, reps):
    fn()  # compile
    readback()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        readback(out)
    dt = (time.time() - t0) / reps
    print(f"{name:58s} {dt * 1e3:9.1f} ms")
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ds, init = build_problem()
    cfg = FitConfig()
    p = Params.from_dict(init)
    Y = jnp.asarray(ds.Y, dtype=p.C.dtype)
    R, ydim, T = Y.shape
    xdim = p.C.shape[1]
    print(f"device: {jax.devices()[0]}; workload: R={R} ydim={ydim} T={T} xdim={xdim}")

    estep, mstep_batch, _ = _phase_programs(T, float(ds.binSize), cfg)

    # one real EM iteration's inputs: warm modes from a cold E-step
    inf0, _, _, warm = estep(p.C, p.d, p.tau, Y, None)
    np.asarray(warm)[0, 0, 0]
    cd0, tr0 = mstep_batch(p.C, p.d, p.tau, Y, inf0)
    C1, d1, tau1 = cd0.C, cd0.d, tr0.tau
    float(np.asarray(tau1)[0])

    # --- E-step total (warm, steady state) ---
    out = {}

    def e_total():
        out["e"] = estep(C1, d1, tau1, Y, warm)
        return out["e"]

    timed("E-step total (jitted phase program, warm)", e_total,
          lambda *a: float(np.asarray(out["e"][1])), reps)
    inf1 = out["e"][0]

    # --- Newton only ---
    K = rbf_kernel(tau1, T, float(ds.binSize), cfg.eps_noise)
    Kinv = blocks_inv(K)
    w = jnp.ones((ydim,), dtype=C1.dtype)
    newton = jax.jit(jax.vmap(
        lambda y, x0: _newton_solve(y, x0, C1, d1, Kinv, w,
                                    cfg.newton_gtol, cfg.newton_maxiter)))
    res = {}

    def n_only():
        res["n"] = newton(Y, warm)
        return res["n"]

    timed("  Newton mode-finding only (warm start)", n_only,
          lambda *a: float(np.asarray(res["n"][1][0])), reps)
    iters = np.asarray(res["n"][2])
    print(f"    newton iters (warm): min={iters.min()} max={iters.max()} "
          f"mean={iters.mean():.1f}")

    def n_cold():
        res["nc"] = newton(Y, jnp.zeros_like(warm))
        return res["nc"]

    timed("  Newton mode-finding only (cold start)", n_cold,
          lambda *a: float(np.asarray(res["nc"][1][0])), reps)
    iters = np.asarray(res["nc"][2])
    print(f"    newton iters (cold): min={iters.min()} max={iters.max()} "
          f"mean={iters.mean():.1f}")

    # --- full E-step minus Newton = covariance + views (derived) ---
    cov_est = jax.jit(lambda C, d, tau, Yb, xw: laplace_estep_from_arrays(
        C, d, tau, Yb, T, float(ds.binSize), x_init=xw,
        gtol=cfg.newton_gtol, maxiter=0, compute_cov=False,
        eps_noise=cfg.eps_noise))
    X1 = res["n"][0]

    def cov_only():
        res["c"] = cov_est(C1, d1, tau1, Y, X1)
        return res["c"]

    timed("  posterior covariance + views (maxiter=0 E-step)", cov_only,
          lambda *a: float(np.asarray(res["c"][1])), reps)

    # --- prior build: rbf kernel + blocks_inv ---
    kinv_fn = jax.jit(lambda tau: blocks_inv(
        rbf_kernel(tau, T, float(ds.binSize), cfg.eps_noise)))

    def prior_only():
        res["k"] = kinv_fn(tau1)
        return res["k"]

    timed("  prior Kinv build (rbf + blocks_inv)", prior_only,
          lambda *a: float(res["k"][0, 0, 0]), reps)

    # --- M-steps ---
    cd_fn = jax.jit(lambda C, d, Yb, mean, vsm: learn_cd(
        Yb, mean, vsm, C, d, maxiter=cfg.cd_newton_iters, tol=cfg.cd_tol))

    def cd_only():
        res["cd"] = cd_fn(C1, d1, Y, inf1.post_mean, inf1.post_vsm)
        return res["cd"]

    timed("M-step (C, d) per-neuron Newton", cd_only,
          lambda *a: float(np.asarray(res["cd"].cost)), reps)

    tau_fn = jax.jit(lambda tau, mean, vsm_gp: learn_tau(
        mean, vsm_gp, tau, float(ds.binSize), eps=cfg.eps_noise,
        maxiter=cfg.tau_maxiter))

    def tau_only():
        res["tau"] = tau_fn(tau1, inf1.post_mean, inf1.post_vsm_gp)
        return res["tau"]

    timed("M-step tau Newton", tau_only,
          lambda *a: float(np.asarray(res["tau"].cost)[0]), reps)


if __name__ == "__main__":
    main()
