"""Experiment: lowering + exactness of the rate-weighted curvature statistics
on TPU at Stevenson shape (ydim=90, s=14000, xdim=5).

For each candidate form of W (hessian_weights), VC, T2, T4: wall time and max
abs deviation from an exact f64 elementwise multiply-reduce reference.

Run: python scripts/exp_cdstats.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pgpfa  # noqa: F401
import jax
import jax.numpy as jnp

hi = jax.lax.Precision.HIGHEST
ydim, s, xdim, T = 90, 14000, 5, 140


def timed(name, fn, *args, ref=None, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
        float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / reps
    err = ""
    if ref is not None:
        err = f"  maxabsdiff vs ref: {float(jnp.max(jnp.abs(out - ref))):.3e}"
    print(f"{name:44s} {dt * 1e3:9.2f} ms{err}", flush=True)
    return out


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rate = jnp.exp(jax.random.normal(k1, (ydim, s), dtype=jnp.float64))
    C = jax.random.normal(k2, (ydim, xdim), dtype=jnp.float64) * 0.3
    M2 = jax.random.normal(k3, (s, xdim), dtype=jnp.float64)
    A = jax.random.normal(k4, (s, xdim, xdim), dtype=jnp.float64) * 0.3
    V3 = A @ jnp.swapaxes(A, 1, 2) + 0.1 * jnp.eye(xdim, dtype=jnp.float64)
    expA = rate[:, : T]  # (ydim, T) stand-in for the E-step W

    # ---- hessian_weights W (T, x, x) ----
    # exact elementwise reference
    W_ref = timed("W ref: elementwise mul-reduce",
                  lambda e, c: jnp.sum(e[:, :, None, None]
                                       * (c[:, None, :, None] * c[:, None, None, :]),
                                       axis=0), expA, C)
    timed("W old: einsum nt,nk,nl->tkl",
          lambda e, c: jnp.einsum("nt,nk,nl->tkl", e, c, c), expA, C, ref=W_ref)
    timed("W new: (expA.T @ CC).reshape",
          lambda e, c: (e.T @ (c[:, :, None] * c[:, None, :]).reshape(ydim, -1)
                        ).reshape(T, xdim, xdim), expA, C, ref=W_ref)

    # ---- VC (ydim, s, x) ----
    VC_ref = timed("VC ref: elementwise mul-reduce",
                   lambda v, c: jnp.sum(v[None] * c[:, None, None, :], axis=3),
                   V3, C)
    timed("VC einsum skl,nl->nsk",
          lambda v, c: jnp.einsum("skl,nl->nsk", v, c), V3, C, ref=VC_ref)
    timed("VC matmul (s*x, x)@(x, n) + transpose",
          lambda v, c: jnp.transpose(
              (v.reshape(s * xdim, xdim) @ c.T).reshape(s, xdim, ydim),
              (2, 0, 1)), V3, C, ref=VC_ref)

    VC = VC_ref
    rVC = rate[:, :, None] * VC

    # ---- T4 (ydim, x, x) ----
    T4_ref = timed("T4 ref: elementwise mul-reduce",
                   lambda a, b: jnp.sum(a[:, :, :, None] * b[:, :, None, :], axis=1),
                   VC, rVC)
    timed("T4 einsum nsk,nsl->nkl",
          lambda a, b: jnp.einsum("nsk,nsl->nkl", a, b), VC, rVC, ref=T4_ref)
    timed("T4 batched matmul swapaxes",
          lambda a, b: jnp.matmul(jnp.swapaxes(a, 1, 2), b, precision=hi),
          VC, rVC, ref=T4_ref)

    # ---- T2 (ydim, x, x) ----
    T2_ref = timed("T2 ref: elementwise mul-reduce",
                   lambda m, b: jnp.sum(m[None, :, :, None] * b[:, :, None, :], axis=1),
                   M2, rVC)
    timed("T2 einsum sk,nsl->nkl",
          lambda m, b: jnp.einsum("sk,nsl->nkl", m, b), M2, rVC, ref=T2_ref)
    timed("T2 batched matmul m.T @ rVC",
          lambda m, b: jnp.matmul(jnp.broadcast_to(m.T, (ydim, xdim, s)), b,
                                  precision=hi), M2, rVC, ref=T2_ref)

    # ---- old MV/VV matmul forms for comparison ----
    Vf = V3.reshape(s, xdim * xdim)
    MV = (M2[:, :, None] * Vf[:, None, :]).reshape(s, xdim**3)
    VV = (Vf[:, :, None] * Vf[:, None, :]).reshape(s, xdim**4)
    timed("old S_mv: rate @ MV (125 cols)", lambda r, m: r @ m, rate, MV)
    timed("old S_vv: rate @ VV (625 cols)", lambda r, m: r @ m, rate, VV)


if __name__ == "__main__":
    main()
