"""On-chip cost breakdown of the f32 E-step's candidate hot ops.

The f32 fast mode's fused EM iteration is ~137 ms, of which the Newton
mode-finding is ~135 ms at only ~2.4 warm iterations (scripts/
profile_phases.py) — so the cost sits inside the per-iteration body:
batched (R, D, D) Cholesky, cho_solve, Hessian assembly, structured_mm,
or the posterior-covariance inverse. This script times each in isolation
at Stevenson shape (R=100, xdim=5, T=140, D=700) in f32 on the default
device. Every timing forces a scalar readback (CLAUDE.md rule 6).

Run: PGPFA_X64=0 python scripts/exp_f32_estep.py [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from pgpfa.ops.blockmat import (
    assemble_hessian,
    inv_psd_structured,
    solve_psd_structured,
    structured_mm,
)

R, XDIM, T, YDIM = 100, 5, 140, 90
D = XDIM * T


def timed(name, fn, reps):
    out = fn()
    float(np.asarray(out))  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    s = float(np.asarray(out))
    dt = (time.time() - t0) / reps
    print(f"{name:56s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(f"device: {jax.devices()[0]}; R={R} xdim={XDIM} T={T} D={D}")
    key = jax.random.PRNGKey(0)
    dt32 = jnp.float32

    # SPD batch shaped like the Laplace Hessian: Kinv-ish blocks + diagonal
    k1, k2, k3 = jax.random.split(key, 3)
    A = jax.random.normal(k1, (R, D, D), dtype=dt32) * 0.1
    H = jnp.einsum("rij,rkj->rik", A, A) + 10.0 * jnp.eye(D, dtype=dt32)
    W = jax.random.normal(k2, (T, XDIM, XDIM), dtype=dt32)
    W = jnp.einsum("tkl,tml->tkm", W, W) + jnp.eye(XDIM, dtype=dt32)
    B = jax.random.normal(k3, (XDIM, T, T), dtype=dt32) * 0.1
    B = jnp.einsum("ktu,kvu->ktv", B, B) + jnp.eye(T, dtype=dt32)
    rhs = jax.random.normal(key, (R, D), dtype=dt32)
    Wb = jnp.broadcast_to(W, (R, T, XDIM, XDIM))
    Bb = jnp.broadcast_to(B, (R, XDIM, T, T))

    chol = jax.jit(jnp.linalg.cholesky)
    L = chol(H)
    L.block_until_ready()

    timed("batched cholesky (R, D, D) f32", lambda: chol(H)[:, 0, 0].sum(), reps)

    solve1 = jax.jit(lambda L, b: jsl.cho_solve((L, True), b[..., None])[..., 0])
    timed("batched cho_solve 1 RHS", lambda: solve1(L, rhs).sum(), reps)

    solveN = jax.jit(
        lambda L: jsl.cho_solve((L, True), jnp.broadcast_to(jnp.eye(D, dtype=dt32), (R, D, D)))
    )
    timed("batched cho_solve D RHS (full inverse)", lambda: solveN(L)[:, 0, 0].sum(), reps)

    asm = jax.jit(lambda W, B: jax.vmap(assemble_hessian)(W, B))
    timed("batched assemble_hessian", lambda: asm(Wb, Bb)[:, 0, 0].sum(), reps)

    mm1 = jax.jit(lambda W, B, x: jax.vmap(structured_mm)(W, B, x))
    timed("batched structured_mm 1 RHS", lambda: mm1(Wb, Bb, rhs).sum(), reps)

    Xd = jax.random.normal(key, (R, D, D), dtype=dt32)
    timed("batched structured_mm D RHS", lambda: mm1(Wb, Bb, Xd)[:, 0, 0].sum(), reps)

    mmf = jax.jit(lambda H, X: jnp.matmul(H, X, precision=jax.lax.Precision.HIGHEST))
    timed("batched dense matmul DxD HIGHEST", lambda: mmf(H, Xd)[:, 0, 0].sum(), reps)
    mmd = jax.jit(lambda H, X: jnp.matmul(H, X))
    timed("batched dense matmul DxD default", lambda: mmd(H, Xd)[:, 0, 0].sum(), reps)

    sps = jax.jit(
        lambda W, B, r, L: jax.vmap(
            lambda w, b, rr, ll: solve_psd_structured(w, b, rr, ll, ir_steps=1)
        )(W, B, r, L)
    )
    timed("solve_psd_structured ir=1 (Newton dX)", lambda: sps(Wb, Bb, rhs, L).sum(), reps)

    ips = jax.jit(
        lambda W, B, L: jax.vmap(
            lambda w, b, ll: inv_psd_structured(w, b, ns_steps=1, f64_steps=1, L32=ll)
        )(W, B, L)
    )
    timed("inv_psd_structured ns=1 f64=1 (post cov)", lambda: ips(Wb, Bb, L)[:, 0, 0].sum(), reps)

    expf = jax.jit(lambda x: jnp.exp(x))
    Aexp = jax.random.normal(key, (R, YDIM, T), dtype=dt32)
    timed("batched exp (R, ydim, T)", lambda: expf(Aexp).sum(), reps)


if __name__ == "__main__":
    main()
