"""Batched Cholesky / triangular-solve latency vs block size on this TPU.

Decides between (a) keeping XLA's (R, D, D) factorization per Newton body,
(b) a Schur factorization over the xdim grid of T-blocks (5 sequential
steps of (R*, T, T) chol + batched trisolve), and (c) a Pallas kernel —
by measuring how the latency scales with D and batch. Higher rep count
than exp_f32_estep.py to average out the ~6 ms tunnel RTT.

Run: PGPFA_X64=0 python scripts/exp_chol_scaling.py [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def timed(name, fn, reps):
    out = fn()
    float(np.asarray(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    float(np.asarray(out))
    dt = (time.time() - t0) / reps
    print(f"{name:58s} {dt * 1e3:9.2f} ms")
    return dt


def spd(key, batch, D):
    A = jax.random.normal(key, (batch, D, D), dtype=jnp.float32) * 0.1
    return jnp.einsum("rij,rkj->rik", A, A) + 10.0 * jnp.eye(D, dtype=jnp.float32)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    chol = jax.jit(jnp.linalg.cholesky)
    for batch, D in [(100, 700), (100, 350), (100, 140), (400, 140), (500, 140),
                     (100, 128), (800, 128), (100, 64), (1, 700)]:
        H = spd(key, batch, D)
        L = chol(H)
        L.block_until_ready()
        timed(f"chol    batch={batch:4d} D={D}", lambda H=H: chol(H)[:, 0, 0].sum(), reps)
        rhs = jax.random.normal(key, (batch, D, 8), dtype=jnp.float32)
        tri = jax.jit(lambda L, b: jax.lax.linalg.triangular_solve(
            L, b, left_side=True, lower=True))
        timed(f"trisolve batch={batch:4d} D={D} nrhs=8",
              lambda L=L, rhs=rhs: tri(L, rhs)[:, 0, 0].sum(), reps)
        rhsN = jax.random.normal(key, (batch, D, D), dtype=jnp.float32)
        timed(f"trisolve batch={batch:4d} D={D} nrhs=D",
              lambda L=L, rhsN=rhsN: tri(L, rhsN)[:, 0, 0].sum(), reps)
    # dense matmul reference points
    for batch, D in [(100, 700), (100, 140)]:
        H = spd(key, batch, D)
        X = jax.random.normal(key, (batch, D, D), dtype=jnp.float32)
        mm = jax.jit(lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST))
        timed(f"matmul  batch={batch:4d} D={D} HIGHEST",
              lambda H=H, X=X: mm(H, X)[:, 0, 0].sum(), reps)
        mmd = jax.jit(jnp.matmul)
        timed(f"matmul  batch={batch:4d} D={D} default",
              lambda H=H, X=X: mmd(H, X)[:, 0, 0].sum(), reps)
    # empty-dispatch floor through the tunnel
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    timed("scalar add (dispatch+RTT floor)", lambda: f(x), reps)


if __name__ == "__main__":
    main()
