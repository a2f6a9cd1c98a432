"""Microbenchmarks of the linear-algebra primitives at the headline workload
shape (batched (100, 700, 700)), to attribute the phase-profile costs.

Each jitted op ends in an on-device reduction to a scalar, so (a) the readback
is O(1) bytes through the tunnel and (b) XLA cannot dead-code-eliminate the op.
Run: python scripts/microbench_linalg.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pgpfa  # noqa: F401  (x64 + platform config)
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

R, D = 100, 700
hi = jax.lax.Precision.HIGHEST


def timed(name, fn, reps=5):
    f = jax.jit(lambda: jnp.sum(fn()))
    float(f())  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        float(f())
    dt = (time.time() - t0) / reps
    print(f"{name:56s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}; batch={R}, D={D}", flush=True)
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (R, D, D), dtype=jnp.float32) * 0.01
    H32 = (jnp.matmul(A, jnp.swapaxes(A, 1, 2)) + jnp.eye(D, dtype=jnp.float32)).block_until_ready()
    L32 = jnp.linalg.cholesky(H32).block_until_ready()
    eye32 = jnp.eye(D, dtype=jnp.float32)
    b32 = jax.random.normal(key, (R, D), dtype=jnp.float32).block_until_ready()
    H64 = H32.astype(jnp.float64).block_until_ready()
    X64 = L32.astype(jnp.float64).block_until_ready()

    timed("empty (dispatch+readback floor)", lambda: jnp.zeros(()))
    timed("batched f32 cholesky (100,700,700)", lambda: jnp.linalg.cholesky(H32))
    timed("batched f32 cho_solve, 700 RHS", lambda: jsl.cho_solve((L32, True), jnp.broadcast_to(eye32, (R, D, D))))
    timed("batched f32 cho_solve, 1 RHS", lambda: jsl.cho_solve((L32, True), b32))
    timed("batched f32 matmul 700^3 (default prec)", lambda: jnp.matmul(H32, H32))
    timed("batched f32 matmul 700^3 (HIGHEST)", lambda: jnp.matmul(H32, H32, precision=hi))
    timed("batched f64 matmul 700^3", lambda: jnp.matmul(H64, H64, precision=hi))
    timed("batched f64->f32 cast (100,700,700)", lambda: H64.astype(jnp.float32))
    timed("batched f32 symmetrize 0.5(X+X^T)", lambda: 0.5 * (H32 + jnp.swapaxes(H32, 1, 2)))
    timed("batched f64 exp (100,90,140)", lambda: jnp.exp(-jnp.abs(X64[:, :90, :140])))
    timed("batched f32 exp (100,90,140)", lambda: jnp.exp(-jnp.abs(H32[:, :90, :140])))
    timed("batched f64 add (100,700,700)", lambda: H64 + X64)

    # structured_mm f64 residual at workload shape
    from pgpfa.ops.blockmat import structured_mm
    xdim, T = 5, 140
    W = (jax.random.normal(key, (R, T, xdim, xdim), dtype=jnp.float64) * 0.01).block_until_ready()
    B = jnp.broadcast_to(jnp.eye(T, dtype=jnp.float64), (R, xdim, T, T)).block_until_ready()
    timed("batched f64 structured_mm (700-col operand)",
          lambda: jax.vmap(structured_mm)(W, B, H64))

    # Hessian assembly at workload shape (f32)
    from pgpfa.ops.blockmat import assemble_hessian
    W32 = W.astype(jnp.float32).block_until_ready()
    B32 = B.astype(jnp.float32).block_until_ready()
    timed("batched f32 assemble_hessian", lambda: jax.vmap(assemble_hessian)(W32, B32))

    # cov_views extraction (f64)
    from pgpfa.ops.blockmat import cov_views
    timed("batched f64 cov_views", lambda: jax.vmap(lambda c: jnp.sum(cov_views(c, xdim, T)[1]))(H64))


if __name__ == "__main__":
    main()
