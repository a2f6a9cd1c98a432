"""Experiment: lowering variants for the f64 B-part (Kinv @ X) of the
structured refinement residual at Stevenson covariance shape.

Run: python scripts/exp_bpart.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pgpfa  # noqa: F401
import jax
import jax.numpy as jnp

hi = jax.lax.Precision.HIGHEST
R, xdim, T = 100, 5, 140
D = xdim * T


def timed(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(f(*args))
    t0 = time.time()
    for _ in range(reps):
        float(f(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:56s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    Kinv = jax.random.normal(key, (xdim, T, T), dtype=jnp.float64).block_until_ready()
    X = jax.random.normal(key, (R, D, D), dtype=jnp.float64).block_until_ready()

    X4 = lambda x: x.reshape(R, xdim, T, D)
    timed("B einsum ktu,rkum->rktm (shared Kinv)",
          lambda k, x: jnp.einsum("ktu,rkum->rktm", k, X4(x), precision=hi), Kinv, X)
    # bandwidth-bound broadcast-multiply-reduce over u
    timed("B mul-reduce over u",
          lambda k, x: jnp.sum(k[None, :, :, :, None] * X4(x)[:, :, None], axis=3),
          Kinv, X)
    # per-latent folded big matmul: (T, T) @ (T, R*D)
    def b_fold(k, x):
        Xk = jnp.transpose(X4(x), (1, 2, 0, 3)).reshape(xdim, T, R * D)
        return jnp.matmul(k, Xk, precision=hi)
    timed("B folded (xdim, T, T)@(T, R*D)", b_fold, Kinv, X)
    # dense blockdiag single matmul (700x700) @ (700, R*D)
    def b_dense(k, x):
        bd = jax.scipy.linalg.block_diag(*[k[i] for i in range(xdim)])
        Xf = jnp.transpose(x, (1, 0, 2)).reshape(D, R * D)
        return jnp.matmul(bd, Xf, precision=hi)
    timed("B dense blockdiag (700,700)@(700, R*D)", b_dense, Kinv, X)


if __name__ == "__main__":
    main()
