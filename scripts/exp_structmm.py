"""Experiment: where does the f64 refinement step's time go, and can the
structured_mm lowering be improved?

Times, at Stevenson covariance shape ((100, 700, 700) operand, xdim=5, T=140):
  * current structured_mm (B einsum + W einsum)
  * B part alone (batched (140,140)@(140,700) per latent)
  * W part alone, current einsum ("tkl,ltm->ktm" — 140 tiny 5x5 matmuls)
  * W part, broadcast-multiply-reduce formulation
  * dense f64 matmul (100,700,700) for the rate reference

NOTE: jitted callables must take the big arrays as ARGUMENTS — closing over
device arrays embeds them as HLO constants, which the axon tunnel ships in the
compile RPC (minutes of upload, HTTP 413 past ~100 MB).

Run: python scripts/exp_structmm.py
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
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    W = (jax.random.normal(key, (R, T, xdim, xdim), dtype=jnp.float64)).block_until_ready()
    B = (jax.random.normal(key, (R, xdim, T, T), dtype=jnp.float64)).block_until_ready()
    X = (jax.random.normal(key, (R, D, D), dtype=jnp.float64)).block_until_ready()
    X32 = X.astype(jnp.float32).block_until_ready()

    from pgpfa.ops.blockmat import structured_mm
    timed("structured_mm current (B einsum + W einsum)",
          lambda w, b, x: jax.vmap(structured_mm)(w, b, x), W, B, X)
    timed("B part: einsum ktu,kum->ktm",
          lambda b, x: jnp.einsum("rktu,rkum->rktm", b, x.reshape(R, xdim, T, D),
                                  precision=hi), B, X)
    timed("W part: einsum tkl,ltm->ktm (current)",
          lambda w, x: jnp.einsum("rtkl,rltm->rktm", w, x.reshape(R, xdim, T, D),
                                  precision=hi), W, X)
    # out[r,k,t,m] = sum_l W[r,t,k,l] * X4[r,l,t,m]; X4 = (r, l, t, m)
    timed("W part: broadcast-mul-reduce over l",
          lambda w, x: jnp.sum(
              jnp.transpose(w, (0, 2, 3, 1))[..., None]
              * x.reshape(R, xdim, T, D)[:, None],
              axis=2), W, X)
    # B part with the trial axis folded INTO the matmul: per latent,
    # (140,140) @ (140, R*D) — one big f64 matmul instead of 500 small ones
    def b_big(b, x):
        Xk = jnp.transpose(x.reshape(R, xdim, T, D), (1, 2, 0, 3)).reshape(xdim, T, R * D)
        out = jnp.matmul(b[0], Xk, precision=hi)  # Kinv shared across trials
        return jnp.transpose(out.reshape(xdim, T, R, D), (2, 0, 1, 3))
    timed("B part: shared-Kinv big matmul (5x 140@140x70000)", b_big, B, X)
    timed("dense f64 matmul (100,700,700)",
          lambda a: jnp.matmul(a, a, precision=hi), X)
    timed("dense f32 matmul HIGHEST (100,700,700)",
          lambda a: jnp.matmul(a, a, precision=hi), X32)
    timed("f64 exp (100,90,140)",
          lambda a: jnp.exp(-jnp.abs(a[:, :90, :140])), X)
    from pgpfa.ops.blockmat import cov_views
    timed("cov_views f64 (100,700,700)",
          lambda a: jax.vmap(lambda c: sum(map(jnp.sum, cov_views(c, xdim, T))))(a), X)


if __name__ == "__main__":
    main()
