"""Feasibility measurements for the spectral (low-rank prior) f32 E-step.

The plan replaces the per-Newton-body dense (xdim*T)^2 factorization with a
Woodbury solve: Kinv = (1/eps) I - U W U^T (exact split of the RBF+jitter
prior's eigendecomposition, with W_ii = 1/eps - 1/sigma_i supported only on
modes whose eigenvalue is meaningfully above the jitter floor), so
H = M - Utilde Utilde^T with M time-block-diagonal. Unknowns to measure:

1. RBF eigenvalue decay at Stevenson-scale taus -> the static rank r needed.
2. Batched f32 eigh (xdim, T, T) cost on this TPU (once per E-step).
3. Batched tiny inverse (R*T, x, x) cost (the M^{-1} blocks, per body).
4. chol + cho_solve at the capacitance size (R, r_tot, r_tot).

Run: PGPFA_X64=0 python scripts/exp_spectral.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from pgpfa.models.params import rbf_kernel

R, XDIM, T, YDIM = 100, 5, 140, 90
BIN = 10.0
EPS = 0.001


def timed(name, fn, reps=10):
    out = fn()
    float(np.asarray(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    float(np.asarray(out))
    dt = (time.time() - t0) / reps
    print(f"{name:56s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    print(f"device: {jax.devices()[0]}")

    # 1. eigendecay: how many modes sit meaningfully above the jitter floor?
    for tau_s in [0.03, 0.05, 0.1, 0.2, 0.5]:
        K = rbf_kernel(jnp.asarray([tau_s], dtype=jnp.float64), T, BIN, EPS)[0]
        sig = np.linalg.eigvalsh(np.asarray(K))[::-1]
        w = 1.0 / EPS - 1.0 / sig  # Woodbury weights (0 at the jitter floor)
        wmax = w.max()
        for rel in [1e-4, 1e-6, 1e-8]:
            r = int(np.sum(w > rel * wmax))
            print(f"tau={tau_s:5.2f}s  w>{rel:.0e}*wmax -> r={r:3d}", end="  ")
        print()

    dt32 = jnp.float32
    key = jax.random.PRNGKey(0)

    # 2. batched eigh (xdim, T, T) f32
    taus = jnp.asarray([0.05, 0.1, 0.15, 0.2, 0.3], dtype=dt32)
    Kb = rbf_kernel(taus, T, BIN, EPS)
    eigh = jax.jit(lambda K: jnp.linalg.eigh(K))
    timed("batched eigh (xdim, T, T) f32", lambda: eigh(Kb)[0].sum())

    # 3. tiny batched inverses (R*T, x, x)
    A = jax.random.normal(key, (R * T, XDIM, XDIM), dtype=dt32)
    M = jnp.einsum("bij,bkj->bik", A, A) + 1000.0 * jnp.eye(XDIM, dtype=dt32)
    inv_t = jax.jit(jnp.linalg.inv)
    timed("batched inv (R*T, x, x) via linalg.inv", lambda: inv_t(M)[:, 0, 0].sum())
    chs = jax.jit(lambda M: jsl.cho_solve(
        (jnp.linalg.cholesky(M), True),
        jnp.broadcast_to(jnp.eye(XDIM, dtype=dt32), M.shape)))
    timed("batched inv (R*T, x, x) via chol+solve", lambda: chs(M)[:, 0, 0].sum())

    # 4. capacitance-size chol + solve
    for rtot in [240, 320, 448]:
        A = jax.random.normal(key, (R, rtot, rtot), dtype=dt32) * 0.01
        S = jnp.einsum("rij,rkj->rik", A, A) + jnp.eye(rtot, dtype=dt32)
        ch = jax.jit(jnp.linalg.cholesky)
        L = ch(S)
        L.block_until_ready()
        timed(f"chol (R, {rtot}, {rtot})", lambda S=S: ch(S)[:, 0, 0].sum())
        rhs = jax.random.normal(key, (R, rtot), dtype=dt32)
        sv = jax.jit(lambda L, b: jsl.cho_solve((L, True), b[..., None])[..., 0])
        timed(f"cho_solve 1 RHS (R, {rtot})", lambda L=L, rhs=rhs: sv(L, rhs).sum())
        rhsD = jax.random.normal(key, (R, rtot, XDIM * T), dtype=dt32)
        tri = jax.jit(lambda L, b: jax.lax.linalg.triangular_solve(
            L, b, left_side=True, lower=True))
        timed(f"trisolve (R, {rtot}) x D RHS", lambda L=L, rhsD=rhsD: tri(L, rhsD)[:, 0, 0].sum())

    # 5. the capacitance assembly einsum: (r x T) @ (T x r) batched over (R, k, l)
    r = 64
    U = jax.random.normal(key, (XDIM, T, r), dtype=dt32)
    Minv = jax.random.normal(key, (R, T, XDIM, XDIM), dtype=dt32)
    cap = jax.jit(lambda U, Minv: jnp.einsum(
        "kti,rtkl,tlj->rkilj", U, Minv, jnp.swapaxes(U, 0, 1).transpose(1, 0, 2),
        precision=jax.lax.Precision.HIGHEST))
    # simpler form: precompute weighted U per (r, t, l, j) then contract
    def cap2(U, Minv):
        # V[r, t, k, l, j] = Minv[r,t,k,l] * U[l,t,j]; S[r,k,i,l,j] = sum_t U[k,t,i] V
        V = Minv[..., None] * jnp.swapaxes(U, 0, 1)[None, :, None, :, :]
        return jnp.einsum("kti,rtklj->rkilj", U, V, precision=jax.lax.Precision.HIGHEST)
    capj = jax.jit(cap2)
    timed("capacitance einsum (R, xk*r, xl*r)", lambda: capj(U, Minv).sum())


if __name__ == "__main__":
    main()
