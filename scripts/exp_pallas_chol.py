"""Measure a batch-tiled Pallas Cholesky against XLA's batched cholesky (f32).

VERDICT r4 item 9: before accepting the f32 E-step's ~15 ms batched-Cholesky
floor (jnp.linalg.cholesky on (100, 700, 700) f32, <1%% MXU efficiency,
~0.02 ms per column — CLAUDE.md item 14) as final, measure whether the
per-column cost is ARITHMETIC (a real VPU floor every formulation shares) or
XLA per-column overhead (dynamic-slice updates / fusion boundaries) that a
Pallas kernel with fixed-shape masked column steps avoids.

The probe factors the design question down to its bottom level: an UNROLLED
128-step masked Cholesky of the (B, 128, 128) diagonal blocks, batch-tiled
into the grid, entirely VMEM-resident, with STATIC per-step masks (no
dynamic slicing — each step j is its own traced op set):

    l_j = where(row >= j, M[:, :, j] * rsqrt(M[:, j, j]), 0)
    M  -= l_j l_j^T        (batched broadcast-multiply-subtract, VPU)
    L   = where(col == j, l_j, L)

Every 700-wide blocked scheme (panel width 128) runs exactly 6 of these per
matrix plus MXU trailing GEMMs (~3 us of MXU work per matrix — negligible),
so the 128-block number bounds what ANY blocked Pallas Cholesky can achieve:

    projected_full_chol ~ 6 * t(diag128) + panel solves (same op class) + MXU

Compare against jnp.linalg.cholesky on the same (B, 128, 128) batch (XLA's
floor: ~3 ms + 0.02 ms/col => ~5.6 ms) and on the real (B, 700, 700) shape.

Usage: python scripts/exp_pallas_chol.py [B] [TB]
Prints one JSON line; run on the real TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128


def _chol128_kernel(a_ref, l_ref):
    """Unrolled 128-step masked Cholesky of (TB, 128, 128) SPD tiles."""
    m = a_ref[...]
    tb = m.shape[0]
    lout = jnp.zeros_like(m)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    for j in range(N):
        # pivot rsqrt per batch lane: (TB, 1, 1)
        piv = jax.lax.rsqrt(m[:, j : j + 1, j : j + 1])
        col = m[:, :, j : j + 1] * piv  # (TB, 128, 1); row j lands sqrt(piv)
        l = jnp.where(rows >= j, col, 0.0)
        m = m - l * jnp.swapaxes(l, 1, 2)
        lout = lout.at[:, :, j : j + 1].set(l)
    l_ref[...] = lout


def chol128_pallas(A32, tb):
    B = A32.shape[0]
    with jax.enable_x64(False):
        return pl.pallas_call(
            _chol128_kernel,
            grid=(B // tb,),
            in_specs=[pl.BlockSpec((tb, N, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tb, N, N), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        )(A32)


def _time(fn, *args, reps=5):
    r = fn(*args)
    float(jnp.sum(r))  # scalar readback sync (CLAUDE.md item 6)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        float(jnp.sum(r))
    return (time.time() - t0) / reps * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    TB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)

    S = rng.standard_normal((B, N, N)).astype(np.float32)
    A = jnp.asarray(S @ np.swapaxes(S, 1, 2) + N * np.eye(N, dtype=np.float32))

    f_pal = jax.jit(lambda a: chol128_pallas(a, TB))
    f_xla = jax.jit(jnp.linalg.cholesky)

    Lp = f_pal(A)
    Lx = f_xla(A)
    err = float(jnp.max(jnp.abs(Lp - Lx)))

    t_pal = _time(f_pal, A)
    t_xla = _time(f_xla, A)

    # the real bottleneck shape for reference
    D = 700
    S7 = rng.standard_normal((B, D, 64)).astype(np.float32)
    A7 = jnp.asarray(S7 @ np.swapaxes(S7, 1, 2) + D * np.eye(D, dtype=np.float32))
    t_xla700 = _time(jax.jit(jnp.linalg.cholesky), A7, reps=3)

    out = {
        "B": B, "tile_batch": TB,
        "pallas_chol128_ms": round(t_pal, 3),
        "xla_chol128_ms": round(t_xla, 3),
        "speedup_128": round(t_xla / t_pal, 2),
        "max_abs_err_vs_xla": err,
        "xla_chol700_ms": round(t_xla700, 3),
        # 700 = 6 panels of 128; panel solves are the same masked-column op
        # class over (rest, 128) (~2x the per-step elements on average);
        # trailing updates are MXU GEMMs (~3 us/matrix). A conservative
        # whole-kernel projection is therefore ~3x the 6-diag-block time.
        "projected_pallas_chol700_ms": round(3 * 6 * t_pal, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
