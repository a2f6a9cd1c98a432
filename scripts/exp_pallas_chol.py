"""Measured probe: batch-outside-tile Pallas Cholesky vs XLA's batched kernel.

VERDICT r4 item 9: the f32 fast mode is latency-floor-bound on XLA's batched
small-linalg ops (PERF.md floor table: f32 (100, 700, 700) Cholesky ~17.6 ms
at <1% MXU efficiency). Round 4 rejected a batch-IN-LANES Pallas kernel (the
trailing update can't use the MXU) and assessed the batch-OUTSIDE-tile
variant unprofitable without building it. This script BUILDS and MEASURES
that variant so the floor verdict rests on a number, not an assessment.

Kernel design (one grid step = G matrices, the batch rides the grid):
  * each (D, D) matrix is padded to 768 (6 x 128 lanes) with an identity pad
    block and staged whole in VMEM (2.36 MB f32);
  * right-looking blocked factorization, 6 statically-unrolled 128-column
    panels; the panel factor+trisolve is ONE fori_loop of 128 column steps
    operating on the full (G, H, 128) panel tile — dynamic column/pivot
    access is done with broadcasted-iota masks (Mosaic has no cheap dynamic
    lane indexing), each step a masked rank-1 update (VPU);
  * the O(D^3) trailing update B @ B^T is a static-shape dot_general per
    panel (MXU) — this is the part the batch-in-lanes layout could not
    MXU-map, and here it can.

Run on CPU (interpret-mode correctness) then on the TPU for timing:
  python scripts/exp_pallas_chol.py --interpret   # CPU, validates vs XLA
  python scripts/exp_pallas_chol.py               # real TPU, timed

Result (2026-08-20, TPU v5 lite, f32 (100, 700, 700) SPD batch; PERF.md):
the measured kernel numbers are recorded in PERF.md "Pallas Cholesky probe".
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

PANEL = 128


def _chol_kernel(a_ref, out_ref, *, G: int, D: int):
    """Blocked right-looking Cholesky of G padded (D, D) SPD matrices."""
    import jax
    import jax.numpy as jnp

    # explicit f32: under global x64 (the pytest env) interpret-mode ref
    # reads come back as f64 and the fori_loop carry dtypes diverge
    A = a_ref[...].astype(jnp.float32)  # (G, D, D)
    n_panels = D // PANEL
    for k in range(n_panels):
        H = D - k * PANEL
        panel = A[:, k * PANEL:D, k * PANEL:(k + 1) * PANEL]  # (G, H, PANEL)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, PANEL), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (H, PANEL), 1)

        def col_step(j, P, rows=rows, lanes=lanes):
            colmask = lanes == j
            col = jnp.sum(jnp.where(colmask[None], P, 0.0), axis=2)  # (G, H)
            piv = jnp.sum(
                jnp.where((rows == j) & colmask, P, 0.0), axis=(1, 2))  # (G,)
            newcol = col * jax.lax.rsqrt(piv)[:, None]  # (G, H)
            # rank-1 trailing update within the panel: entries (r, c>j) get
            # -L[r,j]*L[c,j]; rows r<c land in the never-read upper triangle
            upd = newcol[:, :, None] * newcol[:, None, :PANEL]
            P = jnp.where(lanes[None] > j, P - upd, P)
            return jnp.where(colmask[None], newcol[:, :, None], P)

        panel = jax.lax.fori_loop(0, PANEL, col_step, panel)
        A = A.at[:, k * PANEL:D, k * PANEL:(k + 1) * PANEL].set(panel)
        if k + 1 < n_panels:
            B = panel[:, PANEL:, :]  # (G, H-PANEL, PANEL)
            upd = jax.lax.dot_general(
                B, B, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            A = A.at[:, (k + 1) * PANEL:, (k + 1) * PANEL:].add(-upd)
    out_ref[...] = A


def pallas_chol(A32, group: int = 1, interpret: bool = False):
    """Batched f32 Cholesky, batch on the Pallas grid (``group`` per step).

    Returns the raw factor with garbage above the diagonal (callers
    ``tril`` it); input is padded to a 128-multiple with an identity block.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A32 = A32.astype(jnp.float32)
    Bt, D0, _ = A32.shape
    D = -(-D0 // PANEL) * PANEL
    pad = D - D0
    if pad:
        A32 = jnp.pad(A32, ((0, 0), (0, pad), (0, pad)))
        eye_pad = jnp.pad(jnp.zeros((D0,), jnp.float32), (0, pad),
                          constant_values=1.0)
        A32 = A32 + jnp.diag(eye_pad)[None]
    assert Bt % group == 0

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_chol_kernel, G=group, D=D),
            grid=(Bt // group,),
            in_specs=[pl.BlockSpec((group, D, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((group, D, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bt, D, D), jnp.float32),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(A32)
    return out[:, :D0, :D0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--dim", type=int, default=700)
    ap.add_argument("--groups", type=int, nargs="*", default=[1, 2])
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    B, D = (4, 260) if args.interpret else (args.batch, args.dim)
    M = rng.normal(size=(B, D, D)).astype(np.float32) / np.sqrt(D)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.5 * np.eye(D, dtype=np.float32))

    ref = jax.jit(jnp.linalg.cholesky)
    L_ref = ref(A)
    float(jnp.sum(L_ref))  # sync

    for g in args.groups:
        try:
            f = jax.jit(functools.partial(pallas_chol, group=g,
                                          interpret=args.interpret))
            L = jnp.tril(f(A))
            err = float(jnp.max(jnp.abs(L - jnp.tril(L_ref))))
            scale = float(jnp.max(jnp.abs(L_ref)))
            print(f"group={g}: max abs diff vs XLA = {err:.3e} "
                  f"(rel {err / scale:.1e})")
            if args.interpret:
                continue
            for name, fn in [("pallas", lambda: jnp.sum(f(A))),
                             ("xla", lambda: jnp.sum(ref(A)))]:
                float(fn())  # warm
                t0 = time.time()
                reps = 5
                for _ in range(reps):
                    float(fn())  # scalar readback per rep (CLAUDE.md item 6)
                dt = (time.time() - t0) / reps * 1e3
                print(f"  group={g} {name}: {dt:.2f} ms/call")
        except Exception as e:  # noqa: BLE001 — record the failure mode
            print(f"group={g}: FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
