"""Pallas TPU kernels for the f32 stages of the mixed-precision stack.

Scope note: on this TPU generation Pallas/Mosaic supports f32 but NOT f64,
while pgpfa's parity-critical math is f64 (1e-6 log-lik target). The f64
work is dominated by XLA's software-emulated f64 matmuls, which a Pallas
kernel cannot beat without changing precision semantics. What Pallas CAN
own is the f32 refinement stage — many small chained matmuls whose cost on
this backend is kernel-launch + HBM round trips, not FLOPs.

Kernel: fused Newton-Schulz step ``X' = X + X (I - H X)``, the inner update
of :func:`pgpfa.ops.blockmat.inv_psd_mixed`. The XLA form is two dispatched
matmuls with an HBM-materialized intermediate; here each trial's ``H`` and
``X`` (e.g. 700^2 f32 = 1.96 MB each) are staged in VMEM and the whole
chain G = H X; X' = 2X - X G runs in one kernel over a batch grid.

Usage is gated behind ``PGPFA_PALLAS=1`` (default off). Measured on the
real TPU v5e at the benchmark shape (100, 700, 700): Pallas fused 35.8 ms vs
XLA two-matmul 30.7 ms, max abs diff 6e-8 — XLA's automatic pipelining
already wins at this shape, so the default path stays on XLA; the kernel is
kept as the validated template for the f32 fast-mode work (where everything
can live in one kernel) and is exercised by interpret-mode tests in CI.

Mosaic gotchas encountered (documented for future kernels here):
* f64 is unsupported ("Only F32 and C64" class errors).
* Kernels traced under global x64 fail legalization ('func.return'); trace
  ``pallas_call`` inside ``with jax.enable_x64(False)``.
* A (B, D, D) whole-matrix block layout OOMs scoped VMEM at D=700 (double
  buffering); tile the output columns and keep H/X resident instead.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ns_step_kernel(h_ref, x_ref, xcols_ref, out_ref):
    """Fused Newton-Schulz step for one (trial, column-tile) grid cell.

    ``h``/``x`` are the trial's full (D, D) matrices (VMEM-resident across the
    column tiles); ``xcols`` is the current (D, TJ) column tile of x. Computes
    ``out = 2 x_cols - x @ (h @ x_cols)`` — the column tile of ``X (2I - HX)``.
    """
    h = h_ref[0]
    x = x_ref[0]
    xc = xcols_ref[0]
    g = jnp.dot(h, xc, preferred_element_type=jnp.float32)
    out_ref[0] = 2.0 * xc - jnp.dot(x, g, preferred_element_type=jnp.float32)


def ns_step_fused(H32: jnp.ndarray, X32: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Fused ``X (2I - H X)`` over a batch of f32 SPD matrices.

    Args:
        H32, X32: ``(B, D, D)`` float32 (or ``(D, D)`` unbatched).
        interpret: run in the Pallas interpreter (CPU testing).

    Requires ``2 * D^2 * 4 bytes`` of VMEM per grid step (D <= ~1000).
    """
    squeeze = H32.ndim == 2
    if squeeze:
        H32, X32 = H32[None], X32[None]
    B, D, _ = H32.shape
    TJ = min(128, D)  # column tile: keeps VMEM at 2 resident (D,D) + streams
    J = pl.cdiv(D, TJ)

    # Mosaic cannot legalize kernels traced under global x64 (i64 grid/index
    # types -> 'failed to legalize func.return'); trace the call in an
    # x64-disabled scope — all operands are f32 anyway.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _ns_step_kernel,
            grid=(B, J),
            in_specs=[
                pl.BlockSpec((1, D, D), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, D), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, TJ), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, D, TJ), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D, D), jnp.float32),
            interpret=interpret,
        )(H32, X32, X32)
    return out[0] if squeeze else out


def _pallas_enabled() -> bool:
    return os.environ.get("PGPFA_PALLAS", "0") == "1"


def maybe_ns_step(H32: jnp.ndarray, X32: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas NS step when enabled, XLA two-matmul form otherwise."""
    if _pallas_enabled():
        return ns_step_fused(H32, X32)
    hi = jax.lax.Precision.HIGHEST
    eye = jnp.eye(H32.shape[-1], dtype=jnp.float32)
    return X32 + jnp.matmul(
        X32, eye - jnp.matmul(H32, X32, precision=hi), precision=hi
    )
