"""Cross-chip TIME-axis parallelism for the banded (long-T) path.

This closes the survey's "ring-attention-shaped" SP/CP slot (SURVEY.md §2.3)
WITH code rather than argument: the sequential Schur recursion of
``pgpfa.ops.blocktridiag.btd_factor`` has O(nb) depth and cannot cross chips,
but :func:`pgpfa.ops.blocktridiag.btd_solve_cr` — block CYCLIC REDUCTION —
has O(log nb) depth built from batched m×m matmuls/inverses, so the time-block
axis itself can be sharded over a mesh axis. Each reduction level is one
batched elimination over the surviving blocks; under GSPMD the strided
even/odd exchanges lower to nearest-neighbor collectives over ICI — the same
communication shape ring attention uses for its KV rotation.

Intended composition: a 2-D ``(trials, time)`` mesh — trials stay the
embarrassingly-parallel DP axis (``pgpfa/parallel/sharded.py``); within each
trial group the time blocks of a VERY long trial spread over the time axis.
The Newton mode-finding of the banded E-step is CR solves (this module); the
once-per-E-step posterior moments still use the sequential Takahashi recursion
(selected inversion has no comparably simple log-depth form — documented
limit, not hidden).

Reference context: the reference materializes dense ``(xdim*T)^2`` state per
trial (``funs/inference.py:81-82,130-131``) — no time scaling of any kind.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pgpfa.ops.blocktridiag import btd_solve_cr
from pgpfa.parallel.mesh import TRIAL_AXIS

TIME_AXIS = "time"


def make_mesh_2d(
    devices: Optional[Sequence] = None,
    n_trial: Optional[int] = None,
    trial_axis: str = TRIAL_AXIS,
    time_axis: str = TIME_AXIS,
) -> Mesh:
    """A 2-D ``(trials, time)`` mesh over the given (or all) devices.

    ``n_trial`` rows of the device grid go to the trial-DP axis; the rest to
    the time axis (default: square-ish split with trials taking the larger
    factor — the trial axis is exact DP and should absorb most chips).
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n_trial is None:
        n_trial = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                n_trial = max(f, n // f)
                break
    if n % n_trial != 0:
        raise ValueError(f"{n} devices not divisible by n_trial={n_trial}")
    grid = np.asarray(devices).reshape(n_trial, n // n_trial)
    return Mesh(grid, axis_names=(trial_axis, time_axis))


def btd_solve_cr_timesharded(D, B, rhs, mesh: Mesh, time_axis: str = TIME_AXIS):
    """CR solve with the block axis SHARDED over the mesh's time axis.

    Batched over an optional leading trial axis (sharded over the trial axis
    when present). Returns the solution with the same sharding as ``rhs``.
    GSPMD partitions each reduction level's batched elimination; exactness vs
    the single-device solve is pinned by ``tests/test_parallel.py``.
    """
    import jax.numpy as jnp

    batched = D.ndim == 4
    axes = (TRIAL_AXIS, time_axis) if batched else (time_axis,)
    spec = P(*axes)
    sh = NamedSharding(mesh, spec)
    # the subdiagonal has nb-1 blocks — pad to nb so the sharded axis divides
    # evenly; the trailing zero block is sliced off inside the program
    pad_shape = B.shape[:-3] + (1,) + B.shape[-2:]
    B_pad = jnp.concatenate([B, jnp.zeros(pad_shape, dtype=B.dtype)], axis=-3)

    core = lambda d, bp, r: btd_solve_cr(d, bp[:-1], r)
    fn = core if not batched else jax.vmap(core)
    jfn = jax.jit(fn, in_shardings=(sh, sh, sh), out_shardings=sh)
    with mesh:
        return jfn(
            jax.device_put(D, sh), jax.device_put(B_pad, sh), jax.device_put(rhs, sh)
        )
