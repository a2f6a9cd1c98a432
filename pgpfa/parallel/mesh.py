"""Device mesh setup and sharding helpers.

The reference has no parallelism of any kind (single-process NumPy; SURVEY.md
§2.3). The TPU-native scale-out strategy is **trial data-parallelism**, which
is *exact* for P-GPFA EM: the E-step factorizes over trials, and every M-step
statistic is a sum over trials (``funs/learning.py:39-47,162-172``) reduced
with ``psum`` over ICI.

Why only a 1-D mesh: tensor/pipeline/expert parallelism do not apply to this
model family (no layer stack, no MoE; SURVEY.md §2.3) — the latent axis is
block-diagonal in the prior but densely coupled through the observation
Hessian, so latents cannot shard the E-step.

The time axis (the SP/CP slot) scales two ways: WITHIN a chip,
``FitConfig(time_block)`` switches the E-step to block-tridiagonal banded
algebra with O(T) time/memory (``pgpfa/ops/blocktridiag.py``), so a long
trial never materializes dense ``(xdim*T)^2`` state; ACROSS chips, the
block-cyclic-reduction solve (``btd_solve_cr``, O(log T) depth) shards the
time-block axis over a 2-D ``(trials, time)`` mesh
(``pgpfa/parallel/timeshard.py``; sharded == single-device pinned by
``tests/test_parallel.py``). At the reference's problem sizes the trial axis
is still the one that grows into multi-chip territory, so trial DP remains
the default; the time axis is there for the single-very-long-trial regime.
Composing both is exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TRIAL_AXIS = "trials"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = TRIAL_AXIS) -> Mesh:
    """Create a 1-D mesh over all (or the given) devices for trial DP."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def mesh_for_trials(
    n_trials: int,
    devices: Optional[Sequence] = None,
    axis_name: str = TRIAL_AXIS,
) -> Mesh:
    """A 1-D trial-DP mesh over the LARGEST device count that divides
    ``n_trials`` (GSPMD requires the sharded axis divisible by the mesh).

    With e.g. 7 trials on 8 devices this returns a 7-device mesh; a prime
    trial count falls back to however many devices divide it (worst case 1).
    Exactness is unaffected — only how many chips participate.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and n_trials % n:
        n -= 1
    return Mesh(np.asarray(devices[:n]), axis_names=(axis_name,))


def trial_sharding(mesh: Mesh, axis_name: str = TRIAL_AXIS) -> NamedSharding:
    """Shard the leading (trial) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
