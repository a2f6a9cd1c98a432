"""Multi-host (multi-process) entry points.

The single-process path (``pgpfa.parallel.sharded``) already scales across
the chips one process can see; these helpers make the SAME compiled program
run unchanged on a real multi-host slice (e.g. a v5e pod slice with one
process per host), where each process holds only its local shard of the
trials.

Usage on a slice (one process per host, standard TPU env)::

    import pgpfa.parallel.distributed as dist

    dist.init_distributed()            # jax.distributed.initialize()
    res = dist.fit_multihost(init, Y_local, bin_ms, cfg)

``Y_local`` is each process's own trials ``(R_local, ydim, T)``; the global
fit sees ``R_local * num_processes`` trials. Everything else — the fused EM
scan, the GSPMD partitioning, the psum-reduced M-step statistics — is the
same program :func:`pgpfa.parallel.sharded.fit_sharded` runs on one host
(collective counts/volumes documented in SCALING.md).

Single-process fallback: with ``jax.process_count() == 1`` these helpers
reduce exactly to :func:`fit_sharded` (pinned by ``tests/test_parallel.py``),
so the code path is testable on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pgpfa.em.fit import FitConfig, FitResult, _fit_scan
from pgpfa.models.params import Params
from pgpfa.parallel.mesh import make_mesh, mesh_for_trials, replicated, trial_sharding


def init_distributed(**kw) -> bool:
    """Initialize ``jax.distributed`` when running under a multi-process
    launcher; no-op (returns False) in a single-process session.

    Coordinator/process-id/process-count are taken from the standard
    environment (TPU pod runtime or ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_PROCESS_ID`` / ``JAX_NUM_PROCESSES``); explicit kwargs are passed
    through to :func:`jax.distributed.initialize`.
    """
    launched = kw or os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    # a single-host TPU VM also sets TPU_WORKER_HOSTNAMES (e.g. 'localhost');
    # only a MULTI-host roster means a pod-slice launcher is driving us
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
             if h.strip()]
    in_pod = len(hosts) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not (launched or in_pod):
        return False
    jax.distributed.initialize(
        coordinator_address=kw.pop("coordinator_address", None)
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=kw.pop("num_processes", None)
        or _env_int("JAX_NUM_PROCESSES"),
        process_id=kw.pop("process_id", None) or _env_int("JAX_PROCESS_ID"),
        **kw,
    )
    return True


def _env_int(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def fit_multihost(
    init_params,
    Y_local,
    bin_size_ms: float,
    config: Optional[FitConfig] = None,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
) -> FitResult:
    """Run the fused EM fit with each process contributing its local trials.

    Builds a global mesh over ALL devices in the job, assembles the global
    trial-sharded array from the per-process shards
    (:func:`jax.make_array_from_process_local_data`), and runs the very same
    jitted EM program as :func:`pgpfa.parallel.sharded.fit_sharded`. With one
    process this is exactly ``fit_sharded``.
    """
    cfg = config or FitConfig()
    p = init_params if isinstance(init_params, Params) else Params.from_dict(init_params)
    Y_local = jnp.asarray(Y_local, dtype=p.C.dtype)
    T = Y_local.shape[-1]

    if jax.process_count() > 1:
        mesh = mesh or make_mesh()
        R_global = Y_local.shape[0] * jax.process_count()
        if R_global % len(mesh.devices.ravel()):
            raise ValueError(
                f"global trial count {R_global} (= {Y_local.shape[0]} local x "
                f"{jax.process_count()} processes) must be divisible by the "
                f"{mesh.devices.size}-device mesh; pad or drop trials per host"
            )
        Y_sh = jax.make_array_from_process_local_data(trial_sharding(mesh), Y_local)
    else:
        # single process: auto-size the mesh to the largest divisor of the
        # trial count (same default as fit_sharded)
        mesh = mesh or mesh_for_trials(Y_local.shape[0])
        Y_sh = jax.device_put(Y_local, trial_sharding(mesh))

    rep = replicated(mesh)
    C0 = jax.device_put(p.C, rep)
    d0 = jax.device_put(p.d, rep)
    tau0 = jax.device_put(p.tau, rep)
    key = jax.device_put(jax.random.PRNGKey(seed), rep)
    return _fit_scan(C0, d0, tau0, Y_sh, T, float(bin_size_ms), cfg, key)
