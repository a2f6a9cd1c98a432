"""Trial-sharded (multi-chip) EM.

Two complementary mechanisms, both exact (trial DP is exact for P-GPFA EM —
SURVEY.md §2.3):

* :func:`fit_sharded` — the whole fused EM ``lax.scan`` runs under ``jit``
  with the trial axis of ``Y`` sharded over a :class:`jax.sharding.Mesh`
  (GSPMD partitioning). XLA partitions the vmapped per-trial Newton solves
  across chips and inserts ``all-reduce`` collectives for every trial-sum in
  the M-step objectives. Zero code duplication with the single-chip path —
  it calls the very same compiled program with sharded inputs.
* :func:`sharded_estep_stats` — an explicit ``shard_map`` E-step that returns
  ``psum``-reduced sufficient statistics (the "communication backend" form:
  per-shard Newton solves, one ICI all-reduce of ``PautoSum`` / trial
  objectives). Used by tests to pin down the collective semantics and as the
  building block for multi-host deployments.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pgpfa.em.fit import FitConfig, FitResult, _fit_scan
from pgpfa.infer.laplace import _newton_solve
from pgpfa.learn.mstep_gp import pauto_sum
from pgpfa.models.params import Params, rbf_kernel
from pgpfa.ops.blockmat import assemble_hessian, blocks_inv, cov_views, inv_psd_mixed
from pgpfa.models.poisson_gpfa import hessian_weights, linear_predictor
from pgpfa.parallel.mesh import TRIAL_AXIS, mesh_for_trials, replicated, trial_sharding


def fit_sharded(
    init_params,
    Y,
    bin_size_ms: float,
    config: Optional[FitConfig] = None,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
) -> FitResult:
    """Run the fused EM fit with trials sharded across the mesh.

    Numerically identical to :func:`pgpfa.em.fit.fit` (asserted in tests);
    only the device placement differs.
    """
    cfg = config or FitConfig()
    p = init_params if isinstance(init_params, Params) else Params.from_dict(init_params)
    Y = jnp.asarray(Y, dtype=p.C.dtype)
    T = Y.shape[-1]
    # default mesh: the largest device count dividing the trial count (GSPMD
    # needs the sharded axis divisible by the mesh; 7 trials on 8 devices
    # otherwise raises)
    mesh = mesh or mesh_for_trials(Y.shape[0])

    rep = replicated(mesh)
    Y_sh = jax.device_put(Y, trial_sharding(mesh))
    C0 = jax.device_put(p.C, rep)
    d0 = jax.device_put(p.d, rep)
    tau0 = jax.device_put(p.tau, rep)
    key = jax.device_put(jax.random.PRNGKey(seed), rep)
    return _fit_scan(C0, d0, tau0, Y_sh, T, float(bin_size_ms), cfg, key)


@partial(jax.jit, static_argnames=("T", "bin_size_ms", "mesh", "maxiter"))
def sharded_estep_stats(
    C,
    d,
    tau,
    Y,
    T: int,
    bin_size_ms: float,
    mesh: Mesh,
    gtol: float = 1e-8,
    maxiter: int = 100,
):
    """Explicit shard_map Laplace E-step returning psum-reduced statistics.

    Each device Newton-solves its trial shard, computes its local contribution
    to the M-step sufficient statistics, and one ``psum`` over the trial axis
    reduces them:

    * ``pauto`` ``(xdim, T, T)`` — for the tau M-step
      (sum over trials; reference ``funs/learning.py:162-172``),
    * ``obj_sum`` — summed per-trial objectives (the scalar nll reduction,
      reference ``funs/inference.py:128,175``),
    * ``n_trials`` — global trial count (for averaging).

    ``Y`` must be sharded (or shardable) along axis 0 with equal per-device
    extents.
    """
    xdim = C.shape[1]
    K = rbf_kernel(tau, T, bin_size_ms)
    Kinv = blocks_inv(K)
    w = jnp.ones((C.shape[0],), dtype=C.dtype)

    def local(y_shard):
        R_local = y_shard.shape[0]
        x0 = jnp.zeros((R_local, xdim, T), dtype=C.dtype)
        X, obj, _, _, _ = jax.vmap(
            lambda y, x: _newton_solve(y, x, C, d, Kinv, w, gtol, maxiter)
        )(y_shard, x0)

        def trial_cov_views(X_tr):
            A = linear_predictor(C, d, X_tr)
            H = assemble_hessian(hessian_weights(C, jnp.exp(A)), Kinv)
            return cov_views(inv_psd_mixed(H), xdim, T)

        vsm, vsm_gp = jax.vmap(trial_cov_views)(X)
        pauto_local = pauto_sum(X, vsm_gp)
        pauto = jax.lax.psum(pauto_local, TRIAL_AXIS)
        obj_sum = jax.lax.psum(jnp.sum(obj), TRIAL_AXIS)
        n = jax.lax.psum(jnp.asarray(R_local, dtype=C.dtype), TRIAL_AXIS)
        return X, vsm, vsm_gp, pauto, obj_sum, n

    # check_vma=False: the Newton while_loop starts from an unvarying zero
    # carry that becomes trial-varying in the body — functionally correct,
    # but rejected by the varying-manual-axes type check.
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(TRIAL_AXIS),),
        out_specs=(P(TRIAL_AXIS), P(TRIAL_AXIS), P(TRIAL_AXIS), P(), P(), P()),
        check_vma=False,
    )(Y)
