"""Leave-one-neuron-out prediction.

Reference (``funs/util.py:289-335``, duplicated at ``funs/engine.py:599-644``):
for every (trial, neuron) pair, refit the latent posterior mode with that
neuron's rows deleted from C/d/Y, then predict the held-out neuron's rate
``exp(C_n x_hat + d_n)`` and accumulate squared error.

TPU-native redesign: deleting rows changes shapes, so instead the held-out
neuron is masked out of the likelihood with a per-neuron weight vector — the
objective is mathematically identical — and the ``numTrials * ydim`` Newton
solves run as ONE doubly-vmapped batched solve.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pgpfa.infer.laplace import _newton_solve
from pgpfa.models.params import rbf_kernel
from pgpfa.ops.blockmat import blocks_inv


@partial(jax.jit, static_argnames=("T", "bin_size_ms", "maxiter"))
def _loo_predict(C, d, tau, Y, T: int, bin_size_ms: float, gtol=1e-8, maxiter: int = 100):
    R, ydim, _ = Y.shape
    xdim = C.shape[1]
    K = rbf_kernel(tau, T, bin_size_ms)
    Kinv = blocks_inv(K)
    eye_y = jnp.eye(ydim, dtype=C.dtype)

    def one(y_tr, n):
        w = 1.0 - eye_y[n]
        x0 = jnp.zeros((xdim, T), dtype=C.dtype)
        X, _, _, _, _ = _newton_solve(y_tr, x0, C, d, Kinv, w, gtol, maxiter)
        pred = jnp.exp(C[n] @ X + d[n])  # (T,)
        err = jnp.sum((y_tr[n] - pred) ** 2)
        return pred, err

    per_trial = jax.vmap(one, in_axes=(None, 0))  # over neurons
    preds, errs = jax.vmap(per_trial, in_axes=(0, None))(Y, jnp.arange(ydim))
    return preds, jnp.sum(errs)


def leave_one_out_prediction(params, Y, bin_size_ms: float):
    """Compute LOO rate predictions and total squared error.

    Args:
        params: dict ``{'C','d','tau'}``.
        Y: counts ``(R, ydim, T)`` (or a reference-style experiment).

    Returns:
        ``(y_pred, pred_err)`` with ``y_pred`` shaped ``(R, ydim, T)``.
    """
    if not isinstance(Y, (np.ndarray, jnp.ndarray)):
        from pgpfa.data.synthetic import stack_experiment

        Y = stack_experiment(Y)
    C = jnp.asarray(params["C"])
    d = jnp.asarray(np.ravel(params["d"]))
    tau = jnp.asarray(np.ravel(params["tau"]))
    Yj = jnp.asarray(Y, dtype=C.dtype)
    preds, err = _loo_predict(C, d, tau, Yj, Y.shape[-1], float(bin_size_ms))
    return np.asarray(preds), float(err)
