"""Laplace E-step for LONG trials: block-tridiagonal (banded) posterior algebra.

The dense E-step (``pgpfa/infer/laplace.py``) assembles and inverts an
``(xdim*T)^2`` Hessian per trial — the reference's T-scaling wall
(reference ``funs/inference.py:81-82,130-131``, ``funs/util.py:599-619``).
Here the time axis is cut into ``nb = T/s`` blocks and, writing the banded
GP prior's UDL factorization ``K = A S_K A^T`` (``A`` unit block-bidiagonal),
the posterior precision factors EXACTLY as::

    H = K^{-1} + W = A^{-T} M A^{-1},   M = S_K^{-1} + A^T W A

with ``M`` block-tridiagonal. Every Newton solve, the log-determinant
(``logdet H = logdet M``; ``det A = 1``) and the posterior moments
(``H^{-1} = A M^{-1} A^T`` via Takahashi selected inversion) are then
O(T s^2) time / O(T s) memory — linear in T instead of cubic. The only
approximation is banding the RBF prior itself, exponentially small for
``s * bin >~ 6 * tau`` (``pgpfa.ops.blocktridiag.btd_truncation_error``).

Within-block layout is time-major (``(t, k) -> t*xdim + k``) so the
observation curvature ``W`` stays block-diagonal inside a block.
All control flow is fixed-iteration ``lax.scan`` (branchless damped Newton,
same pattern as the tau M-step) and all dense block ops are mixed-precision
MXU work — no f64 factorizations, no while_loops, vmappable over trials.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pgpfa.models.poisson_gpfa import linear_predictor
from pgpfa.ops.blocktridiag import (
    BTDFactor,
    btd_factor,
    btd_rbf_kernel,
    btd_selected_inverse,
    btd_solve,
)

_HI = jax.lax.Precision.HIGHEST


class BandedInfRes(NamedTuple):
    """Posterior inference results with block-banded temporal covariances.

    ``post_vsm`` matches the dense path's layout; the per-latent temporal
    covariance is kept in banded block form (its exponentially small tail is
    never materialized).
    """

    post_mean: jnp.ndarray  # (R, xdim, T)
    post_vsm: jnp.ndarray  # (R, T, xdim, xdim)
    vsm_gp_diag: jnp.ndarray  # (R, xdim, nb, s, s)
    vsm_gp_off: jnp.ndarray  # (R, xdim, nb-1, s, s)  [block (i+1, i)]
    trial_obj: jnp.ndarray  # (R,)
    grad_norm: jnp.ndarray  # (R,) objective-gradient inf-norm at the mode
    # (convergence diagnostic for the fixed-iteration banded Newton)

    def vsm_gp_dense(self):
        """Materialize the banded temporal covariance as (R, xdim, T, T)
        (diagnostics / moderate-T parity tests only)."""
        R, xdim, nb, s, _ = self.vsm_gp_diag.shape
        T = nb * s
        out = jnp.zeros((R, xdim, T, T), dtype=self.vsm_gp_diag.dtype)
        for i in range(nb):
            sl = slice(i * s, (i + 1) * s)
            out = out.at[:, :, sl, sl].set(self.vsm_gp_diag[:, :, i])
        for i in range(nb - 1):
            lo, hi = slice((i + 1) * s, (i + 2) * s), slice(i * s, (i + 1) * s)
            out = out.at[:, :, lo, hi].set(self.vsm_gp_off[:, :, i])
            out = out.at[:, :, hi, lo].set(jnp.swapaxes(self.vsm_gp_off[:, :, i], -1, -2))
        return out


def _to_blocks(X, nb, s):
    """(xdim, T) -> (nb, s*xdim), time-major within blocks."""
    xdim = X.shape[0]
    return jnp.transpose(X.reshape(xdim, nb, s), (1, 2, 0)).reshape(nb, s * xdim)


def _from_blocks(Xb, xdim):
    """(nb, s*xdim) -> (xdim, T)."""
    nb, m = Xb.shape
    s = m // xdim
    return jnp.transpose(Xb.reshape(nb, s, xdim), (2, 0, 1)).reshape(xdim, nb * s)


def _latent_blocks_to_combined(Bk, xdim, dtype):
    """Per-latent blocks (xdim, n, s, s) -> combined blocks (n, s*xdim, s*xdim)
    coupling only like latents (time-major layout)."""
    n, s = Bk.shape[1], Bk.shape[2]
    eye = jnp.eye(xdim, dtype=dtype)
    return jnp.einsum("kntu,kl->ntkul", Bk, eye).reshape(n, s * xdim, s * xdim)


def _w_to_combined(Wbin, nb, s):
    """Per-bin curvature (T, xdim, xdim) -> combined blocks (nb, s*xdim, s*xdim)
    (block-diagonal over bins within a block)."""
    xdim = Wbin.shape[-1]
    Wr = Wbin.reshape(nb, s, xdim, xdim)
    eye = jnp.eye(s, dtype=Wbin.dtype)
    return jnp.einsum("nskl,st->nsktl", Wr, eye).reshape(nb, s * xdim, s * xdim)


def _apply_A(Gc, zb):
    """y = A z with A = I + (block subdiagonal Gc): y_i = z_i + Gc_{i} z_{i-1}."""
    tail = jnp.matmul(Gc, zb[:-1][..., None], precision=_HI)[..., 0]
    return zb.at[1:].add(tail)


def _apply_At(Gc, yb):
    """x = A^T y: x_i = y_i + Gc_{i}^T y_{i+1}."""
    head = jnp.matmul(jnp.swapaxes(Gc, -1, -2), yb[1:][..., None], precision=_HI)[..., 0]
    return yb.at[:-1].add(head)


def banded_posterior_views(facM: BTDFactor, Gc, nb: int, s: int, xdim: int):
    """Posterior second-moment views from the UDL-factored precision.

    With ``H = A^{-T} M A^{-1}`` (``A = I +`` block subdiagonal ``Gc``),
    ``H^{-1} = A Sig^M A^T``; the in-band blocks of ``H^{-1}`` follow from the
    Takahashi selected inverse of ``M``. Shared by the banded Laplace E-step
    and the banded variational E-step (their precisions have identical
    structure — reference ``funs/inference.py:81-82`` vs ``:188-191``).

    Returns ``(vsm, gp_diag, gp_off)``: per-bin ``(T, xdim, xdim)`` cross-
    latent covariance and the per-latent banded temporal blocks.
    """
    sel = btd_selected_inverse(facM)
    SD, S1, S2 = sel.diag, sel.off1, sel.off2

    # (H^{-1})_{ii} = SD_i + S1_{i-1} Gc_i^T + Gc_i S1_{i-1}^T + Gc_i SD_{i-1} Gc_i^T
    t1 = jnp.matmul(S1, jnp.swapaxes(Gc, -1, -2), precision=_HI)  # (nb-1,m,m) at rows 1..
    t2 = jnp.matmul(Gc, SD[:-1], precision=_HI)
    t3 = jnp.matmul(t2, jnp.swapaxes(Gc, -1, -2), precision=_HI)
    Hd = SD.at[1:].add(t1 + jnp.swapaxes(t1, -1, -2) + t3)

    # (H^{-1})_{i+1,i} = Gc_{i+1}(SD_i + S1_{i-1} Gc_i^T) + S2_{i-1} Gc_i^T + S1_i
    inner = SD[:-1].at[1:].add(t1[:-1])  # SD_i + S1_{i-1} Gc_i^T  (i = 0..nb-2)
    Ho = jnp.matmul(Gc, inner, precision=_HI) + S1
    if nb > 2:
        Ho = Ho.at[1:].add(
            jnp.matmul(S2, jnp.swapaxes(Gc[:-1], -1, -2), precision=_HI)
        )

    T = nb * s
    # views: per-bin xdim x xdim and per-latent banded (s, s) blocks
    Hd4 = Hd.reshape(nb, s, xdim, s, xdim)
    vsm = jnp.einsum("ntktl->ntkl", Hd4).reshape(T, xdim, xdim)
    gp_diag = jnp.einsum("ntkuk->kntu", Hd4)  # (xdim, nb, s, s)
    Ho4 = Ho.reshape(nb - 1, s, xdim, s, xdim)
    gp_off = jnp.einsum("ntkuk->kntu", Ho4)  # (xdim, nb-1, s, s)
    return vsm, gp_diag, gp_off


@partial(
    jax.jit,
    static_argnames=("T", "bin_size_ms", "block_size", "maxiter", "eps_noise"),
)
def laplace_estep_banded(
    C,
    d,
    tau,
    Y,
    T: int,
    bin_size_ms: float,
    block_size: int,
    x_init=None,
    weights=None,
    maxiter: int = 12,
    eps_noise: float = 0.001,
):
    """Batched banded-prior Laplace inference (long-T path).

    Drop-in analogue of
    :func:`pgpfa.infer.laplace.laplace_estep_from_arrays`; returns
    ``(BandedInfRes, post_loglik)``. ``block_size`` must divide ``T`` and
    satisfy ``block_size * bin_size_ms >~ 6 * max(tau) * 1000`` for the
    banding truncation to stay below ~1e-8.
    """
    R, ydim, _ = Y.shape
    xdim = C.shape[1]
    s = block_size
    nb = T // s
    m = s * xdim
    dt = C.dtype

    if x_init is None:
        x_init = jnp.zeros((R, xdim, T), dtype=dt)
    if weights is None:
        weights = jnp.ones((ydim,), dtype=dt)
    w = weights[:, None]

    # banded prior, factored once per E-step (shared across trials)
    Kd, Kb = btd_rbf_kernel(tau, T, bin_size_ms, s, eps_noise)
    facs = jax.vmap(btd_factor)(Kd, Kb)  # per latent
    Pc = _latent_blocks_to_combined(facs.P, xdim, dt)  # (nb, m, m)
    Gc = _latent_blocks_to_combined(facs.G, xdim, dt)  # (nb-1, m, m)
    facK = BTDFactor(P=Pc, G=Gc, logdet=jnp.sum(facs.logdet))

    def obj_grad(Xb, Y_tr):
        X = _from_blocks(Xb, xdim)
        act = linear_predictor(C, d, X)
        expA = jnp.exp(act)
        Kinvx = btd_solve(facK, Xb)
        obj = jnp.sum(w * expA) - jnp.vdot(w * Y_tr, act) + 0.5 * jnp.vdot(Xb, Kinvx)
        Gmat = C.T @ (w * (expA - Y_tr))
        Gb = _to_blocks(Gmat, nb, s) + Kinvx
        return obj, Gb, expA

    def objective(Xb, Y_tr):
        return obj_grad(Xb, Y_tr)[0]

    def build_M(expA):
        """M = S_K^{-1} + A^T W A, block-tridiagonal in combined layout."""
        from pgpfa.models.poisson_gpfa import hessian_weights

        Wbin = hessian_weights(C, w * expA)
        Wc = _w_to_combined(Wbin, nb, s)
        WG = jnp.matmul(Wc[1:], Gc, precision=_HI)  # (nb-1, m, m) = W_{i+1} Gc_{i+1}
        Md = Pc + Wc
        Md = Md.at[:-1].add(jnp.matmul(jnp.swapaxes(Gc, -1, -2), WG, precision=_HI))
        return Md, WG  # Mb = WG

    def newton_trial(Y_tr, X0):
        Xb0 = _to_blocks(X0, nb, s)
        f0, _, _ = obj_grad(Xb0, Y_tr)

        def body(carry, _):
            Xb, f = carry
            _, Gb, expA = obj_grad(Xb, Y_tr)
            Md, Mb = build_M(expA)
            facM = btd_factor(Md, Mb)
            # Newton step: H^{-1} g = A M^{-1} A^T g
            step = _apply_A(Gc, btd_solve(facM, _apply_At(Gc, Gb)))
            cand1 = Xb - step
            cand2 = Xb - 0.25 * step
            f1 = objective(cand1, Y_tr)
            f2 = objective(cand2, Y_tr)
            f1 = jnp.where(jnp.isfinite(f1), f1, jnp.inf)
            f2 = jnp.where(jnp.isfinite(f2), f2, jnp.inf)
            use2 = f2 < f1
            f_new = jnp.minimum(f1, f2)
            X_new = jnp.where(use2, cand2, cand1)
            better = f_new < f
            return (jnp.where(better, X_new, Xb), jnp.where(better, f_new, f)), None

        (Xb, f), _ = jax.lax.scan(body, (Xb0, f0), None, length=maxiter)

        # posterior moments at the mode: H^{-1} = A Sig^M A^T
        _, Gb_final, expA = obj_grad(Xb, Y_tr)
        gnorm = jnp.max(jnp.abs(Gb_final))
        Md, Mb = build_M(expA)
        facM = btd_factor(Md, Mb)
        vsm, gp_diag, gp_off = banded_posterior_views(facM, Gc, nb, s, xdim)

        return _from_blocks(Xb, xdim), f, vsm, gp_diag, gp_off, gnorm

    X, obj, vsm, gpd, gpo, gn = jax.vmap(newton_trial)(Y, x_init)
    res = BandedInfRes(
        post_mean=X, post_vsm=vsm, vsm_gp_diag=gpd, vsm_gp_off=gpo, trial_obj=obj,
        grad_norm=gn,
    )
    return res, -jnp.mean(obj)


def pauto_sum_banded(inf: BandedInfRes) -> jnp.ndarray:
    """Assemble the tau M-step's ``PautoSum`` (xdim, T, T) from banded moments.

    ``sum_r [m m^T]`` is exact (rank-1, dense); the covariance part uses the
    banded blocks — its neglected tail is the posterior covariance's
    exponential decay, bounded by the prior's banding truncation.
    """
    means = inf.post_mean
    R, xdim, nb, s, _ = inf.vsm_gp_diag.shape
    T = nb * s
    out = jnp.einsum("rkt,rku->ktu", means, means)
    d_sum = jnp.sum(inf.vsm_gp_diag, axis=0)  # (xdim, nb, s, s)
    o_sum = jnp.sum(inf.vsm_gp_off, axis=0)  # (xdim, nb-1, s, s)
    for i in range(nb):
        sl = slice(i * s, (i + 1) * s)
        out = out.at[:, sl, sl].add(d_sum[:, i])
    for i in range(nb - 1):
        lo, hi = slice((i + 1) * s, (i + 2) * s), slice(i * s, (i + 1) * s)
        out = out.at[:, lo, hi].add(o_sum[:, i])
        out = out.at[:, hi, lo].add(jnp.swapaxes(o_sum[:, i], -1, -2))
    return out
