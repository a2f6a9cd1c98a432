"""Dual variational E-step for LONG trials: block-tridiagonal (banded) algebra.

The dense dual VI (``pgpfa/infer/variational.py``) evaluates, per L-BFGS
iteration, a dense ``(xdim*T)^2`` log-determinant — the same O(T^3) wall as
the dense Laplace path (reference ``funs/inference.py:188-191,222-256``).
Here both prior-side quantities are banded:

* the RBF prior ``K`` itself decays as ``exp(-lag^2/2 tau^2)``, so the
  quadratic/mean terms ``u^T K u`` and ``-K C_big (lam - y)`` are
  block-tridiagonal multiplies, O(T s^2);
* the posterior precision ``K^{-1} + C_big diag(lam) C_big^T`` has EXACTLY
  the structure of the banded Laplace Hessian, so with the prior's UDL
  factorization ``K = A S_K A^T`` it factors as ``A^{-T} M A^{-1}`` with
  block-tridiagonal ``M = S_K^{-1} + A^T W A`` — the dual's log-determinant
  is ``logdet M`` from one ``btd_factor`` scan (O(T s^2)), differentiable
  end-to-end through the mixed-precision custom derivative rules
  (``pgpfa.ops.blockmat.inv_logdet_psd_mixed_d``), and the posterior moment
  views reuse the banded Laplace path's Takahashi selected inversion
  (:func:`pgpfa.infer.laplace_longt.banded_posterior_views`).

The reference's relative diagonal ridge (``funs/inference.py:190-191``) is
preserved by folding ``ridge * diag(prec)`` into the per-bin curvature —
``diag(prec) = diag(K^{-1}) + diag(W)`` with ``diag(K^{-1})`` read off the
prior factorization's selected inverse once per E-step.

Same fixed-iteration branchless vmapped L-BFGS as the dense VI path; returns
a :class:`pgpfa.infer.laplace_longt.BandedInfRes` so the banded tau M-step
consumes the moments unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pgpfa.infer.laplace_longt import (
    BandedInfRes,
    _latent_blocks_to_combined,
    _to_blocks,
    _w_to_combined,
    banded_posterior_views,
)
from pgpfa.models.poisson_gpfa import hessian_weights, linear_predictor
from pgpfa.ops.blocktridiag import (
    BTDFactor,
    btd_factor,
    btd_rbf_kernel,
    btd_selected_inverse,
    btd_solve,
)
from pgpfa.utils.optim import (
    lbfgs_chunked_driver,
    lbfgs_fixed_init,
    lbfgs_fixed_steps,
)

_HI = jax.lax.Precision.HIGHEST


def banded_dual_machinery(C, d, tau, T: int, bin_size_ms: float,
                          block_size: int, eps_noise: float = 0.001,
                          ridge: float = 1e-6):
    """Build the banded dual-VI pieces shared across trials.

    Returns ``(dual_cost_banded, kmul, build_M, facK, Gc)`` where
    ``dual_cost_banded(rho, y_tr)`` is the per-trial dual objective,
    ``kmul`` the banded prior multiply, ``build_M`` the factored-precision
    assembly (``M = S_K^{-1} + A^T W~ A``), ``facK`` the prior factorization
    and ``Gc`` its combined-layout gains. Exposed so tests can evaluate the
    banded objective at a fixed ``rho`` against the dense ``dual_cost``.
    """
    xdim = C.shape[1]
    s = block_size
    nb = T // s
    dt = C.dtype

    # banded prior, factored once per E-step (shared across trials)
    Kd, Kb = btd_rbf_kernel(tau, T, bin_size_ms, s, eps_noise)
    facs = jax.vmap(btd_factor)(Kd, Kb)
    Pc = _latent_blocks_to_combined(facs.P, xdim, dt)  # (nb, m, m)
    Gc = _latent_blocks_to_combined(facs.G, xdim, dt)  # (nb-1, m, m)
    facK = BTDFactor(P=Pc, G=Gc, logdet=jnp.sum(facs.logdet))

    # per-(latent, bin) diagonal of K^{-1} for the relative ridge:
    # selected-inverse diagonal blocks of K^{-1}, combined time-major layout
    selK_diag = btd_selected_inverse(facK).diag  # (nb, m, m)
    dKinv = jnp.diagonal(selK_diag, axis1=-2, axis2=-1).reshape(nb * s, xdim)  # (T, xdim)

    def kmul(u):
        """Banded ``K @ u`` per latent; ``u`` (xdim, T) -> (xdim, T)."""
        ub = u.reshape(xdim, nb, s)
        out = jnp.einsum("kntu,knu->knt", Kd, ub, precision=_HI)
        out = out.at[:, 1:].add(
            jnp.einsum("kntu,knu->knt", Kb, ub[:, :-1], precision=_HI))
        out = out.at[:, :-1].add(
            jnp.einsum("knut,knu->knt", Kb, ub[:, 1:], precision=_HI))
        return out.reshape(xdim, T)

    def build_M(lam):
        """``M = S_K^{-1} + A^T W~ A`` with the relative ridge folded into
        the per-bin curvature ``W~ = W + ridge * diag(diag(K^{-1}) + diag(W))``
        (the reference's ``prec + ridge * diag(prec)``,
        ``funs/inference.py:190-191``, banded)."""
        Wbin = hessian_weights(C, lam)  # (T, xdim, xdim)
        dW = jnp.diagonal(Wbin, axis1=-2, axis2=-1)  # (T, xdim)
        Wbin = Wbin + jax.vmap(jnp.diag)(ridge * (dW + dKinv))
        Wc = _w_to_combined(Wbin, nb, s)
        WG = jnp.matmul(Wc[1:], Gc, precision=_HI)
        Md = Pc + Wc
        Md = Md.at[:-1].add(jnp.matmul(jnp.swapaxes(Gc, -1, -2), WG, precision=_HI))
        return Md, WG  # Mb = WG

    def dual_cost_banded(rho, y_tr):
        """Reference ``dualProblemRho`` (``funs/inference.py:222-244``) with
        every prior-side term banded."""
        lam = jnp.exp(rho)
        lmy = lam - y_tr
        u = jnp.einsum("nk,nt->kt", C, lmy, precision=_HI)
        a = 0.5 * jnp.vdot(u, kmul(u))
        b = -jnp.vdot(d, jnp.sum(lmy, axis=1))
        Md, Mb = build_M(lam)
        c = -0.5 * btd_factor(Md, Mb).logdet  # logdet prec = logdet M; det A = 1
        e = jnp.vdot(lam, rho - 1.0)
        return a + b + c + e

    return dual_cost_banded, kmul, build_M, facK, Gc


@partial(
    jax.jit,
    static_argnames=("T", "bin_size_ms", "block_size", "maxiter", "eps_noise"),
)
def vi_estep_banded(
    C,
    d,
    tau,
    Y,
    T: int,
    bin_size_ms: float,
    block_size: int,
    rho_init=None,
    gtol: float = 1e-8,
    maxiter: int = 150,
    eps_noise: float = 0.001,
    ridge: float = 1e-6,
):
    """Batched banded-prior dual variational inference (long-T path).

    Drop-in analogue of
    :func:`pgpfa.infer.variational.vi_estep_from_arrays`; returns
    ``(BandedInfRes, post_loglik, var_lower_bound, rho)``. ``block_size``
    must divide ``T`` and satisfy
    ``block_size * bin_size_ms >~ 6 * max(tau) * 1000``.
    """
    R, ydim, _ = Y.shape
    xdim = C.shape[1]
    s = block_size
    nb = T // s
    dt = C.dtype

    dual_cost_banded, kmul, build_M, facK, Gc = banded_dual_machinery(
        C, d, tau, T, bin_size_ms, block_size, eps_noise, ridge)

    if rho_init is None:
        rho_init = jnp.zeros((R, ydim, T), dtype=dt)

    # chunked early-exit driver (while_loop OUTSIDE the vmapped fixed scan —
    # same structure, budget and exit rules as the dense VI path,
    # variational.py: exact maxiter budget, per-trial stall slack, gradient
    # tolerance)
    tshape = rho_init.shape[1:]
    init = jax.vmap(
        lambda r0, y: lbfgs_fixed_init(lambda r: dual_cost_banded(r, y), r0)
    )(rho_init, Y)
    make_step = lambda n: lambda c: jax.vmap(
        lambda ci, y: lbfgs_fixed_steps(lambda r: dual_cost_banded(r, y), ci,
                                        n, tshape)
    )(c, Y)
    slack_coef = 1e-13 if dt == jnp.float64 else 1e-6
    carry = lbfgs_chunked_driver(make_step, init, maxiter, chunk=25,
                                 slack_coef=slack_coef, gtol=gtol)
    rho, bound = carry[0].reshape(rho_init.shape), carry[1]
    gnorm = jnp.max(jnp.abs(carry[2]), axis=tuple(range(1, carry[2].ndim)))

    def moments_trial(r, y_tr):
        lam = jnp.exp(r)
        mean = -kmul(jnp.einsum("nk,nt->kt", C, lam - y_tr, precision=_HI))
        Md, Mb = build_M(lam)
        facM = btd_factor(Md, Mb)
        vsm, gp_diag, gp_off = banded_posterior_views(facM, Gc, nb, s, xdim)
        # Laplace objective at the VI mean (post_loglik parity with the dense
        # VI path, reference funs/inference.py:429-431), prior term banded
        act = linear_predictor(C, d, mean)
        xb = _to_blocks(mean, nb, s)
        obj = (jnp.sum(jnp.exp(act)) - jnp.vdot(y_tr, act)
               + 0.5 * jnp.vdot(xb, btd_solve(facK, xb)))
        return mean, vsm, gp_diag, gp_off, obj

    means, vsm, gpd, gpo, obj = jax.vmap(moments_trial)(rho, Y)
    res = BandedInfRes(
        post_mean=means, post_vsm=vsm, vsm_gp_diag=gpd, vsm_gp_off=gpo,
        trial_obj=obj, grad_norm=gnorm,
    )
    return res, -jnp.mean(obj), jnp.mean(bound), rho
