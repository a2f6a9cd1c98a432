"""Structured (latent x time) block-matrix operators.

Matrices over the flattened latent space ``R^{xdim*T}`` (latent-major layout)
appearing in P-GPFA have a common structure:

    M[k*T + t, l*T + u] = delta_{tu} * W[t, k, l] + delta_{kl} * B[k, t, u]

i.e. a part that is diagonal in time (observation curvature, coupling latents
within a bin) plus a part that is block-diagonal in latents (the GP prior,
coupling time within a latent). Both the Laplace Hessian
(reference ``funs/inference.py:50-65``) and the variational posterior precision
(reference ``funs/inference.py:188-191``) have this form.

Helpers here assemble/disassemble the dense form needed for Cholesky solves and
extract the posterior second-moment views the M-step consumes
(``post_vsm`` / ``post_vsmGP``, reference ``funs/inference.py:164-172``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_hessian(W: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Assemble the dense ``(xdim*T, xdim*T)`` matrix from its two structured parts.

    Args:
        W: time-local part ``(T, xdim, xdim)`` (symmetric in the last two axes).
        B: latent-block-diagonal part ``(xdim, T, T)``.

    Returns:
        Dense symmetric matrix ``(xdim*T, xdim*T)`` in latent-major layout.
    """
    T, xdim, _ = W.shape
    eye_t = jnp.eye(T, dtype=W.dtype)
    eye_x = jnp.eye(xdim, dtype=W.dtype)
    # H4[k, t, l, u]
    H4 = jnp.einsum("tkl,tu->ktlu", W, eye_t) + jnp.einsum("ktu,kl->ktlu", B, eye_x)
    return H4.reshape(xdim * T, xdim * T)


def structured_mm(W: jnp.ndarray, B: jnp.ndarray, Xm: jnp.ndarray) -> jnp.ndarray:
    """``H @ Xm`` using only the structured parts — never the dense ``H``.

    With ``H[kt, lu] = delta_tu W[t, k, l] + delta_kl B[k, t, u]`` the product
    against ``(D, m)`` (or ``(D,)``) operands costs ``O(T x^2 m + x T^2 m)``
    instead of the dense ``O(x^2 T^2 m)`` — the lever that makes the f64
    residual-refinement steps cheap on TPU (dense f64 matmuls are emulated at
    ~0.5 TFLOP/s there; the structured form is ~10x fewer f64 flops at
    Stevenson scale).
    """
    hi = jax.lax.Precision.HIGHEST
    xdim, T = B.shape[0], B.shape[1]
    vec = Xm.ndim == 1
    X4 = Xm.reshape((xdim, T) if vec else (xdim, T, -1))
    if vec:
        out = jnp.einsum("ktu,ku->kt", B, X4, precision=hi)
        out = out + jnp.einsum("tkl,lt->kt", W, X4, precision=hi)
        return out.reshape(-1)
    if Xm.dtype == jnp.float64:
        # f64: both parts as fused broadcast-multiply-reduces. XLA's f64 dot
        # is emulated at <0.1 TFLOP/s for these shapes on TPU, so the
        # bandwidth-bound elementwise form wins — measured at Stevenson
        # scale: W part 157 -> 8 ms (the "tkl,ltm" einsum lowers to T tiny
        # (xdim, xdim) f64 matmuls), B part 137 -> 104 ms.
        out = jnp.sum(B[:, :, :, None] * X4[:, None], axis=2)
        out = out + jnp.sum(
            jnp.transpose(W, (1, 2, 0))[..., None] * X4[None], axis=1
        )
    else:
        # f32 fast mode: matmuls run natively on the MXU and beat the
        # bandwidth-bound form — keep the einsums.
        out = jnp.einsum("ktu,kum->ktm", B, X4, precision=hi)
        out = out + jnp.einsum("tkl,ltm->ktm", W, X4, precision=hi)
    return out.reshape(xdim * T, -1)


def solve_psd_structured(W, B, rhs, L32, ir_steps: int = None) -> jnp.ndarray:
    """:func:`solve_psd_mixed` with the residual computed structurally.

    ``L32`` is the f32 Cholesky of the (f32-assembled) dense ``H``; the f64
    refinement residuals use :func:`structured_mm`, so no dense f64 product
    is ever formed.

    f32 fast mode DEFAULT (``ir_steps=None``): refinement is skipped —
    iterative refinement in the SAME precision as the factorization cannot
    improve the forward error (the f32 residual carries the same 1e-7
    rounding it is trying to resolve), so the extra cho_solve + structured_mm
    per Newton body (~10 ms/body at Stevenson scale on the bench TPU) bought
    nothing. An EXPLICIT ``ir_steps`` is honored in either dtype (the
    stale-factor escape hatch of CLAUDE.md rule 15). f64 semantics untouched.
    """
    import jax.scipy.linalg as jsl

    if ir_steps is None:
        ir_steps = 2 if rhs.dtype == jnp.float64 else 0

    def coarse(b):
        return jsl.cho_solve((L32, True), b.astype(jnp.float32)).astype(rhs.dtype)

    x = coarse(rhs)
    for _ in range(ir_steps):
        r = rhs - structured_mm(W, B, x)
        x = x + coarse(r)
    return x


def inv_psd_structured(W, B, ns_steps: int = 3, f64_steps: int = 1, L32=None):
    """:func:`inv_psd_mixed` from the structured parts (same semantics).

    The dense matrix is assembled ONLY in f32 (for the factorization and the
    MXU-friendly f32 Newton-Schulz steps); every f64 residual uses
    :func:`structured_mm`.
    """
    import jax.scipy.linalg as jsl

    from pgpfa.ops.pallas_kernels import maybe_ns_step

    hi = jax.lax.Precision.HIGHEST
    dt = B.dtype
    D = B.shape[0] * B.shape[1]
    if dt != jnp.float64:
        # f32 fast mode: the factorization's own 1e-7-grade rounding is the
        # accuracy floor; same-precision Newton-Schulz / residual steps only
        # add matmul traffic (~12 ms per E-step at Stevenson scale). Return
        # the symmetrized cho_solve inverse directly.
        if L32 is None:
            H32 = assemble_hessian(W, B)
            L32 = jnp.linalg.cholesky(H32)
        X = jsl.cho_solve((L32, True), jnp.eye(D, dtype=jnp.float32)).astype(dt)
        return 0.5 * (X + jnp.swapaxes(X, -1, -2))
    H32 = assemble_hessian(W.astype(jnp.float32), B.astype(jnp.float32))
    if L32 is None:
        L32 = jnp.linalg.cholesky(H32)
    eye32 = jnp.eye(D, dtype=jnp.float32)
    X32 = jsl.cho_solve((L32, True), eye32)
    f64_steps = min(f64_steps, ns_steps)
    for _ in range(ns_steps - f64_steps):
        X32 = maybe_ns_step(H32, X32)
    X = X32.astype(dt)
    eye = jnp.eye(D, dtype=dt)
    for _ in range(f64_steps):
        Rres = eye - structured_mm(W, B, X)
        corr = jnp.matmul(
            X.astype(jnp.float32), Rres.astype(jnp.float32), precision=hi
        ).astype(dt)
        X = X + corr
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def cov_views(cov: jnp.ndarray, xdim: int, T: int):
    """Extract the two posterior-covariance views used by the M-step.

    Args:
        cov: dense posterior covariance ``(xdim*T, xdim*T)``.

    Returns:
        ``(vsm, vsm_gp)`` where
        * ``vsm`` ``(T, xdim, xdim)`` — per-time-bin cross-latent covariance
          (reference's strided ``PostCovGP[kk::T, kk::T]``,
          ``funs/inference.py:169-172``),
        * ``vsm_gp`` ``(xdim, T, T)`` — per-latent temporal covariance
          (reference's ``PostCovGP[k*T:(k+1)*T, k*T:(k+1)*T]``,
          ``funs/inference.py:164-167``).
    """
    c4 = cov.reshape(xdim, T, xdim, T)
    vsm = jnp.einsum("ktlt->tkl", c4)
    vsm_gp = jnp.einsum("ktku->ktu", c4)
    return vsm, vsm_gp


def solve_psd(H: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Cholesky solve ``H^{-1} rhs`` for symmetric positive-definite ``H``.

    CPU utility: a plain f64 triangular solve stalls on this TPU — device
    code must use :func:`solve_psd_mixed` / :func:`inv_psd_mixed` instead.
    """
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(H)
    return jsl.cho_solve((L, True), rhs)


def inv_psd(H: jnp.ndarray) -> jnp.ndarray:
    """Cholesky-based inverse of a symmetric positive-definite matrix."""
    return solve_psd(H, jnp.eye(H.shape[-1], dtype=H.dtype))


def chol_logdet(M: jnp.ndarray) -> jnp.ndarray:
    """``log det`` of an SPD matrix via Cholesky (batched over leading axes)."""
    L = jnp.linalg.cholesky(M)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def logdet_psd_mixed(H: jnp.ndarray) -> jnp.ndarray:
    """f64-accurate ``log det`` of an SPD matrix without an f64 factorization.

    TPU path for objectives that need a log-determinant (the variational dual
    cost, reference ``funs/inference.py:196-213``): f64 Cholesky is emulated
    and slow on TPU, so instead

    1. Jacobi-equilibrate ``Hs = D H D`` with ``D = diag(H)^{-1/2}`` — unit
       diagonal collapses the condition number of GP-precision-shaped
       matrices, so the f32 factorization error stays small;
    2. factor ``Hs`` in f32 (MXU work) for the leading term;
    3. correct in f64 with the residual Taylor series
       ``logdet(Hs) = logdet(L32 L32^T) - sum_k tr(R^k)/k``,
       ``R = I - X32 Hs``, truncated at 4th order (error ~ D * ||R||^5,
       with ||R|| ~ kappa(Hs) * 1e-7 << 1).

    Gradient: exact custom rule ``d logdet(H) = <H^{-1}, dH>`` via
    :func:`inv_psd_mixed` (autodiff through the f32 factorization would carry
    f32-grade noise).
    """
    return _logdet_psd_mixed(H)


def _logdet_series(A):
    """``logdet(I - A)`` for a small exactly-computed residual ``A``:
    ``-(tr A + tr A^2/2 + tr A^3/3 + tr A^4/4)``. The powers enter at
    ``O(|A|^k)`` so they may be f32 products; truncation error ~ D * |A|^5."""
    hi = jax.lax.Precision.HIGHEST
    tr1 = jnp.trace(A)
    tr2 = jnp.vdot(A, A.T)
    A32 = A.astype(jnp.float32)
    A2 = jnp.matmul(A32, A32, precision=hi).astype(A.dtype)
    tr3 = jnp.vdot(A2, A.T)
    tr4 = jnp.vdot(A2, A2.T)
    return -(tr1 + tr2 / 2.0 + tr3 / 3.0 + tr4 / 4.0)


@jax.custom_jvp
def inv_logdet_psd_mixed_d(H):
    """:func:`inv_logdet_psd_mixed` with EXACT derivative rules.

    Autodiff through the mixed-precision internals (f32 Cholesky +
    Newton-Schulz refinement) would carry f32-grade tangent noise and an
    unnecessarily deep backward graph. Since the primal output is the exact
    inverse/logdet to ~1e-12, the calculus of the EXACT quantities applies::

        d(H^{-1}) = -H^{-1} dH H^{-1},      d(logdet H) = <H^{-1}, dH>

    Both rules are linear in ``dH``, so JAX transposes them automatically —
    one wrapper gives f64-accurate forward AND reverse mode. This is what
    makes the block-tridiagonal factorization (``pgpfa/ops/blocktridiag.py``)
    differentiable end-to-end: the banded tau M-step takes ``jax.grad``
    straight through ``btd_factor``/``btd_solve``/``btd_selected_inverse``.
    """
    return inv_logdet_psd_mixed(H)


@inv_logdet_psd_mixed_d.defjvp
def _inv_logdet_psd_mixed_d_jvp(primals, tangents):
    (H,) = primals
    (dH,) = tangents
    hi = jax.lax.Precision.HIGHEST
    X, ld = inv_logdet_psd_mixed_d(H)
    dX = -jnp.matmul(jnp.matmul(X, dH, precision=hi), X, precision=hi)
    return (X, ld), (dX, jnp.vdot(X, dH))


def inv_logdet_psd_mixed(H, ns_steps: int = 3, f64_steps: int = 1):
    """``(H^{-1}, logdet H)`` sharing one f32 Cholesky factorization.

    Scan-friendly combination used by the block-tridiagonal solvers
    (``pgpfa/ops/blocktridiag.py``), where both the Schur-complement inverse
    and its log-determinant are needed per block.
    """
    s = 1.0 / jnp.sqrt(jnp.diagonal(H))
    Hs = H * (s[:, None] * s[None, :])
    L32 = chol32(Hs)
    ld = _logdet_equilibrated(Hs, L32, s, H.dtype)
    # H^{-1} = D_s Hs^{-1} D_s; equilibration also tightens the Newton-Schulz
    # convergence, so the shared factor is strictly better than refactoring H.
    inv_s = inv_psd_mixed(Hs, L32=L32, ns_steps=ns_steps, f64_steps=f64_steps)
    return inv_s * (s[:, None] * s[None, :]), ld


@jax.custom_jvp
def _logdet_psd_mixed(H):
    s = 1.0 / jnp.sqrt(jnp.diagonal(H))
    Hs = H * (s[:, None] * s[None, :])
    L32 = chol32(Hs)
    return _logdet_equilibrated(Hs, L32, s, H.dtype)


def _logdet_equilibrated(Hs, L32, s, dtype):
    """Shared core: logdet of the Jacobi-equilibrated ``Hs`` (factor ``L32``)
    plus the de-equilibration term ``-2 sum log s``."""
    import jax.scipy.linalg as jsl

    D = Hs.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    eye = jnp.eye(D, dtype=dtype)
    X32 = jsl.cho_solve((L32, True), jnp.eye(D, dtype=jnp.float32))
    X = X32.astype(dtype)
    Ld = L32.astype(dtype)
    # Exact chain: with G = Ld Ld^T (exact f64 product of the f32 factor, so
    # logdet(G) = 2 sum log diag(Ld) exactly) and ANY invertible X,
    #   logdet(Hs) = logdet(I - R) + logdet(G) - logdet(I + E),
    #   R = I - X Hs,  E = G X - I.
    # Both R (f32-inverse residual) and E (f32-solve rounding, i.e. how far
    # X is from G^{-1} — NOT negligible: dropping it floors the value at
    # ~1e-4 and stalls the VI line search) are ~ kappa(Hs) * 1e-7 << 1 after
    # equilibration; the only approximation left is Taylor truncation.
    base = 2.0 * jnp.sum(jnp.log(jnp.diag(Ld))) - 2.0 * jnp.sum(jnp.log(s))
    R = eye - mm(X, Hs)
    E = mm(mm(Ld, Ld.T), X) - eye
    return base + _logdet_series(R) - _logdet_series(-E)


@_logdet_psd_mixed.defjvp
def _logdet_psd_mixed_jvp(primals, tangents):
    (H,) = primals
    (dH,) = tangents
    return _logdet_psd_mixed(H), jnp.vdot(inv_psd_mixed(H), dH)


def blocks_inv(K: jnp.ndarray) -> jnp.ndarray:
    """Per-block SPD inverse of a ``(..., T, T)`` stack (mixed precision).

    This inverse defines the prior term of the Laplace objective, so it gets
    an extra Newton-Schulz step of refinement (residual ~1e-13).
    """
    import jax

    if K.ndim == 2:
        return inv_psd_mixed(K, ns_steps=4, f64_steps=2)
    return jax.vmap(lambda k: inv_psd_mixed(k, ns_steps=4, f64_steps=2))(
        K.reshape(-1, *K.shape[-2:])
    ).reshape(K.shape)


# --------------------------------------------------------------------------
# Mixed-precision SPD solvers (the TPU-native fast path)
#
# On TPU, f64 triangular solves are pathologically slow (measured: a batched
# (100, 700, 700) f64 cho_solve with full RHS does not finish in minutes,
# while the f32 version takes ~5 ms and an f64 700^3 batched matmul ~2 ms).
# So: factor in f32 (MXU work), then recover f64 accuracy with residual
# refinement — Newton-Schulz for inverses, iterative refinement for solves.
# Refinement squares the error per step: with kappa(H) <~ 1e6 the f32 inverse
# has relative error ~kappa * 1e-7 << 1, and 3 steps land at ~1e-12, far
# inside the 1e-6 parity budget. Used uniformly on CPU and TPU so numerics do
# not depend on the platform.
# --------------------------------------------------------------------------


def chol32(H: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor of an SPD matrix computed in float32."""
    return jnp.linalg.cholesky(H.astype(jnp.float32))


def solve_psd_mixed(H: jnp.ndarray, rhs: jnp.ndarray, L32=None,
                    ir_steps: int = None) -> jnp.ndarray:
    """Solve ``H x = rhs`` with an f32 factorization + f64 iterative refinement.

    Args:
        H: SPD matrix ``(D, D)`` (f64).
        rhs: ``(D,)`` or ``(D, k)``.
        L32: optional precomputed f32 Cholesky factor of H.
        ir_steps: refinement steps (error ~ (kappa * 1e-7)^(steps+1)).
            Default (``None``): 2 for f64, 0 for f32 — same-precision
            refinement cannot improve the forward error (the f32 residual
            carries the same rounding it resolves), but an EXPLICIT value is
            honored in either dtype (the stale-factor escape hatch of
            CLAUDE.md rule 15: refinement against a stale ``L32`` does pay).
    """
    import jax.scipy.linalg as jsl

    if L32 is None:
        L32 = chol32(H)
    if ir_steps is None:
        ir_steps = 2 if H.dtype == jnp.float64 else 0

    def coarse(b):
        return jsl.cho_solve((L32, True), b.astype(jnp.float32)).astype(H.dtype)

    x = coarse(rhs)
    for _ in range(ir_steps):
        r = rhs - H @ x
        x = x + coarse(r)
    return x


def inv_psd_mixed(H: jnp.ndarray, L32=None, ns_steps: int = 3, f64_steps: int = 1) -> jnp.ndarray:
    """SPD inverse via f32 Cholesky + Newton-Schulz refinement.

    ``X <- X (2I - H X)`` squares the inverse's residual each step; the result
    is symmetrized. Requires ``kappa(H) * 1e-7 < 1`` for convergence, which
    the eps-jittered GP precision guarantees by construction
    (``K``'s eigenvalues live in ``[eps_noise, T]``).

    Precision schedule: the first ``ns_steps - f64_steps`` refinement steps
    run in f32 (each step's own rounding floor is ~1e-7, which the next step
    squares away); the last ``f64_steps`` run in f64. On TPU an f64 matmul is
    ~35x an f32 one, so f32-first cuts the refinement cost ~3x. Use
    ``f64_steps=2`` when the inverse feeds an objective directly (extra f64
    step drives the residual to the f64 floor ~ kappa * 1e-16).
    """
    import jax.scipy.linalg as jsl

    D = H.shape[-1]
    if L32 is None:
        L32 = chol32(H)
    if H.dtype != jnp.float64:
        # f32 fast mode: refinement in the factorization's own precision is a
        # no-op for forward accuracy — return the symmetrized direct inverse.
        X = jsl.cho_solve((L32, True), jnp.eye(D, dtype=jnp.float32)).astype(H.dtype)
        return 0.5 * (X + jnp.swapaxes(X, -1, -2))
    # faithful f32 matmuls: TPU's default f32 matmul precision is bf16-grade,
    # which would floor the refinement at ~1e-3 instead of ~1e-7.
    import jax

    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    from pgpfa.ops.pallas_kernels import maybe_ns_step

    f64_steps = min(f64_steps, ns_steps)
    eye32 = jnp.eye(D, dtype=jnp.float32)
    H32 = H.astype(jnp.float32)
    X32 = jsl.cho_solve((L32, True), eye32)
    for _ in range(ns_steps - f64_steps):
        # fused Pallas kernel when PGPFA_PALLAS=1, XLA two-matmul otherwise
        X32 = maybe_ns_step(H32, X32)
    X = X32.astype(H.dtype)
    eye = jnp.eye(D, dtype=H.dtype)
    for _ in range(f64_steps):
        # The residual R = I - H X is a cancellation and must be resolved in
        # f64; the correction X @ R is NOT — its entries are ~|R| * |X|, so an
        # f32 product only perturbs it at relative 1e-7, i.e. absolutely at
        # ~1e-7 * |R| * |X|, below the refined accuracy. Halves the f64
        # matmul cost per step.
        Rres = eye - mm(H, X)
        corr = mm(X.astype(jnp.float32), Rres.astype(jnp.float32)).astype(H.dtype)
        X = X + corr
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))
