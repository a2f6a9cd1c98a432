"""Block-tridiagonal SPD algebra: the long-trial (time-axis) scaling path.

This is the framework's SP/CP slot (SURVEY.md §2.3/§5): the reference
materializes and inverts dense ``(xdim*T)^2`` matrices every E-step
(reference ``funs/util.py:599-619``, ``funs/inference.py:81-82,130-131``),
an O(T^3) time / O(T^2) memory wall for long trials. Here the time axis is
cut into ``nb = T / s`` blocks; the RBF prior is exactly banded up to
exponentially small tails (``K[t, u] ~ exp(-(t-u)^2 bin^2 / 2 tau^2)``), so
with block size ``s >~ 6 * tau_bins`` the prior is block-tridiagonal to
~1e-8 and every E-step quantity follows from block-tridiagonal algebra in
O(T s^2) time and O(T s) memory — linear in T.

TPU-native design: the factorization is a Schur-complement UDL recursion
``A = (I + E G) S (I + E G)^T`` driven by ``lax.scan`` over time blocks,
where every step is dense ``m x m`` MXU work built ONLY from matmuls and the
mixed-precision SPD inverse/logdet of ``pgpfa.ops.blockmat`` — no triangular
solves (f64 trisolve stalls on this TPU) and no data-dependent control flow.
Trials/latents vmap over the scan. Posterior moments come from Takahashi
selected inversion (a second reverse scan), which yields exactly the
diagonal + first off-diagonal blocks of the inverse — all the M-step needs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pgpfa.ops.blockmat import inv_logdet_psd_mixed_d, inv_psd_mixed


class BTDFactor(NamedTuple):
    """UDL factorization of an SPD block-tridiagonal matrix.

    ``A = (I + E G) S (I + E G)^T`` with ``S = blockdiag(S_0..S_{nb-1})``,
    ``(E G)[i, i-1] = G_i`` and ``det A = prod det S_i``.

    Attributes:
        P: ``(nb, m, m)`` — Schur-complement inverses ``S_i^{-1}``.
        G: ``(nb-1, m, m)`` — gains ``G_{i+1} = B_{i+1} P_i`` (``B`` = the
            subdiagonal blocks ``A[i+1, i]``).
        logdet: scalar ``logdet A``.
    """

    P: jnp.ndarray
    G: jnp.ndarray
    logdet: jnp.ndarray


def btd_factor(D: jnp.ndarray, B: jnp.ndarray) -> BTDFactor:
    """Factor an SPD block-tridiagonal matrix given its blocks.

    Args:
        D: diagonal blocks ``(nb, m, m)``.
        B: subdiagonal blocks ``(nb-1, m, m)``, ``B[i] = A[i+1, i]``.
    """
    hi = jax.lax.Precision.HIGHEST
    P0, ld0 = inv_logdet_psd_mixed_d(D[0])

    def step(Pprev, inp):
        D_i, B_i = inp
        G_i = jnp.matmul(B_i, Pprev, precision=hi)
        S_i = D_i - jnp.matmul(G_i, B_i.T, precision=hi)
        S_i = 0.5 * (S_i + S_i.T)
        P_i, ld_i = inv_logdet_psd_mixed_d(S_i)
        return P_i, (P_i, G_i, ld_i)

    _, (P_rest, G, ld_rest) = jax.lax.scan(step, P0, (D[1:], B))
    P = jnp.concatenate([P0[None], P_rest], axis=0)
    return BTDFactor(P=P, G=G, logdet=ld0 + jnp.sum(ld_rest))


def btd_solve(fac: BTDFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = rhs`` for block-stacked ``rhs`` ``(nb, m)`` or ``(nb, m, k)``."""
    hi = jax.lax.Precision.HIGHEST
    mv = lambda M, v: jnp.matmul(M, v, precision=hi)

    def fwd(zprev, inp):
        r_i, G_i = inp
        z_i = r_i - mv(G_i, zprev)
        return z_i, z_i

    z0 = rhs[0]
    _, z_rest = jax.lax.scan(fwd, z0, (rhs[1:], fac.G))
    z = jnp.concatenate([z0[None], z_rest], axis=0)
    w = jnp.einsum("iab,ib...->ia...", fac.P, z, precision=hi)

    def bwd(xnext, inp):
        w_i, G_ip1 = inp
        x_i = w_i - mv(G_ip1.T, xnext)
        return x_i, x_i

    xn = w[-1]
    _, x_rest = jax.lax.scan(bwd, xn, (w[:-1], fac.G), reverse=True)
    return jnp.concatenate([x_rest, xn[None]], axis=0)


class BTDSelectedInverse(NamedTuple):
    """Selected blocks of ``A^{-1}`` from Takahashi recursion.

    Attributes:
        diag: ``(nb, m, m)`` — ``(A^{-1})[i, i]``.
        off1: ``(nb-1, m, m)`` — ``(A^{-1})[i+1, i]``.
        off2: ``(nb-2, m, m)`` — ``(A^{-1})[i+2, i]`` (needed to assemble
            first-off-diagonal blocks of congruences ``A' = U A^{-1} U^T``
            with block-bidiagonal ``U``).
    """

    diag: jnp.ndarray
    off1: jnp.ndarray
    off2: jnp.ndarray


def btd_selected_inverse(fac: BTDFactor) -> BTDSelectedInverse:
    """Diagonal and first/second off-diagonal blocks of ``A^{-1}``.

    Recursion (from ``A = (I+EG) S (I+EG)^T``): with ``Sig = A^{-1}``,
    ``Sig_{nn} = P_n`` and for ``i = nb-2 .. 0``::

        Sig_{i+1,i} = -Sig_{i+1,i+1} G_{i+1}
        Sig_{i,i}   =  P_i + G_{i+1}^T Sig_{i+1,i+1} G_{i+1}
        Sig_{i+2,i} = -Sig_{i+2,i+1} G_{i+1}
    """
    hi = jax.lax.Precision.HIGHEST
    nb, m, _ = fac.P.shape
    zero = jnp.zeros((m, m), dtype=fac.P.dtype)

    def step(carry, inp):
        Sig_next, Off_next = carry  # Sig_{i+1,i+1}, Sig_{i+2,i+1}
        P_i, G_ip1 = inp
        t = jnp.matmul(Sig_next, G_ip1, precision=hi)
        off1_i = -t  # Sig_{i+1,i}
        off2_i = -jnp.matmul(Off_next, G_ip1, precision=hi)  # Sig_{i+2,i}
        diag_i = P_i + jnp.matmul(G_ip1.T, t, precision=hi)
        diag_i = 0.5 * (diag_i + diag_i.T)
        return (diag_i, off1_i), (diag_i, off1_i, off2_i)

    carry0 = (fac.P[-1], zero)
    _, (diag_rest, off1, off2) = jax.lax.scan(
        step, carry0, (fac.P[:-1], fac.G), reverse=True
    )
    diag = jnp.concatenate([diag_rest, fac.P[-1][None]], axis=0)
    return BTDSelectedInverse(diag=diag, off1=off1, off2=off2[:-1])


# --------------------------------------------------------------------------
# time-PARALLEL solve: block cyclic reduction (the cross-chip SP primitive)
# --------------------------------------------------------------------------


def _bcr_pad(D, B, rhs):
    """Pad the block count to a power of two with decoupled identity blocks."""
    nb, m, _ = D.shape
    n2 = 1 << max(nb - 1, 0).bit_length() if nb > 1 else 1
    if n2 == nb:
        return D, B, rhs, nb
    pad = n2 - nb
    eye = jnp.broadcast_to(jnp.eye(m, dtype=D.dtype), (pad, m, m))
    D = jnp.concatenate([D, eye], axis=0)
    zB = jnp.zeros((pad, m, m), dtype=D.dtype)
    B = jnp.concatenate([B, zB], axis=0) if B.shape[0] else jnp.zeros(
        (n2 - 1, m, m), dtype=D.dtype)
    zr = jnp.zeros((pad,) + rhs.shape[1:], dtype=rhs.dtype)
    rhs = jnp.concatenate([rhs, zr], axis=0)
    return D, B, rhs, nb


def btd_solve_cr(D: jnp.ndarray, B: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal system by BLOCK CYCLIC REDUCTION.

    Same answer as ``btd_solve(btd_factor(D, B), rhs)`` but with O(log nb)
    sequential depth instead of O(nb): each level eliminates the odd-indexed
    blocks with BATCHED m x m inverses/matmuls (vmapped mixed-precision MXU
    work), halving the system. This is the survey's "ring-attention-shaped"
    sequence-parallel primitive (SURVEY.md §2.3 SP/CP): shard the leading
    block axis of ``D``/``B``/``rhs`` over a mesh 'time' axis and XLA/GSPMD
    partitions each level's batched elimination across chips, with nearest-
    neighbor collectives for the strided even/odd exchanges — the same comm
    shape ring attention uses for its KV rotation.

    Stability: cyclic reduction on an SPD block-tridiagonal matrix keeps
    every reduced system SPD (each level's diagonal blocks are Schur
    complements of a principal submatrix), so the mixed-precision inverse
    stays well-posed; exactness vs the sequential factorization is pinned to
    ~1e-10 by tests.

    Args:
        D: diagonal blocks ``(nb, m, m)``.
        B: subdiagonal blocks ``(nb-1, m, m)``, ``B[i] = A[i+1, i]``.
        rhs: ``(nb, m)`` or ``(nb, m, k)``.
    """
    hi = jax.lax.Precision.HIGHEST
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]
    D, B, rhs, nb_orig = _bcr_pad(D, B, rhs)
    nb, m, _ = D.shape
    inv = jax.vmap(lambda h: inv_psd_mixed(h))
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)

    # reduction: stack of (D_odd, B_left, B_right, r_odd, Dinv_odd) per level
    levels = []
    while D.shape[0] > 1:
        n = D.shape[0]
        De, Do = D[0::2], D[1::2]  # even kept, odd eliminated
        re, ro = rhs[0::2], rhs[1::2]
        # couplings: L[i] connects x_{i+1} <- x_i. For odd j = 2t+1:
        #   left neighbor 2t via L[2t], right neighbor 2t+2 via L[2t+1]
        Lo_left = B[0::2]  # (n/2,) L[2t] — always exists
        # L[2t+1] exists except for the last odd when it is the final block
        nhalf = n // 2
        Lo_right = jnp.zeros((nhalf, m, m), dtype=D.dtype)
        if B.shape[0] > 1:
            Lo_right = Lo_right.at[: B[1::2].shape[0]].set(B[1::2])
        Do_inv = inv(Do)
        levels.append((Lo_left, Lo_right, Do_inv, ro))

        # substitute x_odd into even rows:
        # row 2t gains from its RIGHT neighbor (odd 2t-1 is handled by row
        # 2t's LEFT coupling — x_{2t-1} = odd index (2(t-1)+1) -> t-1 slot)
        #   D'_t = D_{2t} - L_{2t-1}^T Dinv_{2t-1} L_{2t-1}  (left odd)
        #               - L_{2t} ... wait: row 2t couples to x_{2t-1} via
        #   A[2t, 2t-1] = L_{2t-1} and to x_{2t+1} via A[2t, 2t+1] = L_{2t}^T.
        # left odd of row 2t is slot t-1; right odd is slot t.
        KR = mm(jnp.swapaxes(Lo_left, -1, -2), Do_inv)  # L_{2t}^T Dinv_{2t+1}
        D_new = De - mm(KR, Lo_left)
        r_new = re - mm(KR, ro)
        # contribution of the LEFT odd neighbor (slot t-1) to row 2t (t >= 1):
        KL = mm(Lo_right, Do_inv)  # L_{2t+1} Dinv_{2t+1}: feeds row 2t+2
        D_new = D_new.at[1:].add(-mm(KL, jnp.swapaxes(Lo_right, -1, -2))[:-1])
        r_new = r_new.at[1:].add(-mm(KL, ro)[:-1])
        # new subdiagonal: coupling of x_{2t+2} to x_{2t} through odd 2t+1:
        #   L'_t = -L_{2t+1} Dinv_{2t+1} L_{2t}
        B_new = -mm(KL, Lo_left)[:-1] if n > 2 else jnp.zeros((0, m, m), D.dtype)
        D, B, rhs = D_new, B_new, r_new

    x = mm(inv(D), rhs)  # single remaining block

    # back substitution, reverse order
    for Lo_left, Lo_right, Do_inv, ro in reversed(levels):
        nhalf = Do_inv.shape[0]
        # x_odd[t] = Dinv (r_odd[t] - L_{2t} x_{2t} - L_{2t+1}^T x_{2t+2})
        acc = ro - mm(Lo_left, x[: nhalf])
        acc = acc - mm(jnp.swapaxes(Lo_right, -1, -2),
                       jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)[: nhalf])
        x_odd = mm(Do_inv, acc)
        n = x.shape[0] + nhalf
        out = jnp.zeros((n,) + x.shape[1:], dtype=x.dtype)
        out = out.at[0::2].set(x[: (n + 1) // 2])
        out = out.at[1::2].set(x_odd)
        x = out

    x = x[:nb_orig]
    return x[..., 0] if vec else x


# --------------------------------------------------------------------------
# block-tridiagonal RBF prior
# --------------------------------------------------------------------------


def btd_rbf_kernel(tau, T: int, bin_size_ms: float, block_size: int,
                   eps_noise: float = 0.001):
    """Per-latent RBF prior in block-tridiagonal form.

    Same entries as :func:`pgpfa.models.params.rbf_kernel` truncated beyond
    the first off-diagonal block — exact when correlations vanish past one
    block, i.e. ``block_size * bin_size_ms >~ 6 * tau * 1000`` (relative
    truncation ``exp(-18) ~ 1.5e-8``). Caller is responsible for choosing
    ``block_size`` against the LARGEST timescale the fit may reach; see
    :func:`btd_truncation_error` for a diagnostic.

    Returns:
        ``(Kd, Kb)`` with shapes ``(xdim, nb, s, s)`` and ``(xdim, nb-1, s, s)``.
    """
    if T % block_size != 0:
        raise ValueError(f"T={T} must be divisible by block_size={block_size}")
    tau = jnp.asarray(tau).reshape(-1)
    s = block_size
    nb = T // s
    t = jnp.arange(s, dtype=tau.dtype) * float(bin_size_ms)
    tau_ms = tau * 1000.0

    def block(lag):
        # K[t, u] for t in block i+lag, u in block i: offsets differ by lag*s bins
        dt = (t[:, None] + lag * s * float(bin_size_ms)) - t[None, :]
        base = (1.0 - eps_noise) * jnp.exp(-0.5 * (dt * dt)[None] / (tau_ms**2)[:, None, None])
        if lag == 0:
            base = base + eps_noise * jnp.eye(s, dtype=tau.dtype)[None]
        return base  # (xdim, s, s)

    Kd = jnp.broadcast_to(block(0)[:, None], (tau.shape[0], nb, s, s))
    Kb = jnp.broadcast_to(block(1)[:, None], (tau.shape[0], max(nb - 1, 0), s, s))
    return Kd, Kb


def btd_truncation_error(tau, bin_size_ms: float, block_size: int) -> float:
    """Largest neglected prior correlation (entries beyond one block off)."""
    import numpy as np

    tau_ms = np.asarray(tau).reshape(-1) * 1000.0
    lag_ms = (block_size + 1) * bin_size_ms
    return float(np.max(np.exp(-0.5 * (lag_ms / tau_ms) ** 2)))
