"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgpfa.ops.pallas_kernels import ns_step_fused


@pytest.fixture(scope="module")
def spd():
    rng = np.random.default_rng(0)
    B, D = 3, 256
    A = rng.standard_normal((B, D, D)).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) / D + np.eye(D, dtype=np.float32)
    # start from a reasonable approximate inverse (diagonal scaling)
    X0 = np.stack([np.diag(1.0 / np.diag(h)) for h in H]).astype(np.float32)
    return jnp.asarray(H), jnp.asarray(X0)


def test_ns_step_matches_xla(spd):
    H, X = spd
    hi = jax.lax.Precision.HIGHEST
    eye = jnp.eye(H.shape[-1], dtype=jnp.float32)
    want = X + jnp.matmul(X, eye - jnp.matmul(H, X, precision=hi), precision=hi)
    got = ns_step_fused(H, X, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ns_step_contracts_residual(spd):
    """Each fused step must square the inverse residual (the property the
    mixed-precision solver relies on). Start from 0.9 * H^{-1}, whose
    residual is exactly 0.1 I, so one step must take it to ~0.01 I."""
    H, _ = spd
    eye = jnp.eye(H.shape[-1], dtype=jnp.float32)
    Xs = jnp.asarray(
        np.stack([0.9 * np.linalg.inv(np.asarray(h, dtype=np.float64)) for h in H])
    ).astype(jnp.float32)

    def residual(X_):
        return float(jnp.max(jnp.abs(eye - jnp.matmul(H[0], X_[0], precision=jax.lax.Precision.HIGHEST))))

    r0 = residual(Xs)
    X1 = ns_step_fused(H, Xs, interpret=True)
    r1 = residual(X1)
    assert abs(r0 - 0.1) < 0.01, r0
    assert r1 < 0.02, (r0, r1)


def test_ns_step_unbatched(spd):
    H, X = spd
    got = ns_step_fused(H[0], X[0], interpret=True)
    assert got.shape == H[0].shape


@pytest.mark.parametrize("group", [1, 2])
def test_batched_cholesky_probe_matches_xla(group):
    """The batch-outside-tile Pallas Cholesky probe (VERDICT r4 item 9:
    measure the variant instead of assessing it; scripts/exp_pallas_chol.py)
    must factor correctly — masked-iota column pivoting, identity padding to
    the 128 lane multiple, unrolled panel/trailing updates. Timing lives in
    PERF.md; this pins correctness in interpreter mode."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from exp_pallas_chol import pallas_chol

    rng = np.random.default_rng(1)
    B, D = 4, 260  # D deliberately NOT a multiple of 128 (exercises the pad)
    M = rng.normal(size=(B, D, D)).astype(np.float32) / np.sqrt(D)
    A = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 0.5 * np.eye(D, dtype=np.float32))
    L = jnp.tril(pallas_chol(A, group=group, interpret=True))
    want = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
