"""The chunked fixed-scan L-BFGS driver reproduces the monolithic scan.

The VI E-steps drive the fixed-iteration L-BFGS in 25-iteration chunks under
an outer while_loop (early exit once every lane converges/stalls) — these
tests pin that chunk boundaries do not change the math and that the driver
pieces compose to exactly the public :func:`minimize_lbfgs_fixed`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pgpfa.utils.optim import (
    lbfgs_fixed_init,
    lbfgs_fixed_steps,
    minimize_lbfgs_fixed,
)


def _rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def test_chunked_steps_equal_monolithic_scan():
    x0 = jnp.asarray(np.linspace(-1.0, 1.5, 6))
    ref = minimize_lbfgs_fixed(_rosen, x0, n_iter=100)

    carry = lbfgs_fixed_init(_rosen, x0)
    for _ in range(4):
        carry = lbfgs_fixed_steps(_rosen, carry, 25, x0.shape)
    np.testing.assert_array_equal(np.asarray(carry[0]), np.asarray(ref.x))
    np.testing.assert_array_equal(float(carry[1]), float(ref.fun))


def test_chunked_steps_equal_under_vmap():
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.uniform(-1.0, 1.0, (4, 5)))
    ref = jax.vmap(lambda x0: minimize_lbfgs_fixed(_rosen, x0, n_iter=50))(X0)

    init = jax.vmap(lambda x0: lbfgs_fixed_init(_rosen, x0))(X0)
    step = jax.vmap(lambda c: lbfgs_fixed_steps(_rosen, c, 25, X0.shape[1:]))
    carry = step(step(init))
    np.testing.assert_array_equal(np.asarray(carry[0]), np.asarray(ref.x))


def test_chunked_driver_exact_budget_with_remainder():
    """maxiter NOT a multiple of the chunk: the driver must run EXACTLY
    maxiter iterations (floor(maxiter/chunk) full chunks + a static remainder
    chunk), matching the monolithic scan step-for-step (round-3 advisor: the
    previous drivers rounded the budget UP to a chunk multiple)."""
    from pgpfa.utils.optim import lbfgs_chunked_driver

    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.uniform(-1.0, 1.0, (3, 5)))
    ref = jax.vmap(lambda x0: minimize_lbfgs_fixed(_rosen, x0, n_iter=37))(X0)

    init = jax.vmap(lambda x0: lbfgs_fixed_init(_rosen, x0))(X0)
    make_step = lambda n: lambda c: jax.vmap(
        lambda ci: lbfgs_fixed_steps(_rosen, ci, n, X0.shape[1:]))(c)
    # slack_coef < 0 disables the stall exit (improvement is monotone >= 0)
    carry = lbfgs_chunked_driver(make_step, init, 37, chunk=25, slack_coef=-1.0)
    np.testing.assert_array_equal(np.asarray(carry[0]), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(carry[1]), np.asarray(ref.fun))


def test_chunked_driver_stall_exit_is_per_lane():
    """A lane with tiny |f| must be judged against ITS OWN slack: with one
    huge-offset lane and slack_coef sized so only the huge lane's batch-max
    slack would mask the small lane's progress, the driver must keep going
    (round-3 advisor: batch-wide max slack declared small trials stalled)."""
    from pgpfa.utils.optim import lbfgs_chunked_driver

    big = 1e8

    def f(x):  # lane-dependent offset rides in via x[-1]'s init
        return _rosen(x[:-1]) + x[-1] ** 2 * big

    rng = np.random.default_rng(2)
    X0 = jnp.asarray(np.concatenate(
        [rng.uniform(-1.0, 1.0, (2, 5)), np.array([[0.0], [1.0]])], axis=1))
    init = jax.vmap(lambda x0: lbfgs_fixed_init(f, x0))(X0)
    make_step = lambda n: lambda c: jax.vmap(
        lambda ci: lbfgs_fixed_steps(f, ci, n, X0.shape[1:]))(c)
    # slack_coef=1e-9: lane 1 starts at f ~ 1e8, so a batch-wide slack would
    # be ~0.1 and mask lane 0's per-chunk progress long before convergence.
    carry = lbfgs_chunked_driver(make_step, init, 100, chunk=10,
                                 slack_coef=1e-9)
    ref = jax.vmap(lambda x0: minimize_lbfgs_fixed(f, x0, n_iter=100))(X0)
    # both lanes must reach (near) the full-budget optimum, not a first-chunk
    # stall: compare objective values at a loose tolerance
    np.testing.assert_allclose(np.asarray(carry[1]), np.asarray(ref.fun),
                               rtol=1e-6, atol=1e-6)
