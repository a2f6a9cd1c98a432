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
