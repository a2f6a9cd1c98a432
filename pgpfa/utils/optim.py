"""Jit-compatible unconstrained minimizers.

The reference delegates every inner optimization to ``scipy.optimize``
(Newton-CG / TNC / BFGS / L-BFGS-B; e.g. ``funs/inference.py:119-126``,
``funs/learning.py:124-130,283-288``). Those host-side optimizers cannot run
inside an XLA program, so the TPU build uses:

* :func:`minimize_lbfgs` — optax's L-BFGS with zoom linesearch driven by a
  ``lax.while_loop`` (fully jittable, vmap-able), used for the C,d M-step,
  the GP-timescale M-step and the variational dual problem;
* a damped-Newton loop implemented directly in the Laplace E-step (where the
  exact Hessian solve is cheap thanks to the block structure).

Parity with the reference is defined at converged objective values (see
SURVEY.md §7 "Optimizer parity policy"), so the minimizers here run to tight
gradient tolerances rather than replaying scipy's iterates.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu


class MinimizeResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    grad_norm: jnp.ndarray
    niter: jnp.ndarray


def minimize_lbfgs(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    maxiter: int = 500,
    tol: float = 1e-10,
    memory_size: int = 15,
) -> MinimizeResult:
    """Minimize a smooth scalar function with L-BFGS (zoom linesearch).

    Jittable and vmap-able. ``fun`` must be a pure function of a single array
    (close over any other data).

    Args:
        fun: objective; returns a scalar.
        x0: initial point (any array shape).
        maxiter: iteration cap for the ``while_loop``.
        tol: termination threshold on the gradient infinity-norm.

    Returns:
        :class:`MinimizeResult` with the final iterate, objective value,
        gradient infinity-norm and iteration count.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        x, state = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fun)
        x = optax.apply_updates(x, updates)
        return x, state

    def cond(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        gnorm = jnp.max(jnp.abs(grad))
        return (count == 0) | ((count < maxiter) & (gnorm > tol) & jnp.isfinite(gnorm))

    init = (x0, opt.init(x0))
    x, state = jax.lax.while_loop(cond, step, init)
    grad = otu.tree_get(state, "grad")
    return MinimizeResult(
        x=x,
        fun=fun(x),
        grad_norm=jnp.max(jnp.abs(grad)),
        niter=otu.tree_get(state, "count"),
    )


def lbfgs_fixed_init(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    memory_size: int = 10,
):
    """Initial carry for the fixed-scan L-BFGS (see :func:`minimize_lbfgs_fixed`).

    Exposed separately so a caller can drive the scan in CHUNKS under an outer
    ``lax.while_loop`` (early exit once every vmapped lane has converged or
    stalled) — the chunked driver runs the IDENTICAL per-iteration body, so
    the iterates match the monolithic scan step-for-step.
    """
    D = x0.size
    dt = x0.dtype
    xf0 = x0.reshape(D)
    f0, g0 = jax.value_and_grad(lambda xf: fun(xf.reshape(x0.shape)))(xf0)
    m = memory_size
    return (
        xf0,
        f0,
        g0,
        jnp.zeros((m, D), dtype=dt),
        jnp.zeros((m, D), dtype=dt),
        jnp.zeros((m,), dtype=dt),
        jnp.asarray(1.0, dtype=dt),
    )


def lbfgs_fixed_steps(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    carry,
    n_iter: int,
    shape,
):
    """Advance a :func:`lbfgs_fixed_init` carry by ``n_iter`` scan iterations."""
    body = _lbfgs_fixed_body(fun, shape)
    carry, _ = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=n_iter)
    return carry


def lbfgs_chunked_driver(
    make_step: Callable[[int], Callable],
    init,
    maxiter: int,
    chunk: int = 25,
    slack_coef: float = 1e-13,
    gtol: float = None,
):
    """Drive vmapped fixed-scan L-BFGS carries in chunks with early exit.

    Runs exactly ``floor(maxiter/chunk)`` full chunks under a ``lax.while_loop``
    plus one STATIC remainder chunk of ``maxiter % chunk`` iterations (guarded
    by the done flag via ``lax.cond``), so the total budget is exactly
    ``maxiter`` — early exit is the ONLY way iterates can differ from the
    monolithic ``lbfgs_fixed_steps(fun, carry, maxiter)`` scan (round-3 advisor:
    the previous drivers rounded the budget UP to a chunk multiple).

    Early exit fires when every vmapped lane individually improved by no more
    than its OWN rounding slack ``slack_coef * (1 + |f_i|)`` over a whole chunk
    (round-3 advisor: a batch-wide max slack let the largest trial's magnitude
    declare small trials stalled), or — when ``gtol`` is given — when every
    lane's gradient infinity-norm is within tolerance.

    Args:
        make_step: ``make_step(n)`` returns a function advancing the whole
            vmapped carry by ``n`` identical scan iterations.
        init: vmapped :func:`lbfgs_fixed_init` carry; lanes lead each leaf
            (``carry[1]`` per-lane objective, ``carry[2]`` per-lane gradient).
        maxiter: exact total iteration budget.
    """
    chunk = min(chunk, maxiter)
    n_full = maxiter // chunk
    rem = maxiter % chunk
    step = make_step(chunk)

    def exit_now(f_before, carry):
        f_after, g = carry[1], carry[2]
        slack = slack_coef * (1.0 + jnp.abs(f_after))
        done = jnp.all(f_before - f_after <= slack)
        if gtol is not None:
            done = done | (jnp.max(jnp.abs(g)) <= gtol)
        return done

    def w_cond(state):
        _, it, done = state
        return (it < n_full) & ~done

    def w_body(state):
        carry, it, _ = state
        f_before = carry[1]
        carry = step(carry)
        return carry, it + 1, exit_now(f_before, carry)

    carry, _, done = jax.lax.while_loop(
        w_cond, w_body, (init, jnp.asarray(0), jnp.asarray(False))
    )
    if rem:
        carry = jax.lax.cond(done, lambda c: c, make_step(rem), carry)
    return carry


def minimize_lbfgs_fixed(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    n_iter: int,
    memory_size: int = 10,
) -> MinimizeResult:
    """Fixed-iteration, branchless L-BFGS driven by ``lax.scan``.

    TPU-first control flow (same design as the tau M-step Newton,
    ``pgpfa/learn/mstep_gp.py``): no ``while_loop``, no data-dependent
    branching, a FIXED number of iterations — safe to ``vmap`` over trials on
    this TPU (vmapped ``while_loop`` optimizers crash its Mosaic worker; see
    CLAUDE.md) and the idiomatic XLA shape for inner optimizers.

    Per iteration: two-loop recursion over a circular ``memory_size`` history
    (empty slots carry ``rho = 0`` and no-op), then a branchless line search —
    evaluate the full step and a quadratic-interpolation step, keep the best,
    reject non-improving steps (monotone by construction). Rejected or
    curvature-violating steps skip the memory update via masking.

    Parity is defined at converged objective values (SURVEY.md §7), so the
    caller picks ``n_iter`` large enough for its tolerance target and the
    extra iterations past convergence are cheap no-ops (the step is rejected
    once the objective stops improving).
    """
    carry0 = lbfgs_fixed_init(fun, x0, memory_size)
    carry = lbfgs_fixed_steps(fun, carry0, n_iter, x0.shape)
    x, f, g = carry[0], carry[1], carry[2]
    return MinimizeResult(
        x=x.reshape(x0.shape),
        fun=f,
        grad_norm=jnp.max(jnp.abs(g)),
        niter=jnp.asarray(n_iter),
    )


def _lbfgs_fixed_body(fun: Callable[[jnp.ndarray], jnp.ndarray], shape):
    """One fixed-scan L-BFGS iteration as a carry -> carry closure."""
    f_of = lambda xf: fun(xf.reshape(shape))
    vg = jax.value_and_grad(f_of)

    def body(carry):
        x, f, g, S, Ym, rho, gamma = carry
        m = S.shape[0]
        dt = x.dtype
        # two-loop recursion; rho == 0 slots contribute nothing
        q = g
        alphas = [None] * m
        for i in range(m - 1, -1, -1):
            a = rho[i] * jnp.vdot(S[i], q)
            q = q - a * Ym[i]
            alphas[i] = a
        r = gamma * q
        for i in range(m):
            b = rho[i] * jnp.vdot(Ym[i], r)
            r = r + S[i] * (alphas[i] - b)
        p = -r
        slope = jnp.vdot(g, p)
        # safeguard: fall back to steepest descent on a non-descent direction
        bad = ~jnp.isfinite(slope) | (slope >= 0)
        p = jnp.where(bad, -g, p)
        slope = jnp.where(bad, -jnp.vdot(g, g), slope)

        # branchless line search: full step + quadratic-interpolation step
        f1 = f_of(x + p)
        denom = f1 - f - slope
        t_q = jnp.where(denom > 0, -0.5 * slope / jnp.where(denom > 0, denom, 1.0), 1.0)
        t_q = jnp.clip(t_q, 0.05, 2.0)
        f2 = f_of(x + t_q * p)
        f1 = jnp.where(jnp.isfinite(f1), f1, jnp.inf)
        f2 = jnp.where(jnp.isfinite(f2), f2, jnp.inf)
        use2 = f2 < f1
        t = jnp.where(use2, t_q, 1.0)
        f_cand = jnp.minimum(f1, f2)
        accept = f_cand < f
        x_new = jnp.where(accept, x + t * p, x)
        f_new = jnp.where(accept, f_cand, f)
        _, g_new = vg(x_new)

        # masked memory update (only accepted, curvature-positive steps)
        s = x_new - x
        y = g_new - g
        sy = jnp.vdot(s, y)
        valid = accept & (sy > 1e-13 * jnp.sqrt(jnp.vdot(s, s) * jnp.vdot(y, y))) & jnp.isfinite(sy)
        S = jnp.roll(S, -1, axis=0).at[-1].set(jnp.where(valid, s, jnp.zeros_like(s)))
        Ym = jnp.roll(Ym, -1, axis=0).at[-1].set(jnp.where(valid, y, jnp.zeros_like(y)))
        rho = jnp.roll(rho, -1).at[-1].set(jnp.where(valid, 1.0 / jnp.where(valid, sy, 1.0), 0.0))
        gamma = jnp.where(valid, sy / jnp.vdot(y, y), gamma)
        # on a rejected step the quasi-Newton model is stale: flush it so the
        # next iteration restarts from (shrunk) steepest descent
        keep = jnp.where(accept, jnp.ones((), dtype=dt), jnp.zeros((), dtype=dt))
        rho = rho * keep
        gamma = jnp.where(accept, gamma, 0.1 * gamma)
        return (x_new, f_new, g_new, S, Ym, rho, gamma)

    return body


def minimize_newton_scalar(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    maxiter: int = 100,
    tol: float = 1e-12,
    max_backtracks: int = 30,
    grad_fn: Callable = None,
    hess_fn: Callable = None,
) -> MinimizeResult:
    """Safeguarded 1-D Newton minimization with backtracking.

    Used for the per-latent GP-timescale objective in ``p = log gamma`` space
    (one scalar per latent; reference optimizes it with BFGS at
    ``funs/learning.py:283-288``). Falls back to a gradient step when the local
    curvature is not positive.

    Args:
        grad_fn, hess_fn: optional analytic first/second derivatives. Prefer
            these for TPU paths — nested autodiff through factorizations
            inside while_loops compiles catastrophically slowly there.
    """
    if grad_fn is None:
        grad_fn = jax.grad(fun)
    if hess_fn is None:
        hess_fn = jax.grad(jax.grad(fun))
    t_min = 0.5**max_backtracks
    max_step = 5.0  # log-space trust region: steps beyond this are meaningless
    dec_tol = 2e-9  # Newton-decrement stop: remaining decrease ~ g^2/(2h)

    def body(carry):
        x, f, it, stalled = carry
        g = grad_fn(x)
        h = hess_fn(x)
        # Newton-decrement termination: |g| itself has an f64 noise floor
        # proportional to the objective scale, so a pure gradient tolerance
        # can be unreachable; the expected remaining decrease g^2/(2h) is the
        # right absolute criterion (same fix as the Laplace Newton).
        converged = (h > 0) & (g * g / jnp.maximum(h, 1e-30) <= dec_tol)
        # Newton direction; capped gradient direction if curvature is not
        # positive; magnitude clipped to the trust region.
        direction = jnp.where(h > 1e-12, g / jnp.maximum(h, 1e-12), g)
        direction = jnp.clip(direction, -max_step, max_step)
        slope = g * direction  # >= 0 for a descent direction `x - t*direction`
        slack = 1e-13 * (1.0 + jnp.abs(f))

        def ls_cond(ls):
            t, f_try = ls
            bad = ~jnp.isfinite(f_try) | (f_try > f - 1e-4 * t * slope + slack)
            return bad & (t > t_min)

        def ls_body(ls):
            t, _ = ls
            t = 0.5 * t
            return t, fun(x - t * direction)

        t, f_try = jax.lax.while_loop(ls_cond, ls_body, (1.0, fun(x - direction)))
        accept = jnp.isfinite(f_try) & (f_try <= f + slack) & ~converged
        x_next = jnp.where(accept, x - t * direction, x)
        f_next = jnp.where(accept, jnp.minimum(f_try, f), f)
        # A rejected step means the line search is exhausted (or the
        # decrement converged) — terminate instead of spinning to maxiter
        # (lanes run in lockstep under vmap).
        return x_next, f_next, it + 1, ~accept

    def cond(carry):
        x, _, it, stalled = carry
        return (it < maxiter) & ~stalled & (jnp.abs(grad_fn(x)) > tol)

    x, f, it, _ = jax.lax.while_loop(
        cond, body, (x0, fun(x0), jnp.asarray(0), jnp.asarray(False))
    )
    return MinimizeResult(x=x, fun=f, grad_norm=jnp.abs(grad_fn(x)), niter=it)
