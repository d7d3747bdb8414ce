"""Jittable BFGS with Armijo backtracking line search.

Replaces the reference's `ceres::GradientProblemSolver` BFGS inner solve
(`PointCloudProcessor/src/vlcal/calib/visual_camera_calibration.cpp:204-233`)
with a `lax.while_loop` solver over a small dense parameter vector (the
SE(3) tangent is 6-dim, so the O(d^2) inverse-Hessian update is trivial next
to the objective's huge reductions — the whole optimization stays on device,
no host ping-pong per iteration).

The objective may return +inf to reject iterates (the trust-region guard of
`MultiNIDCost::operator()` :102 returns false there); the line search then
backtracks, reproducing Ceres' failed-evaluation behavior.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class BFGSResult(NamedTuple):
    x: jnp.ndarray
    value: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def minimize(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iterations: int = 64,
    grad_tol: float = 1e-6,
    step_tol: float = 1e-10,
    armijo_c1: float = 1e-4,
    max_backtracks: int = 25,
) -> BFGSResult:
    """Minimize ``f`` from ``x0`` (1-D vector). Fully traceable."""
    d = x0.shape[0]
    dtype = x0.dtype
    eye = jnp.eye(d, dtype=dtype)
    vg = jax.value_and_grad(f)

    def line_search(x, direction, val, g):
        """Backtracking Armijo; also backtracks out of +inf (rejected) regions."""
        dg = jnp.dot(g, direction)

        def cond(state):
            alpha, ok, it = state
            new_val = f(x + alpha * direction)
            insufficient = ~(new_val <= val + armijo_c1 * alpha * dg) | ~jnp.isfinite(new_val)
            return insufficient & (it < max_backtracks)

        def body(state):
            alpha, ok, it = state
            return (alpha * 0.5, ok, it + 1)

        alpha0 = jnp.asarray(1.0, dtype)
        alpha, _, it = jax.lax.while_loop(cond, body, (alpha0, True, 0))
        new_val = f(x + alpha * direction)
        ok = jnp.isfinite(new_val) & (new_val <= val + armijo_c1 * alpha * dg)
        return jnp.where(ok, alpha, 0.0), it

    class State(NamedTuple):
        x: jnp.ndarray
        val: jnp.ndarray
        g: jnp.ndarray
        H: jnp.ndarray  # inverse Hessian approximation
        it: jnp.ndarray
        done: jnp.ndarray

    val0, g0 = vg(x0)
    s0 = State(x0, val0, g0, eye, jnp.asarray(0, jnp.int32), jnp.linalg.norm(g0) < grad_tol)

    def cond(st: State):
        return (~st.done) & (st.it < max_iterations)

    def body(st: State):
        direction = -(st.H @ st.g)
        # Guard: if direction is not a descent direction (H lost positive
        # definiteness numerically), fall back to steepest descent.
        descent = jnp.dot(direction, st.g) < 0
        direction = jnp.where(descent, direction, -st.g)

        alpha, _ = line_search(st.x, direction, st.val, st.g)
        step = alpha * direction
        x_new = st.x + step
        val_new, g_new = vg(x_new)

        s = step
        y = g_new - st.g
        sy = jnp.dot(s, y)
        rho = jnp.where(sy > 1e-12, 1.0 / jnp.where(sy > 1e-12, sy, 1.0), 0.0)
        V = eye - rho * jnp.outer(s, y)
        H_new = V @ st.H @ V.T + rho * jnp.outer(s, s)
        H_new = jnp.where(sy > 1e-12, H_new, st.H)

        stalled = alpha == 0.0
        moved = jnp.linalg.norm(step)
        done = stalled | (jnp.linalg.norm(g_new) < grad_tol) | (moved < step_tol)

        keep_old = stalled
        return State(
            x=jnp.where(keep_old, st.x, x_new),
            val=jnp.where(keep_old, st.val, val_new),
            g=jnp.where(keep_old, st.g, g_new),
            H=jnp.where(keep_old, st.H, H_new),
            it=st.it + 1,
            done=done,
        )

    final = jax.lax.while_loop(cond, body, s0)
    return BFGSResult(
        x=final.x,
        value=final.val,
        grad_norm=jnp.linalg.norm(final.g),
        iterations=final.it,
        converged=final.done,
    )
