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
    evaluations: jnp.ndarray  # total value_and_grad calls (objective cost)


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
    vg = jax.value_and_grad(f)

    def vg_c(x, cache):
        v, g = vg(x)
        return v, g, cache

    res, _ = minimize_cached(
        vg_c,
        x0,
        (),
        max_iterations=max_iterations,
        grad_tol=grad_tol,
        step_tol=step_tol,
        armijo_c1=armijo_c1,
        max_backtracks=max_backtracks,
    )
    return res


def minimize_cached(
    vg_c: Callable,
    x0: jnp.ndarray,
    cache0,
    max_iterations: int = 64,
    grad_tol: float = 1e-6,
    step_tol: float = 1e-10,
    armijo_c1: float = 1e-4,
    max_backtracks: int = 25,
):
    """BFGS over an objective with a carried evaluation cache.

    ``vg_c(x, cache) -> (value, grad, cache')`` may mutate its cache on any
    evaluation (e.g. the frozen-tap NID gather, `opt/nid.TapCache`: probes
    reuse the last gather until anchors drift). The cache threads through
    the line search and iteration loops and the final cache is returned —
    ``minimize`` is this with an empty cache. Returns (BFGSResult, cache).
    """
    d = x0.shape[0]
    dtype = x0.dtype
    eye = jnp.eye(d, dtype=dtype)

    def line_search(x, direction, val, g, alpha0, cache):
        """Backtracking Armijo; also backtracks out of +inf (rejected)
        regions. Every probe evaluates value AND gradient in one pass —
        for reduction-dominated objectives (the NID sum) the gradient adds
        ~5% to a forward evaluation, so probing with value_and_grad and
        returning the accepted step's gradient is ~1/3 cheaper per BFGS
        iteration than probing value-only and re-evaluating value+grad at
        the accepted point."""
        dg = jnp.dot(g, direction)

        def accepted(alpha, new_val):
            return jnp.isfinite(new_val) & (new_val <= val + armijo_c1 * alpha * dg)

        def cond(state):
            alpha, new_val, _, it, _ = state
            return ~accepted(alpha, new_val) & (it < max_backtracks)

        def body(state):
            alpha, rej_val, _, it, cache = state
            # Quadratic interpolation through f(0)=val, f'(0)=dg and the
            # rejected probe f(alpha)=rej_val: the model minimizer is
            # -dg a^2 / (2 (f(a) - f(0) - dg a)). Each rejected probe costs a
            # full multi-keyframe NID evaluation, so landing near the valley
            # in one interpolated step instead of blind halving saves whole
            # objective evaluations (Nocedal & Wright 3.5). Clamped to
            # [alpha/10, alpha/2] for safety; +inf probes (trust-region
            # rejections) carry no curvature information — halve those.
            denom = rej_val - val - dg * alpha
            interp = -dg * alpha * alpha / (2.0 * jnp.where(denom > 0, denom, 1.0))
            a = jnp.where(
                jnp.isfinite(rej_val) & (denom > 0),
                jnp.clip(interp, 0.1 * alpha, 0.5 * alpha),
                alpha * 0.5,
            )
            new_val, new_g, cache = vg_c(x + a * direction, cache)
            return (a, new_val, new_g, it + 1, cache)

        v0, g0, cache = vg_c(x + alpha0 * direction, cache)
        alpha, new_val, new_g, it, cache = jax.lax.while_loop(
            cond, body, (alpha0, v0, g0, 0, cache)
        )
        ok = accepted(alpha, new_val)
        return (
            jnp.where(ok, alpha, 0.0),
            jnp.where(ok, new_val, val),
            jnp.where(ok, new_g, g),
            it + 1,  # total probes = backtracks + the alpha0 evaluation
            cache,
        )

    class State(NamedTuple):
        x: jnp.ndarray
        val: jnp.ndarray
        g: jnp.ndarray
        H: jnp.ndarray  # inverse Hessian approximation
        it: jnp.ndarray
        done: jnp.ndarray
        prev_alpha: jnp.ndarray  # accepted step size of the last iteration
        evals: jnp.ndarray  # cumulative value_and_grad calls
        cache: object  # objective evaluation cache (any pytree)

    val0, g0, cache0 = vg_c(x0, cache0)
    s0 = State(
        x0,
        val0,
        g0,
        eye,
        jnp.asarray(0, jnp.int32),
        jnp.linalg.norm(g0) < grad_tol,
        jnp.asarray(1.0, dtype),
        jnp.asarray(1, jnp.int32),
        cache0,
    )

    def cond(st: State):
        return (~st.done) & (st.it < max_iterations)

    def body(st: State):
        direction = -(st.H @ st.g)
        # Guard: if direction is not a descent direction (H lost positive
        # definiteness numerically), fall back to steepest descent.
        descent = jnp.dot(direction, st.g) < 0
        direction = jnp.where(descent, direction, -st.g)

        # First iteration (H = I): a raw step of size |g| overshoots badly
        # for steep objectives and burns ~log2|g| backtracks; start from the
        # Nocedal-Wright alpha0 = min(1, 1/|g|) instead. Later iterations
        # warm-start from 1.5x the last accepted step (clamped to 1): when
        # the objective systematically rejects alpha=1, this saves the
        # rejected first probe while still growing back toward unit steps.
        alpha0 = jnp.where(
            st.it == 0,
            jnp.minimum(1.0, 1.0 / (jnp.linalg.norm(st.g) + 1e-12)).astype(dtype),
            jnp.clip(1.5 * st.prev_alpha, 1.0 / 16.0, 1.0).astype(dtype),
        )
        alpha, val_new, g_new, probes, cache = line_search(
            st.x, direction, st.val, st.g, alpha0, st.cache
        )
        step = alpha * direction
        x_new = st.x + step

        s = step
        y = g_new - st.g
        sy = jnp.dot(s, y)
        yy = jnp.dot(y, y)
        rho = jnp.where(sy > 1e-12, 1.0 / jnp.where(sy > 1e-12, sy, 1.0), 0.0)
        # Classic initial-Hessian scaling on the first update: H0 = (sy/yy) I
        # calibrates the metric so subsequent unit steps are well-sized.
        H_base = jnp.where(
            (st.it == 0) & (sy > 1e-12) & (yy > 1e-12),
            (sy / jnp.maximum(yy, 1e-20)) * eye,
            st.H,
        )
        V = eye - rho * jnp.outer(s, y)
        H_new = V @ H_base @ V.T + rho * jnp.outer(s, s)
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
            prev_alpha=jnp.where(stalled, st.prev_alpha, alpha),
            evals=st.evals + probes,
            # A rejected probe's refresh is still a valid memo — but note the
            # surrogate-generation subtlety: if a probe triggered a cache
            # refresh and was then rejected, the carried incumbent (val, g)
            # was computed under the PRE-refresh cache while later probes use
            # the post-refresh cache, so one Armijo comparison mixes surrogate
            # generations. The mix is bounded by the frozen-tap guard (~1e-4
            # NID, the same order as the objective's plateau — measured in
            # opt/nid.multi_nid_loss_cached's docstring), can at worst accept
            # one non-descent step of that magnitude or flip one stall
            # decision, and the solve-level objective-parity tests
            # (tests/test_nid.py) bound the end-to-end effect. Re-evaluating
            # the incumbent after every refresh would cost a frozen eval per
            # refresh for a plateau-sized correction — not worth it.
            cache=cache,
        )

    final = jax.lax.while_loop(cond, body, s0)
    return (
        BFGSResult(
            x=final.x,
            value=final.val,
            grad_norm=jnp.linalg.norm(final.g),
            iterations=final.it,
            converged=final.done,
            evaluations=final.evals,
        ),
        final.cache,
    )
