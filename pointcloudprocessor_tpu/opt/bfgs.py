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
    H: jnp.ndarray = 0.0  # final inverse-Hessian approximation (d, d) —
    # lets callers warm-start the next related solve (opt/refine.py's
    # outer loop re-solves the SAME objective from a nearby pose)


def minimize(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iterations: int = 64,
    grad_tol: float = 1e-6,
    step_tol: float = 1e-10,
    armijo_c1: float = 1e-4,
    max_backtracks: int = 25,
    H0: jnp.ndarray | None = None,
    ftol=0.0,
    scale_initial=True,
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
        H0=H0,
        ftol=ftol,
        scale_initial=scale_initial,
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
    H0: jnp.ndarray | None = None,
    ftol=0.0,
    scale_initial=True,
):
    """BFGS over an objective with a carried evaluation cache.

    ``vg_c(x, cache) -> (value, grad, cache')`` may mutate its cache on any
    evaluation (e.g. the frozen-tap NID gather, `opt/nid.TapCache`: probes
    reuse the last gather until anchors drift). The cache threads through
    the line search and iteration loops and the final cache is returned —
    ``minimize`` is this with an empty cache. Returns (BFGSResult, cache).

    ``H0``: warm-start inverse-Hessian approximation (d, d). Ceres' BFGS
    has no analogue (every `ceres::Solve` starts from identity,
    `visual_camera_calibration.cpp:204-233`).

    ``scale_initial`` (traced bool): apply the classic first-update scaling
    H = (sy/yy) I. Callers warm-starting from a calibrated H pass False so
    the carried metric is not thrown away.

    ``ftol`` (traced): converge when an accepted step decreases the value
    by less than ``ftol * (|f| + 1e-12)`` — the function_tolerance exit
    Ceres applies by default (GradientProblemSolver function_tolerance,
    used at :204); 0 disables (value-agnostic, the round-4 behavior).
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
            alpha, rej_val, rej_g, it, cache = state
            # Every probe evaluates value AND gradient (see docstring), so a
            # rejected probe gives a full cubic Hermite model on [0, alpha]
            # for free — f(0)=val, f'(0)=dg, f(a)=rej_val, f'(a)=da
            # (Nocedal & Wright eq. 3.59). Its minimizer lands near the
            # valley in one step where the value-only quadratic or blind
            # halving take several, and each saved probe is a whole
            # multi-keyframe NID evaluation. Fallbacks: quadratic model when
            # the cubic is invalid/out-of-range, halving for +inf probes
            # (trust-region rejections carry no curvature information —
            # their gradient is 0 through the jnp.where).
            da = jnp.dot(rej_g, direction)
            d1 = dg + da + 3.0 * (val - rej_val) / alpha
            rad = d1 * d1 - dg * da
            d2 = jnp.sqrt(jnp.maximum(rad, 0.0))
            cubic = alpha - alpha * (da + d2 - d1) / (da - dg + 2.0 * d2)
            denom = rej_val - val - dg * alpha
            quad = -dg * alpha * alpha / (2.0 * jnp.where(denom > 0, denom, 1.0))
            finite = jnp.isfinite(rej_val)
            cubic_ok = (
                finite
                & (rad >= 0)
                & jnp.isfinite(cubic)
                & (cubic >= 0.05 * alpha)
                & (cubic <= 0.75 * alpha)
            )
            quad_ok = finite & (denom > 0)
            a = jnp.where(
                cubic_ok,
                cubic,
                jnp.where(
                    quad_ok,
                    jnp.clip(quad, 0.1 * alpha, 0.5 * alpha),
                    alpha * 0.5,
                ),
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
        eye if H0 is None else H0,
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

        # First iteration under an identity metric: a raw step of size |g|
        # overshoots badly for steep objectives and burns ~log2|g|
        # backtracks; start from the Nocedal-Wright alpha0 = min(1, 1/|g|)
        # instead. Under a WARM-started metric (scale_initial False) the
        # direction is already well-sized — probe the unit step. Later
        # iterations warm-start from 1.5x the last accepted step (clamped
        # to 1): when the objective systematically rejects alpha=1, this
        # saves the rejected first probe while still growing back toward
        # unit steps.
        first_alpha = jnp.where(
            scale_initial,
            jnp.minimum(1.0, 1.0 / (jnp.linalg.norm(st.g) + 1e-12)),
            1.0,
        ).astype(dtype)
        alpha0 = jnp.where(
            st.it == 0,
            first_alpha,
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
        # Skipped under a warm-started H0 — the caller's metric is already
        # calibrated and rescaling would throw that information away.
        H_base = jnp.where(
            (st.it == 0) & (sy > 1e-12) & (yy > 1e-12) & scale_initial,
            (sy / jnp.maximum(yy, 1e-20)) * eye,
            st.H,
        )
        V = eye - rho * jnp.outer(s, y)
        H_new = V @ H_base @ V.T + rho * jnp.outer(s, s)
        H_new = jnp.where(sy > 1e-12, H_new, st.H)

        stalled = alpha == 0.0
        moved = jnp.linalg.norm(step)
        # Value-based exit (Ceres function_tolerance semantics): an accepted
        # step that barely moved the objective means the remaining descent
        # is below ftol relative — further iterations burn evaluations on
        # the plateau the outer loop's pose-based convergence ignores.
        rel_drop_small = (st.val - val_new) <= ftol * (
            jnp.abs(val_new) + 1e-12
        )
        done = (
            stalled
            | (jnp.linalg.norm(g_new) < grad_tol)
            | (moved < step_tol)
            | ((ftol > 0) & ~stalled & rel_drop_small)
        )

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
            H=final.H,
        ),
        final.cache,
    )
