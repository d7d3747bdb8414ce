"""Sweep the frozen-tap staleness guard on the benchmark scene (real chip).

``frozen_guard_frac`` bounds how far the solve may ride the frozen-gather
surrogate before re-gathering (fraction of live points whose anchor drifted
>= 1 px). Small guards re-gather often (fresh evaluations cost ~28.5 ms at
benchmark scale, README "NID kernel cost anatomy"); large guards risk the
surrogate-wander pathology seen on the toy scene at guard 0.5 (evaluation
count exploded 5x). The guard is a TRACED argument of
`opt/refine.refine_pose`, so the whole sweep shares one compiled
executable. Timing uses the chained-repetition pattern (CLAUDE.md: host-loop
repeat walls over the axon tunnel are untrustworthy).

Usage: python -m pointcloudprocessor_tpu.tools.frozen_guard_sweep
           [--quick] [--guards 0.25,0.5,0.75,1.0]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--guards", default="0.25,0.5,0.75,1.0")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # pragma: no cover
        print(f"# cache unavailable: {e}", file=sys.stderr)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from bench import build_bench_scene

    from ..core import se3
    from ..opt import refine

    if args.quick:
        width, height, n_map, n_cull, k = 512, 384, 100_000, 32_768, 4
    else:
        width, height, n_map, n_cull, k = 4096, 3000, 1_000_000, 262_144, 8

    camera, poses, points, inten, valid, images, kfs, T0 = build_bench_scene(
        width, height, n_map, n_cull, k
    )
    reps = args.reps

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(kfs_in, T_start, guard, reps):
        def body(i, carry):
            T_s, _ = carry
            res = refine.refine_pose(
                camera, kfs_in, T_s,
                max_inner_iterations=10, max_outer_iterations=2,
                frozen_taps=True, frozen_guard_frac=guard,
            )
            z = jnp.float32(0.0)
            eps = 1e-6 * (i.astype(jnp.float32) + 1.0) + 1e-9 * jnp.tanh(
                jnp.sum(res.T_camera_lidar.t))
            return (se3.compose(T_start, se3.exp(jnp.stack([eps, z, z, z, eps, z]))), res)

        placeholder = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype),
            jax.eval_shape(lambda: refine.refine_pose(
                camera, kfs_in, T_start,
                max_inner_iterations=10, max_outer_iterations=2,
                frozen_taps=True, frozen_guard_frac=guard,
            )),
        )
        _, res = jax.lax.fori_loop(0, reps, body, (T_start, placeholder))
        return res

    # Per-guard protocol = the bench headline's (CLAUDE.md): MEDIAN of three
    # chained calls, each with freshly perturbed start poses, plus a
    # physical-floor tripwire (scale-derived minimum credible wall — a
    # frozen-heavy solve still runs dozens of multi-ms evaluations). Round 3
    # timed each guard with a single wall and its guard-0.25 row came out
    # 26x first-call inflated; the sweep picks the bench's default guard, so
    # it deserves trustworthy numbers.
    scale = (n_cull * k) / (262_144.0 * 8.0)
    min_s = 0.05 * scale * reps
    results = []
    for gi, g in enumerate(float(x) for x in args.guards.split(",")):
        guard = jnp.float32(g)
        # Warm-up compiles once (guard is traced); later guards reuse it.
        r = chain(kfs, T0, guard, reps)
        r.T_camera_lidar.t.block_until_ready()
        if gi == 0:
            print("# compiled", file=sys.stderr)
        walls = []
        attempt = 0
        while len(walls) < 3 and attempt < 6:
            eps = jnp.asarray(
                [1e-6 * (10 * gi + attempt + 3), 0, 0, 0, 0, 0], jnp.float32
            )
            t0 = time.perf_counter()
            r = chain(kfs, se3.compose(T0, se3.exp(eps)), guard, reps)
            r.T_camera_lidar.t.block_until_ready()
            wall = time.perf_counter() - t0
            attempt += 1
            if wall < min_s:
                print(
                    f"# bogus axon wall for guard {g} ({wall * 1e3:.2f} ms < "
                    f"{min_s * 1e3:.0f} ms floor) — retrying", file=sys.stderr,
                )
                continue
            walls.append(wall / reps)
        dt = sorted(walls)[len(walls) // 2] if walls else float("nan")
        row = {
            "guard": g,
            "refine_s": round(dt, 4),
            "refine_s_calls": [round(w, 4) for w in walls],
            "frames_per_s_refine_only": round(k / dt, 3),
            "nid": round(float(r.nid), 4),
            "evaluations": int(r.evaluations),
            "gathers": int(r.gathers),
        }
        results.append(row)
        print(json.dumps(row))
    best = min(results, key=lambda r: r["refine_s"])
    print(json.dumps({"metric": "frozen_guard_sweep_best", **best}))


if __name__ == "__main__":
    main()
