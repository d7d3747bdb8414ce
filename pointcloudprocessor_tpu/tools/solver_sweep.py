"""Sweep the inner-solve function-decrease exit (ftol) on the HEADLINE
frozen+coarse-to-fine schedule at bench scale (VERDICT r4 #6: attack the
~39 evaluations/solve; every variant's count has been flat since round 3).

``ftol`` is a TRACED argument of `opt/refine.refine_pose` (Ceres
function_tolerance semantics: stop the inner BFGS when an accepted step
improves the value by less than ftol * |f|), so the whole sweep shares one
compiled executable. Each row reports refine seconds (median of 3 chained
calls, floor tripwire), evaluations, gathers, the EXACT final NID, and the
pose error vs the scene's known ground truth — the accuracy cost of the
early exit is measured, not assumed.

Usage: python -m pointcloudprocessor_tpu.tools.solver_sweep
           [--quick] [--ftols 0,1e-5,3e-5,1e-4,3e-4]
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
    ap.add_argument("--ftols", default="0,1e-5,3e-5,1e-4,3e-4")
    ap.add_argument("--guards", default="",
                    help="optional guard sweep (comma floats); when set, "
                         "ftol is fixed to the first --ftols entry and the "
                         "guard becomes the swept axis")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    kfs2 = build_bench_scene(width, height, n_map, n_cull, k, scene=2)[6]
    reps = args.reps

    # The bench headline config: stride-16 coarse phase + frozen fine phase
    # at guard 0.75 (bench.py frozen_c2f) — but with a deeper inner budget
    # (20 vs the bench's 10): scene 2's sharper NID basin under-converges at
    # 10 (round-5 bench: 1.5-1.6 cm vs a reachable 0.25 cm minimum), and
    # ftol is exactly the knob that lets scene 1 exit early while scene 2
    # spends the extra iterations it needs.
    kw = dict(
        max_inner_iterations=int(os.environ.get("SWEEP_INNER", "20")),
        max_outer_iterations=1,
        coarse_outer_iterations=1,
        coarse_stride=16,
        frozen_taps=True,
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(kfs_in, T_start, ftol, guard, reps):
        def body(i, carry):
            T_s, _ = carry
            res = refine.refine_pose(
                camera, kfs_in, T_s, ftol=ftol, frozen_guard_frac=guard, **kw
            )
            z = jnp.float32(0.0)
            eps = 1e-6 * (i.astype(jnp.float32) + 1.0) + 1e-9 * jnp.tanh(
                jnp.sum(res.T_camera_lidar.t))
            return (se3.compose(T_start, se3.exp(jnp.stack([eps, z, z, z, eps, z]))), res)

        placeholder = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype),
            jax.eval_shape(lambda: refine.refine_pose(
                camera, kfs_in, T_start, ftol=ftol, frozen_guard_frac=guard,
                **kw)),
        )
        _, res = jax.lax.fori_loop(0, reps, body, (T_start, placeholder))
        return res

    scale = (n_cull * k) / (262_144.0 * 8.0)
    min_s = 0.03 * scale * reps
    results = []
    if args.guards:
        # Guard-axis mode: sweep the staleness guard under the tuned
        # schedule (ftol fixed); rows reuse the same executable.
        sweep = [("guard", float(g)) for g in args.guards.split(",")]
        fixed_ftol = float(args.ftols.split(",")[0])
    else:
        sweep = [("ftol", float(x)) for x in args.ftols.split(",")]
    for si, (scene_kfs, scene_tag) in enumerate(((kfs, "s1"), (kfs2, "s2"))):
        for fi, (axis, f) in enumerate(sweep):
            if axis == "guard":
                ftol, guard = jnp.float32(fixed_ftol), jnp.float32(f)
            else:
                ftol, guard = jnp.float32(f), jnp.float32(0.75)
            r = chain(scene_kfs, T0, ftol, guard, reps)
            r.T_camera_lidar.t.block_until_ready()
            if fi == 0 and si == 0:
                print("# compiled", file=sys.stderr)
            walls = []
            attempt = 0
            while len(walls) < 3 and attempt < 6:
                eps = jnp.asarray(
                    [1e-6 * (50 * si + 10 * fi + attempt + 3), 0, 0, 0, 0, 0],
                    jnp.float32,
                )
                t0 = time.perf_counter()
                r = chain(scene_kfs, se3.compose(T0, se3.exp(eps)), ftol, guard, reps)
                r.T_camera_lidar.t.block_until_ready()
                wall = time.perf_counter() - t0
                attempt += 1
                if wall < min_s:
                    print(f"# bogus axon wall for ftol {f} ({wall*1e3:.2f} ms)"
                          " — retry", file=sys.stderr)
                    continue
                walls.append(wall / reps)
            dt_w = sorted(walls)[len(walls) // 2] if walls else float("nan")
            derr, rerr = se3.delta_magnitudes(
                r.T_camera_lidar, se3.identity(r.T_camera_lidar.t.dtype)
            )
            row = {
                "scene": scene_tag,
                axis: f,
                "refine_s": round(dt_w, 4),
                "refine_s_calls": [round(w, 4) for w in walls],
                "nid": round(float(r.nid), 4),
                "evaluations": int(r.evaluations),
                "gathers": int(r.gathers),
                "pose_err_cm": round(float(derr) * 100.0, 4),
                "pose_err_deg": round(float(np.degrees(np.asarray(rerr))), 5),
            }
            results.append(row)
            print(json.dumps(row))
    # Best = fastest swept value whose pose error stays within the
    # reference bar on BOTH scenes.
    axis = "guard" if args.guards else "ftol"
    by_ftol = {}
    for r in results:
        by_ftol.setdefault(r[axis], []).append(r)
    ok = [
        f for f, rows in by_ftol.items()
        if all(r["pose_err_cm"] < 1.0 and r["pose_err_deg"] < 1.0 for r in rows)
    ]
    if ok:
        best_f = min(
            ok, key=lambda f: sum(r["refine_s"] for r in by_ftol[f])
        )
        print(json.dumps({
            "metric": f"solver_{axis}_sweep_best",
            axis: best_f,
            "rows": by_ftol[best_f],
        }))
    else:
        print(json.dumps({"metric": f"solver_{axis}_sweep_best", axis: None,
                          "note": "no value met the 1 cm/1 deg bar on both scenes"}))


if __name__ == "__main__":
    main()
