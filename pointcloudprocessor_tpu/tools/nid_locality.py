"""Experiment: effect of point ordering on NID evaluation cost (VERDICT r2 #1).

Every NID objective evaluation gathers one nibble-packed tap-table row per
point from the (H*W, 2) table (`opt/nid.nid_histograms`). Culled points
arrive in MAP order, so the ~2M row gathers per evaluation at benchmark
scale hit effectively random rows. This tool measures, on the current
backend, one value+gradient evaluation of `multi_nid_loss` at a chosen
scale with the points in (a) random/map order and (b) projected raster
order (`opt/nid.sort_by_raster`), plus a gather-only microbench isolating
the tap fetch itself.

Repetitions run inside ONE jitted `lax.fori_loop` with a data dependence
between iterations, so per-call tunnel dispatch overhead does not pollute
the per-evaluation number (CLAUDE.md: axon micro-benchmarks are noisy —
run twice, trust deltas).

Usage:
  python -m pointcloudprocessor_tpu.tools.nid_locality            # bench scale
  python -m pointcloudprocessor_tpu.tools.nid_locality --quick    # smoke (CPU ok)
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..models import camera as cam
from ..opt import nid


def build_scene(width, height, n_pts, k):
    """Synthesize K camera-frame keyframes on device: points back-projected
    from uniform-random pixels (map order == random raster order, matching
    the bench's argsort-culled sets), textured bin images."""
    f_px = 4818.2 * (width / 4096.0)
    camera = cam.PinholeCamera(
        intrinsic=jnp.asarray([f_px, f_px, width / 2.0, height / 2.0], jnp.float32),
        distortion=jnp.zeros(5, jnp.float32),
        width=width,
        height=height,
    )

    @jax.jit
    def make(seed):
        def one(key):
            k1, k2, k3 = jax.random.split(key, 3)
            u = jax.random.uniform(k1, (n_pts,), jnp.float32, 2.0, width - 3.0)
            v = jax.random.uniform(k2, (n_pts,), jnp.float32, 2.0, height - 3.0)
            z = jax.random.uniform(k3, (n_pts,), jnp.float32, 4.0, 8.0)
            x = (u - width / 2.0) / f_px * z
            y = (v - height / 2.0) / f_px * z
            pts = jnp.stack([x, y, z], -1)
            inten = jnp.clip(
                0.5 + 0.25 * jnp.sin(0.01 * u) + 0.25 * jnp.cos(0.013 * v), 0.0, 1.0
            )
            uu = jnp.arange(width, dtype=jnp.float32)[None, :]
            vv = jnp.arange(height, dtype=jnp.float32)[:, None]
            img = jnp.clip(
                0.5 + 0.25 * jnp.sin(0.01 * uu) + 0.25 * jnp.cos(0.013 * vv), 0.0, 1.0
            )
            return pts, inten, nid.quantize_image(img, 16)

        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        pts, inten, bins = jax.lax.map(one, keys)
        return pts, inten, bins

    pts, inten, bins = jax.block_until_ready(make(0))
    kfs = nid.NIDKeyframe(
        points=pts,
        intensity=inten,
        valid=jnp.ones((k, n_pts), bool),
        bin_image=bins,
    )
    return camera, kfs


@functools.partial(jax.jit, static_argnames=("reps", "use_grouped"))
def timed_val_grad(camera, kfs, xi0, reps, use_grouped=None):
    """Sum of `reps` chained value+grad evaluations (serialized by a data
    dependence through xi, mimicking optimizer iterates). ``use_grouped``
    A/Bs the round-4 grouped slab gather (ops/tap_gather) against the
    per-point take."""

    def loss(x):
        return nid.multi_nid_loss(camera, se3.exp(x), kfs, use_grouped=use_grouped)

    def body(_, carry):
        x, acc = carry
        v, g = jax.value_and_grad(loss)(x)
        return (x + 1e-7 * g, acc + v)

    return jax.lax.fori_loop(0, reps, body, (xi0, jnp.float32(0.0)))


@functools.partial(jax.jit, static_argnames=("reps", "use_grouped"))
def timed_gather_flat(camera, kfs, xi0, reps, use_grouped):
    """Gather-only via the production `_gather_taps` path (flattened over
    keyframes; grouped or per-point take)."""

    def one_eval(x):
        T = se3.exp(x)
        proj, knot, inl = nid._project_all(camera, T, kfs)
        taps = nid._gather_taps(camera, kfs, knot, inl, use_grouped)
        return jnp.sum(taps.astype(jnp.float32))

    def body(_, carry):
        x, acc = carry
        s = one_eval(x)
        return (x + 1e-12 * s, acc + s)

    return jax.lax.fori_loop(0, reps, body, (xi0, jnp.float32(0.0)))


@functools.partial(jax.jit, static_argnames=("reps",))
def timed_gather(camera, kfs, xi0, reps):
    """Gather-only: project + anchor + tap-table row fetch, reduced."""

    def one_eval(x):
        T = se3.exp(x)

        def per_kf(p, t_rows):
            pts_cam = se3.transform_points(T, p)
            proj = cam.project(camera, pts_cam)
            knot = jnp.floor(proj).astype(jnp.int32)
            anchor = (
                jnp.clip(knot[:, 1], 0, camera.height - 1) * camera.width
                + jnp.clip(knot[:, 0], 0, camera.width - 1)
            )
            taps = jnp.take(t_rows, anchor, axis=0)
            return jnp.sum(taps.astype(jnp.float32))

        return jnp.sum(jax.vmap(per_kf)(kfs.points, kfs.tap_rows))

    def body(_, carry):
        x, acc = carry
        s = one_eval(x)
        return (x + 1e-12 * s, acc + s)

    return jax.lax.fori_loop(0, reps, body, (xi0, jnp.float32(0.0)))


def run_case(fn, camera, kfs, reps, label):
    xi0 = jnp.zeros(6, jnp.float32)
    out = jax.block_until_ready(fn(camera, kfs, xi0, reps))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(camera, kfs, xi0, reps))
        times.append((time.perf_counter() - t0) / reps * 1e3)
    print(
        f"# {label}: {times[0]:.2f} / {times[1]:.2f} ms per eval"
        f" (acc {float(out[1]):.4f})",
        file=sys.stderr,
    )
    return min(times), float(out[1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    try:
        import os

        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # pragma: no cover
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    if args.quick:
        width, height, n_pts, k = 512, 384, 32_768, 4
    else:
        width, height, n_pts, k = 4096, 3000, 262_144, 8

    camera, kfs_rand = build_scene(width, height, n_pts, k)
    kfs_sorted = nid.sort_by_raster(camera, se3.identity(), kfs_rand)
    # Jit the preparation as ONE program: eagerly, the (K, H*W, 2) tap
    # table and its slab reshape each cross an op boundary, where XLA may
    # pick the tile-padded (K, R, 2) layout (minor dim 2 pads to 128 lanes
    # = 50 GB at this scale — measured OOM; see ops/tap_gather docstring).
    # build_slabs=True: the grouped/streamed A/B cases need the slab table
    # even though the production default is off — without it _gather_taps
    # silently (and correctly) falls back to the direct take and the A/B
    # measures nothing.
    prepare = jax.jit(functools.partial(nid.prepare_keyframes, build_slabs=True))
    kfs_rand = prepare(kfs_rand)
    kfs_sorted = jax.block_until_ready(prepare(kfs_sorted))
    print("# scene built", file=sys.stderr)

    r = args.reps
    g_rand, _ = run_case(timed_gather, camera, kfs_rand, r, "gather-only, map order")
    g_sort, _ = run_case(timed_gather, camera, kfs_sorted, r, "gather-only, raster order")
    e_rand, _ = run_case(timed_val_grad, camera, kfs_rand, r, "value+grad, map order")
    e_sort, _ = run_case(timed_val_grad, camera, kfs_sorted, r, "value+grad, raster order")

    # Round-4 grouped slab gather (ops/tap_gather) A/B on the production
    # path: grouped on sorted points is the design point; grouped on MAP
    # order must fall back to the plain take (sanity: ~= g_rand).
    def with_grouped(fn, grouped):
        return lambda c, kk, x, rr: fn(c, kk, x, rr, use_grouped=grouped)

    gg_sort, _ = run_case(with_grouped(timed_gather_flat, True), camera, kfs_sorted,
                          r, "gather GROUPED, raster order")
    gg_rand, _ = run_case(with_grouped(timed_gather_flat, True), camera, kfs_rand,
                          r, "gather grouped-fallback, map order")
    gs_sort, _ = run_case(with_grouped(timed_gather_flat, "streamed"), camera,
                          kfs_sorted, r, "gather STREAMED, raster order")
    ge_sort, acc_g = run_case(with_grouped(timed_val_grad, True), camera, kfs_sorted,
                              r, "value+grad GROUPED, raster order")
    gse_sort, acc_s = run_case(with_grouped(timed_val_grad, "streamed"), camera,
                               kfs_sorted, r, "value+grad STREAMED, raster order")
    gd_sort, acc_d = run_case(with_grouped(timed_val_grad, False), camera, kfs_sorted,
                              r, "value+grad direct take, raster order")

    # ON-CHIP exactness tripwire: the grouped/streamed gathers are claimed
    # bit-identical to the direct take, so the chained objective
    # accumulators MUST match exactly. Round 4 caught a silent Mosaic
    # divergence exactly here (the TPU default's single-bf16-pass dot
    # rounding the u16 selection operands) that interpret-mode tests
    # cannot see.
    assert acc_g == acc_d, f"GROUPED diverges from direct: {acc_g} vs {acc_d}"
    assert acc_s == acc_d, f"STREAMED diverges from direct: {acc_s} vs {acc_d}"

    print(json.dumps({
        "metric": "nid_eval_ms",
        "map_order_ms": round(e_rand, 2),
        "raster_order_ms": round(e_sort, 2),
        "speedup": round(e_rand / e_sort, 2),
        "gather_map_ms": round(g_rand, 2),
        "gather_raster_ms": round(g_sort, 2),
        "grouped_gather_ms": round(gg_sort, 2),
        "grouped_gather_fallback_ms": round(gg_rand, 2),
        "streamed_gather_ms": round(gs_sort, 2),
        "grouped_eval_ms": round(ge_sort, 2),
        "streamed_eval_ms": round(gse_sort, 2),
        "direct_eval_ms": round(gd_sort, 2),
        "grouped_eval_speedup": round(gd_sort / ge_sort, 2),
        "streamed_eval_speedup": round(gd_sort / gse_sort, 2),
        "backend": jax.default_backend(),
        "scale": f"{k}x{n_pts}@{width}x{height}",
    }))


if __name__ == "__main__":
    main()
