"""Bisect the NID evaluation cost on the real chip (round-3 perf hunt).

The round-3 profile (see tools/nid_locality.py + the trace parse) shows one
XLA fusion at ~22.8 ms of the ~25.8 ms device time per value+grad eval at
benchmark scale, while the fused Pallas histogram kernels cost ~2 ms
combined. This tool times stripped-down variants of the forward NID to
attribute that fusion: projection-only, +gather, gather flavors
(take vs lax.gather sorted-hint), one-hot marginal, full forward, full
value+grad.

Usage: python -m pointcloudprocessor_tpu.tools.nid_bisect [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from ..core import se3
from ..models import camera as cam
from ..opt import nid
from .nid_locality import build_scene


def _loop(reps, body, init):
    return jax.lax.fori_loop(0, reps, body, init)


def _project_parts(camera, T, p):
    pts_cam = se3.transform_points(T, p)
    proj = cam.project(camera, pts_cam)
    knot = jnp.floor(jax.lax.stop_gradient(proj)).astype(jnp.int32)
    anchor = (
        jnp.clip(knot[:, 1], 0, camera.height - 1) * camera.width
        + jnp.clip(knot[:, 0], 0, camera.width - 1)
    )
    return proj, knot, anchor


def make_variant(name):
    """Each variant: (camera, kfs, xi, reps) -> scalar-chained fori_loop."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(camera, kfs, xi0, reps):
        def eval_once(x):
            T = se3.exp(x)

            def per_kf(p, t_rows, inten):
                proj, knot, anchor = _project_parts(camera, T, p)
                if name == "project":
                    return jnp.sum(proj) + jnp.sum(anchor.astype(jnp.float32))
                if name == "gather_take":
                    taps = jnp.take(t_rows, anchor, axis=0)
                    return jnp.sum(taps.astype(jnp.float32))
                if name == "gather_sorted_hint":
                    taps = jax.lax.gather(
                        t_rows,
                        anchor[:, None],
                        jax.lax.GatherDimensionNumbers(
                            offset_dims=(1,),
                            collapsed_slice_dims=(0,),
                            start_index_map=(0,),
                        ),
                        slice_sizes=(1, 2),
                        indices_are_sorted=True,
                        mode="clip",
                    )
                    return jnp.sum(taps.astype(jnp.float32))
                if name == "onehot_marginal":
                    bins = 16
                    bp = jnp.clip((inten * bins).astype(jnp.int32), 0, bins - 1)
                    hp = jnp.sum(jax.nn.one_hot(bp, bins, dtype=jnp.float32), axis=0)
                    return jnp.sum(hp) + jnp.sum(proj)
                raise ValueError(name)

            return jnp.sum(
                jax.vmap(per_kf)(kfs.points, kfs.tap_rows, kfs.intensity)
            )

        def body(_, carry):
            x, acc = carry
            s = eval_once(x)
            return (x + 1e-12 * s, acc + s)

        return _loop(reps, body, (xi0, jnp.float32(0.0)))

    return run


@functools.partial(jax.jit, static_argnames=("reps",))
def forward_only(camera, kfs, xi0, reps):
    def body(_, carry):
        x, acc = carry
        v = nid.multi_nid_loss(camera, se3.exp(x), kfs)
        return (x + 1e-12 * v, acc + v)

    return _loop(reps, body, (xi0, jnp.float32(0.0)))


def time_case(fn, camera, kfs, reps, label):
    xi0 = jnp.zeros(6, jnp.float32)
    out = jax.block_until_ready(fn(camera, kfs, xi0, reps))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(camera, kfs, xi0, reps))
        times.append((time.perf_counter() - t0) / reps * 1e3)
    print(f"# {label}: {times[0]:.2f} / {times[1]:.2f} ms per eval", file=sys.stderr)
    return round(min(times), 2)


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
        print(f"# cache unavailable: {e}", file=sys.stderr)

    if args.quick:
        width, height, n_pts, k = 512, 384, 32_768, 4
    else:
        width, height, n_pts, k = 4096, 3000, 262_144, 8

    camera, kfs = build_scene(width, height, n_pts, k)
    kfs_sorted = nid.sort_by_raster(camera, se3.identity(), kfs)
    kfs = nid.prepare_keyframes(kfs)
    kfs_sorted = jax.block_until_ready(nid.prepare_keyframes(kfs_sorted))
    print("# scene built", file=sys.stderr)

    r = args.reps
    res = {}
    res["project"] = time_case(make_variant("project"), camera, kfs, r, "project only")
    res["gather_take"] = time_case(
        make_variant("gather_take"), camera, kfs, r, "project + take (map order)")
    res["gather_take_sorted"] = time_case(
        make_variant("gather_take"), camera, kfs_sorted, r, "project + take (sorted)")
    res["gather_hint_sorted"] = time_case(
        make_variant("gather_sorted_hint"), camera, kfs_sorted, r,
        "project + lax.gather sorted-hint (sorted)")
    res["onehot_marginal"] = time_case(
        make_variant("onehot_marginal"), camera, kfs, r, "project + hist_points one-hot")
    res["forward"] = time_case(forward_only, camera, kfs, r, "full forward")
    res["forward_sorted"] = time_case(
        forward_only, camera, kfs_sorted, r, "full forward (sorted)")
    res["backend"] = jax.default_backend()
    res["scale"] = f"{k}x{n_pts}@{width}x{height}"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
