"""Benchmark: colorization + NID refinement throughput on one chip.

Prints ONE JSON line:
  {"metric": "colorize_refine_frames_per_s", "value": F, "unit": "frames/s",
   "vs_baseline": F / F_cpu}

Workload (per BASELINE.json config 3/4): K keyframes at the reference's
image scale (4096x3000, `PointCloudProcessor.cpp:206`), a 1M-point map,
256k culled points per keyframe. One "frame" = z-buffer cull + projective
colorization + fusion update + the frame's share of a 2-outer/10-inner NID
BFGS refine. The baseline divisor is a single-threaded NumPy transliteration
of the same math (the reference is CPU-only; it publishes no numbers —
BASELINE.md), measured on a subsample and scaled linearly in point count.

Usage: python bench.py [--quick]
"""

import argparse
import json
import sys
import time

import numpy as np


def build_scene(width, height, n_map, n_cull, k, f=4818.2):
    rng = np.random.default_rng(0)
    cx, cy = width / 2.0, height / 2.0
    wall_z = 5.0
    u = rng.uniform(2, width - 2, n_map).astype(np.float32)
    v = rng.uniform(2, height - 2, n_map).astype(np.float32)
    pts = np.stack([(u - cx) / f * wall_z, (v - cy) / f * wall_z, np.full_like(u, wall_z)], -1)
    inten = np.clip(0.5 + 0.25 * np.sin(7 * pts[:, 0]) + 0.25 * np.cos(9 * pts[:, 1]), 0, 1).astype(np.float32)

    uu, vv = np.meshgrid(np.arange(width, dtype=np.float32), np.arange(height, dtype=np.float32))
    wx = (uu - cx) / f * wall_z
    wy = (vv - cy) / f * wall_z
    gray = np.clip(0.5 + 0.25 * np.sin(7 * wx) + 0.25 * np.cos(9 * wy), 0, 1).astype(np.float32)
    rgbs = (np.stack([gray] * 3, -1) * 255).astype(np.uint8)

    cull_idx = rng.choice(n_map, size=n_cull, replace=False)
    return pts, inten, gray, rgbs, cull_idx


def bench_tpu(width, height, n_map, n_cull, k, inner_iters, outer_iters):
    import jax
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.models import camera as cam
    from pointcloudprocessor_tpu.opt import nid, refine
    from pointcloudprocessor_tpu.pipeline import colorize

    camera = cam.PinholeCamera(
        intrinsic=jnp.asarray([4818.2, 4819.1, width / 2.0, height / 2.0], jnp.float32),
        distortion=jnp.asarray([0.003, 0.066, -0.0002, -0.0006, 0.0], jnp.float32),
        width=width,
        height=height,
    )

    # Scene is synthesized ON DEVICE: at the full scale the images alone are
    # ~300 MB, and shipping them through the host tunnel dwarfs the compute
    # being measured.
    f_px, wall_z = 4818.2, 5.0

    def field(x, y):
        return jnp.clip(0.5 + 0.25 * jnp.sin(7 * x) + 0.25 * jnp.cos(9 * y), 0.0, 1.0)

    @jax.jit
    def make_scene():
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (n_map,), jnp.float32, 2.0, width - 2.0)
        v = jax.random.uniform(k2, (n_map,), jnp.float32, 2.0, height - 2.0)
        x = (u - width / 2.0) / f_px * wall_z
        y = (v - height / 2.0) / f_px * wall_z
        points = jnp.stack([x, y, jnp.full_like(x, wall_z)], -1)
        inten = field(x, y)

        uu = (jnp.arange(width, dtype=jnp.float32) - width / 2.0) / f_px * wall_z
        vv = (jnp.arange(height, dtype=jnp.float32) - height / 2.0) / f_px * wall_z
        gray = field(uu[None, :], vv[:, None])
        rgb = (gray[..., None] * 255.0).astype(jnp.uint8)
        images = jnp.broadcast_to(rgb, (k, height, width, 3))

        cull = jax.random.permutation(k3, n_map)[:n_cull]
        kf_pts = jnp.broadcast_to(points[cull], (k, n_cull, 3))
        kf_int = jnp.broadcast_to(inten[cull], (k, n_cull))
        bin_img = nid.quantize_image(gray, 16)
        bin_imgs = jnp.broadcast_to(bin_img, (k, height, width))
        return points, inten, images, kf_pts, kf_int, bin_imgs

    points, inten, images, kf_pts, kf_int, bin_imgs = jax.block_until_ready(make_scene())
    print("# scene built on device", file=sys.stderr)
    valid = jnp.ones((n_map,), bool)
    kfs = nid.NIDKeyframe(
        points=kf_pts,
        intensity=kf_int,
        valid=jnp.ones((k, n_cull), bool),
        bin_image=bin_imgs,
    )
    poses = se3.SE3(
        q=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (k, 1)),
        t=jnp.zeros((k, 3), jnp.float32),
    )
    T0 = se3.exp(jnp.asarray([0.02, -0.01, 0.01, 0.004, -0.002, 0.004], jnp.float32))

    def colorize_step(T):
        return colorize.fuse(camera, points, valid, images, poses, T)

    def refine_step():
        return refine.refine_pose(
            camera,
            kfs,
            T0,
            max_inner_iterations=inner_iters,
            max_outer_iterations=outer_iters,
        )

    # Warm-up (compile), then time.
    r = refine_step()
    r.T_camera_lidar.t.block_until_ready()
    print("# refine compiled", file=sys.stderr)
    fz = colorize_step(r.T_camera_lidar)
    fz.rgb.block_until_ready()
    print("# colorize compiled", file=sys.stderr)

    t0 = time.perf_counter()
    r = refine_step()
    r.T_camera_lidar.t.block_until_ready()
    t_refine = time.perf_counter() - t0

    t0 = time.perf_counter()
    fz = colorize_step(r.T_camera_lidar)
    fz.rgb.block_until_ready()
    t_colorize = time.perf_counter() - t0

    fps = k / (t_refine + t_colorize)
    return fps, t_refine, t_colorize, float(r.nid), int(fz.colored.sum())


def bench_cpu_reference(width, height, n_cull_sample, inner_iters, outer_iters, n_cull, n_map, k):
    """Single-threaded NumPy transliteration of the reference's per-frame
    work (projection + 4x4 B-spline histogram scatter per NID evaluation,
    projection + sample for colorization), timed on a subsample and scaled
    linearly in point count. Gradient evaluations are charged at 2x forward
    (reverse-mode lower bound; Ceres Jets<7> cost more)."""
    pts, inten, gray, rgb, cull_idx = build_scene(width, height, n_cull_sample * 2, n_cull_sample, 1)
    sub = pts[cull_idx]
    sub_i = inten[cull_idx]
    fx = fy = 4818.2
    cx, cy = width / 2.0, height / 2.0
    bins = 16
    spline = np.array(
        [[1, -3, 3, -1], [4, 0, -6, 3], [1, 3, 3, -3], [0, 0, 0, 1]], np.float64
    ) / 6.0
    bin_map = np.minimum((gray * bins).astype(np.int32), bins - 1)

    def nid_forward_loop(points, intensities):
        hist = np.zeros((bins, bins))
        hist_img = np.zeros(bins)
        hist_pts = np.zeros(bins)
        for p, it in zip(points, intensities):
            x, y, z = p
            u = fx * (x / z) + cx
            v = fy * (y / z) + cy
            ku, kv = int(np.floor(u)), int(np.floor(v))
            if ku < 0 or kv < 0 or ku >= width or kv >= height:
                continue
            su, sv = u - ku, v - kv
            bu = spline @ np.array([1, su, su * su, su**3])
            bv = spline @ np.array([1, sv, sv * sv, sv**3])
            bp = min(int(it * bins), bins - 1)
            hist_pts[bp] += 1
            for i in range(4):
                for j in range(4):
                    w = bu[i] * bv[j]
                    px = min(max(ku + i - 1, 0), width - 1)
                    py = min(max(kv + j - 1, 0), height - 1)
                    bi = bin_map[py, px]
                    hist[bi, bp] += w
                    hist_img[bi] += w
        s = max(hist_pts.sum(), 1.0)
        pj, pi, pp = hist / s, hist_img / s, hist_pts / s
        Hi = -(pi * np.log(pi + 1e-6)).sum()
        Hp = -(pp * np.log(pp + 1e-6)).sum()
        Hj = -(pj * np.log(pj + 1e-6)).sum()
        return (Hj - (Hi + Hp - Hj)) / Hj

    t0 = time.perf_counter()
    nid_forward_loop(sub, sub_i)
    t_fwd_sample = time.perf_counter() - t0
    per_point_fwd = t_fwd_sample / len(sub)

    def colorize_loop(points):
        out = np.zeros((len(points), 3), np.float32)
        for idx, p in enumerate(points):
            x, y, z = p
            if z <= 0:
                continue
            u = int(fx * (x / z) + cx)
            v = int(fy * (y / z) + cy)
            if 0 <= u < width and 0 <= v < height:
                out[idx] = rgb[v, u]
        return out

    t0 = time.perf_counter()
    colorize_loop(sub)
    t_col_sample = time.perf_counter() - t0
    per_point_col = t_col_sample / len(sub)

    # Charge the same evaluation counts as the TPU run: per inner iteration
    # one value+grad (3x fwd) plus ~2 line-search probes (1x fwd each).
    evals_fwd_equiv = outer_iters * inner_iters * (3.0 + 2.0)
    t_refine_full = per_point_fwd * n_cull * k * evals_fwd_equiv
    t_colorize_full = per_point_col * n_map * k
    return k / (t_refine_full + t_colorize_full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (smoke test)")
    args = ap.parse_args()

    if args.quick:
        width, height, n_map, n_cull, k = 512, 384, 100_000, 32_768, 4
    else:
        width, height, n_map, n_cull, k = 4096, 3000, 1_000_000, 262_144, 8
    inner_iters, outer_iters = 10, 2

    fps, t_ref, t_col, nid_val, colored = bench_tpu(
        width, height, n_map, n_cull, k, inner_iters, outer_iters
    )
    cpu_fps = bench_cpu_reference(
        width, height, 20_000 if not args.quick else 5_000, inner_iters, outer_iters, n_cull, n_map, k
    )

    print(
        f"# tpu: {fps:.2f} frames/s (refine {t_ref:.3f}s, colorize {t_col:.3f}s, "
        f"nid {nid_val:.4f}, colored {colored}) | cpu-ref: {cpu_fps:.3f} frames/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "colorize_refine_frames_per_s",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / cpu_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
