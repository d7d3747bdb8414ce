"""Benchmark: colorization + NID refinement throughput on one chip.

Prints ONE JSON line:
  {"metric": "colorize_refine_frames_per_s", "value": F, "unit": "frames/s",
   "vs_baseline": F / F_cpu, ...extra stage metrics...}

Workload (per BASELINE.json config 3/4): K keyframes at the reference's
image scale (4096x3000, `PointCloudProcessor.cpp:206`), a 1M-point map,
256k culled points per keyframe. One "frame" = z-buffer cull + projective
colorization + fusion update + the frame's share of a 2-outer/10-inner NID
BFGS refine (the round-5 `frozen_c2f_deep` variant runs the tuned
20-inner/ftol schedule from tools/solver_sweep). The baseline divisor is a
single-threaded NumPy transliteration of the same math (the reference is
CPU-only; it publishes no numbers — BASELINE.md); its colorize term is
pinned by one full-scale single-thread run.

The scene is adversarial, not friendly (VERDICT r1 §weak-3): a textured
background wall at z=6 plus a foreground occluder slab at z=2.5, cameras
translating AND yawing (so every keyframe sees a different image and a
different culled set), ray-cast per-keyframe images, and occlusion-aware
per-keyframe culled sets — the z-buffer and top-K fusion do real work.

Timed loops run TWICE (axon-tunnel noise — CLAUDE.md); both runs are
reported, the JSON value is the second (warm) run.

Extra stage metrics in the same JSON line:
  friendly_frames_per_s — the round-1 compute-friendly scene (no occluder,
                    no yaw) as a secondary number, keeping compute-side and
                    gather-side regressions separable across rounds.
  mls_mpts_per_s  — full MLS pass (grid build + neighbors + fits +
                    projection, ops/mls.py) on the hardened corner +
                    varying-density scene at 1M points (the reference's
                    hottest stage, `cloudSmooth.cpp:124-154`).
  mls_vs_cpu_1thread / mls_vs_cpu_30thread_ideal — MLS against a
                    single-threaded PCL-transliteration divisor on the same
                    scene (and the reference's 30-thread perfect-scaling
                    bound).
  hpr_grid_ms     — O(N) grid HPR cull (ops/hpr.py:hpr_mask_grid) at the
                    per-keyframe culled-capacity scale.
``vs_baseline`` is reported at 1 significant digit: the divisor is a
subsample-scaled single-thread estimate with measured 2-4x spread.

Usage: python bench.py [--quick]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# Scene geometry (metres). Wall at z=6 textured with FIELD_WALL; occluder
# slab at z=2.5 covering part of the right half of the view.
WALL_Z = 6.0
OCC_Z = 2.5
OCC_X = (0.3, 1.5)
OCC_Y = (-0.6, 0.6)
F_PX = 4818.2

# Scene 2 (schedule-robustness check, VERDICT r4 #4): DIFFERENT geometry and
# texture spectrum — a depth-SLOPED wall z = 6 + 0.35x (parallax varies
# across the image, unlike scene 1's fronto-parallel plane), a broader
# multi-frequency texture, and the occluder moved to the left half at a
# different depth. Run under the SAME headline schedule, no retuning.
S2_SLOPE = 0.35
S2_OCC_Z = 3.0
S2_OCC_X = (-1.6, -0.4)
S2_OCC_Y = (-0.5, 0.7)


def _field_wall(mod, x, y):
    return mod.clip(0.5 + 0.25 * mod.sin(7.0 * x) + 0.25 * mod.cos(9.0 * y), 0.0, 1.0)


def _field_occ(mod, x, y):
    return mod.clip(0.5 + 0.25 * mod.sin(13.0 * x + 1.0) + 0.25 * mod.cos(11.0 * y + 2.0), 0.0, 1.0)


def _field_wall2(mod, x, y):
    # Broader spectrum than scene 1: three frequencies incl. a cross term.
    return mod.clip(
        0.5
        + 0.18 * mod.sin(5.2 * x + 0.7)
        + 0.12 * mod.cos(11.7 * y)
        + 0.10 * mod.sin(23.0 * x + 3.0 * y)
        + 0.05 * mod.cos(41.0 * y + 1.0),
        0.0,
        1.0,
    )


def _field_occ2(mod, x, y):
    return mod.clip(
        0.5 + 0.2 * mod.sin(17.0 * x) + 0.2 * mod.cos(8.0 * y + 0.5), 0.0, 1.0
    )


def build_bench_scene(width, height, n_map, n_cull, k, friendly=False, scene=1):
    """The benchmark scene, importable by tools (e.g. the frozen-guard
    sweep). ``friendly=False`` is the hardened headline scene (occluder,
    yawing trajectory, per-keyframe images/culls); ``friendly=True`` the
    round-1 compute-friendly scene; ``scene=2`` the second hardened
    geometry (sloped wall + left occluder + pitching trajectory) used to
    show the headline schedule transfers without retuning. Returns
    (camera, poses, points, inten, valid, images, kfs, T0)."""
    import jax
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.models import camera as cam
    from pointcloudprocessor_tpu.opt import nid

    f_px = F_PX * (width / 4096.0)  # --quick shrinks the image at constant FoV
    camera = cam.PinholeCamera(
        intrinsic=jnp.asarray([f_px, f_px, width / 2.0, height / 2.0], jnp.float32),
        distortion=jnp.zeros(5, jnp.float32),
        width=width,
        height=height,
    )
    slope = S2_SLOPE if scene == 2 else 0.0
    occ_z = S2_OCC_Z if scene == 2 else OCC_Z
    occ_x = S2_OCC_X if scene == 2 else OCC_X
    occ_y = S2_OCC_Y if scene == 2 else OCC_Y
    f_wall = _field_wall2 if scene == 2 else _field_wall
    f_occ = _field_occ2 if scene == 2 else _field_occ

    # Keyframe trajectory: translate along +x, yaw about y (distinct poses);
    # scene 2 additionally pitches about x (exercises v-drift fields).
    kf_x = 0.12 * np.arange(k, dtype=np.float32)
    yaw_span = 0.0 if friendly else 4.0
    yaw = np.radians(np.linspace(-yaw_span, yaw_span, k)).astype(np.float32)
    pitch_span = 1.5 if scene == 2 else 0.0
    pitch = np.radians(np.linspace(-pitch_span, pitch_span, k)).astype(np.float32)
    # q = qy(yaw) * qx(pitch), wxyz.
    cy_, sy_ = np.cos(yaw / 2), np.sin(yaw / 2)
    cx_, sx_ = np.cos(pitch / 2), np.sin(pitch / 2)
    quats = np.stack(
        [cy_ * cx_, cy_ * sx_, sy_ * cx_, -sy_ * sx_], -1
    ).astype(np.float32)
    positions = np.stack([kf_x, np.zeros_like(kf_x), np.zeros_like(kf_x)], -1)
    poses = se3.SE3(q=jnp.asarray(quats), t=jnp.asarray(positions))

    # Scene is synthesized ON DEVICE: at full scale the images alone are
    # ~300 MB, and shipping them through the host tunnel dwarfs the compute
    # being measured. Poses MUST be jit ARGUMENTS: closed over, they are
    # compile-time constants and XLA constant-folds the whole 12M-pixel
    # render + culls on the compile host (single-threaded, ~8 min over the
    # axon tunnel); as arguments the graph compiles in seconds.
    @jax.jit
    def make_scene(poses_q, poses_t):
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n_occ = n_map // 8
        n_wall = n_map - n_occ
        # Wall spans the union of all keyframe frusta (plus margin).
        half_x = (width / 2.0) / f_px * WALL_Z
        half_y = (height / 2.0) / f_px * WALL_Z
        wx = jax.random.uniform(k1, (n_wall,), jnp.float32, -half_x - 0.6, half_x + 1.6)
        # Scene 1 margins unchanged since round 1 (NID values are compared
        # round-over-round); scene 2 widens the vertical span for its pitch.
        my = 0.4 if scene == 2 else 0.2
        wy = jax.random.uniform(k2, (n_wall,), jnp.float32, -half_y - my, half_y + my)
        ox = jax.random.uniform(k3, (n_occ,), jnp.float32, occ_x[0], occ_x[1])
        oy = jax.random.uniform(k4, (n_occ,), jnp.float32, occ_y[0], occ_y[1])
        points = jnp.concatenate(
            [
                jnp.stack([wx, wy, WALL_Z + slope * wx], -1),
                jnp.stack([ox, oy, jnp.full_like(ox, occ_z)], -1),
            ]
        )
        inten = jnp.concatenate(
            [f_wall(jnp, wx, wy), f_occ(jnp, ox, oy)]
        )

        # Ray-cast each keyframe's image off the two-plane scene.
        uu = (jnp.arange(width, dtype=jnp.float32) - width / 2.0) / f_px
        vv = (jnp.arange(height, dtype=jnp.float32) - height / 2.0) / f_px

        def render(inputs):
            q, t = inputs
            R = se3.quat_to_matrix(q)
            # Pixel ray directions in world frame.
            dx = uu[None, :] * R[0, 0] + vv[:, None] * R[0, 1] + R[0, 2]
            dy = uu[None, :] * R[1, 0] + vv[:, None] * R[1, 1] + R[1, 2]
            dz = uu[None, :] * R[2, 0] + vv[:, None] * R[2, 1] + R[2, 2]
            s_occ = (occ_z - t[2]) / dz
            hx, hy = t[0] + s_occ * dx, t[1] + s_occ * dy
            hit_occ = (
                (hx >= occ_x[0]) & (hx <= occ_x[1]) & (hy >= occ_y[0]) & (hy <= occ_y[1])
            )
            if friendly:
                hit_occ = jnp.zeros_like(hit_occ)
            # Sloped wall z = WALL_Z + slope*x: t_z + s dz = WALL_Z +
            # slope (t_x + s dx)  =>  s = (WALL_Z + slope t_x - t_z) /
            # (dz - slope dx). slope=0 reduces to the scene-1 plane.
            s_wall = (WALL_Z + slope * t[0] - t[2]) / (dz - slope * dx)
            gx, gy = t[0] + s_wall * dx, t[1] + s_wall * dy
            gray = jnp.where(
                hit_occ, f_occ(jnp, hx, hy), f_wall(jnp, gx, gy)
            )
            return (gray[..., None] * 255.0).astype(jnp.uint8)

        grays = jax.lax.map(render, (poses_q, poses_t))  # (K, H, W, 1)
        images = jnp.broadcast_to(grays, (k, height, width, 3))

        # Occlusion-aware per-keyframe culled sets (distinct per keyframe).
        def cull_one(inputs):
            q, t, kf_i = inputs
            R = se3.quat_to_matrix(q)
            rel = points - t[None, :]
            pc = rel @ R  # R^T applied to rows
            u = f_px * pc[:, 0] / pc[:, 2] + width / 2.0
            v = f_px * pc[:, 1] / pc[:, 2] + height / 2.0
            inb = (pc[:, 2] > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
            s = (occ_z - t[2]) / (points[:, 2] - t[2])
            cx_ = t[0] + s * (points[:, 0] - t[0])
            cy_ = t[1] + s * (points[:, 1] - t[1])
            shadowed = (
                (points[:, 2] > occ_z + 0.1)
                & (cx_ >= occ_x[0]) & (cx_ <= occ_x[1])
                & (cy_ >= occ_y[0]) & (cy_ <= occ_y[1])
            )
            if friendly:
                shadowed = jnp.zeros_like(shadowed)
            visible = inb & ~shadowed
            rank = jax.random.uniform(jax.random.PRNGKey(kf_i), (n_map,)) + visible
            # Full argsort, NOT lax.top_k: top_k at k=262144 of 1M lowers to
            # an O(N*k)-ish selection that stalls for minutes on TPU.
            sel = jnp.argsort(-rank)[:n_cull]
            return pc[sel], inten[sel]

        kf_pts, kf_int = jax.lax.map(
            cull_one, (poses_q, poses_t, jnp.arange(k, dtype=jnp.uint32))
        )
        bin_imgs = jax.vmap(lambda g: nid.quantize_image(g[..., 0] / 255.0, 16))(
            grays.astype(jnp.float32)
        )
        return points, inten, images, kf_pts, kf_int, bin_imgs

    out = jax.block_until_ready(make_scene(poses.q, poses.t))
    points, inten, images, kf_pts, kf_int, bin_imgs = out
    print("# scene built on device", file=sys.stderr)
    valid = jnp.ones((n_map,), bool)
    kfs = nid.NIDKeyframe(
        points=kf_pts,
        intensity=kf_int,
        valid=jnp.ones((k, n_cull), bool),
        bin_image=bin_imgs,
    )
    T0 = se3.exp(jnp.asarray([0.02, -0.01, 0.01, 0.004, -0.002, 0.004], jnp.float32))
    return camera, poses, points, inten, valid, images, kfs, T0


def bench_tpu(width, height, n_map, n_cull, k, inner_iters, outer_iters,
              friendly=False):
    """Time the refine variants + colorize on the bench scene (see
    build_bench_scene for the hardened/friendly scenes; shapes are
    identical, so the friendly run reuses the compiled refine)."""
    import jax
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.opt import refine
    from pointcloudprocessor_tpu.pipeline import colorize

    camera, poses, points, inten, valid, images, kfs, T0 = build_bench_scene(
        width, height, n_map, n_cull, k, friendly
    )

    def refine_step(kfs_in, T_start, **kw):
        kw.setdefault("max_outer_iterations", outer_iters)
        kw.setdefault("max_inner_iterations", inner_iters)
        return refine.refine_pose(camera, kfs_in, T_start, **kw)

    variants = {
        # Reference-faithful schedule: every evaluation at full resolution
        # with a fresh tap gather.
        "base": {},
        # Coarse-to-fine: same total outer solves, first one on a 4x
        # subsample (opt/refine.py docstring).
        "c2f": dict(
            max_outer_iterations=max(outer_iters - 1, 1),
            coarse_outer_iterations=1,
            coarse_stride=4,
        ),
        # Guarded frozen-tap gather (opt/nid.TapCache): reference-faithful
        # schedule, evaluations reuse the tap gather until anchors drift.
        # Reported NID is a fresh exact evaluation at the final pose.
        # guard=0.75 px-drift fraction: chosen by the recorded full-scale
        # sweep (tools/frozen_guard_sweep.py — 0.577 s refine vs 0.67 s at
        # 0.5, no evaluation blowup, NID in the plateau at every guard); at
        # this workload's camera scale the convergence thresholds are
        # ~50-84 px, so a <=1 px surrogate stall is far inside them. The
        # library default stays at the conservative 0.25.
        "frozen": dict(frozen_taps=True, frozen_guard_frac=0.75),
        # Both stacked (coarse phase runs the plain objective by design —
        # opt/refine.py). coarse_stride=16: the round-4 schedule probe
        # swept strides {4, 8, 16, 32} at full scale (median-of-3 chained
        # calls each): 12.30 / 13.71 / 13.99 / 14.08 frames/s with pose
        # error 0.60 / 0.65 / 0.41 / 1.05 cm — stride 16 is strictly
        # better than 4 on BOTH axes (cheaper coarse evals, and the
        # deeper-sounding stride-4 coarse phase was not buying accuracy),
        # while stride 32's warm start degrades past the reference's 1 cm
        # convergence bar.
        "frozen_c2f": dict(
            max_outer_iterations=max(outer_iters - 1, 1),
            coarse_outer_iterations=1,
            coarse_stride=16,
            frozen_taps=True,
            frozen_guard_frac=0.75,
        ),
        # Round-5 headline: the frozen+c2f schedule with a DEEPER inner
        # budget (20 vs 10) gated by the ftol function-decrease exit
        # (Ceres function_tolerance semantics, 3e-4 from the recorded
        # two-scene sweep, tools/solver_sweep): scene 1 exits at ~39
        # evaluations as before, scene 2's sharper basin gets the extra
        # iterations it needs, and BOTH scenes converge to <0.1 cm of
        # ground truth (vs 0.72/1.64 cm at the starved 10-inner budget) at
        # ~0.27 s refine. The round-5 wide-window/partial-refresh/carry-
        # Hessian experiments measured NEGATIVE at this scale and are
        # recorded in README/BASELINE (opt-in flags remain).
        "frozen_c2f_deep": dict(
            max_outer_iterations=max(outer_iters - 1, 1),
            max_inner_iterations=2 * inner_iters,
            coarse_outer_iterations=1,
            coarse_stride=16,
            frozen_taps=True,
            frozen_guard_frac=0.75,
            ftol=3e-4,
        ),
    }

    # TIMING METHODOLOGY: the axon runtime returns bogus ~0 ms wall times
    # for host-loop repeats — with identical buffers (the usual trigger) but
    # sometimes also with freshly perturbed inputs (observed round 3: a full
    # 1 s refine "measured" 0.014 s on its second host-level call). The only
    # wall-clock pattern that has measured truthfully (cross-checked against
    # profiler device-op sums, CLAUDE.md) is CHAINING the repetitions inside
    # one jitted call with a data dependence between iterations, so XLA
    # cannot elide or overlap them and the tunnel executes one long program.
    REPS = 2

    def _zeros_like_shape(fn):
        return jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), jax.eval_shape(fn)
        )

    @functools.partial(jax.jit, static_argnames=("variant", "reps"))
    def refine_chain(kfs_in, T_start, variant, reps):
        kw = variants[variant]

        def body(i, carry):
            T_s, _ = carry
            res = refine_step(kfs_in, T_s, **kw)
            # Next start pose depends on this result (serializes the chain —
            # XLA cannot overlap, elide or CSE the iterations) but stays in
            # the same basin: T0-scale perturbation ~1e-6.
            z = jnp.float32(0.0)
            eps = 1e-6 * (i.astype(jnp.float32) + 1.0) + 1e-9 * jnp.tanh(
                jnp.sum(res.T_camera_lidar.t)
            )
            T_next = se3.compose(
                T_start, se3.exp(jnp.stack([eps, z, z, z, eps, z]))
            )
            return (T_next, res)

        placeholder = _zeros_like_shape(
            lambda: refine_step(kfs_in, T_start, **kw)
        )
        _, res = jax.lax.fori_loop(0, reps, body, (T_start, placeholder))
        return res

    @functools.partial(jax.jit, static_argnames=("reps",))
    def colorize_chain(points_in, valid_in, images_in, poses_in, T_in, reps):
        # Everything large arrives as arguments: closed-over device arrays
        # become embedded constants in the remote-compile payload (HTTP 413).
        def body(i, carry):
            T_s, _ = carry
            fz = colorize.fuse(camera, points_in, valid_in, images_in, poses_in, T_s)
            z = jnp.float32(0.0)
            eps = 1e-7 * (i.astype(jnp.float32) + 1.0) + 1e-9 * jnp.tanh(
                fz.colored.sum().astype(jnp.float32)
            )
            T_next = se3.compose(T_in, se3.exp(jnp.stack([eps, z, z, z, eps, z])))
            return (T_next, fz)

        placeholder = _zeros_like_shape(
            lambda: colorize.fuse(camera, points_in, valid_in, images_in, poses_in, T_in)
        )
        _, fz = jax.lax.fori_loop(0, reps, body, (T_in, placeholder))
        return fz

    # Physically credible minimum wall times, scaled from the full-size
    # workload (refine = dozens of evaluations x multiple ms each): anything
    # below is the bogus-timing bug, not a fast run. Chained timing has not
    # exhibited the bug; the floor is a tripwire, not a crutch.
    scale = (n_cull * k) / (262_144.0 * 8.0)
    min_refine_s = 0.05 * scale * REPS
    min_colorize_s = 0.005 * scale * REPS

    def timed(fn, min_s, tag, max_tries=3):
        """Time fn(attempt); fn varies its device inputs with the attempt
        index. Returns per-rep seconds."""
        for attempt in range(max_tries):
            t0 = time.perf_counter()
            out = fn(attempt)
            dt = time.perf_counter() - t0
            if dt >= min_s:
                return dt / REPS, out
            print(
                f"# bogus axon timing for {tag} ({dt * 1e3:.2f} ms < "
                f"{min_s * 1e3:.0f} ms floor) — retrying with fresh inputs",
                file=sys.stderr,
            )
        print(f"# WARNING: {tag} still below credibility floor", file=sys.stderr)
        return dt / REPS, out

    def start_pose(i):
        eps = 1e-6 * (i + 1)
        return se3.compose(
            T0, se3.exp(jnp.asarray([eps, 0, 0, 0, eps, 0], jnp.float32))
        )

    def run_refine(T_start, variant, kfs_in=None):
        r = refine_chain(kfs if kfs_in is None else kfs_in, T_start, variant, REPS)
        r.T_camera_lidar.t.block_until_ready()
        return r

    def run_colorize(T):
        fz = colorize_chain(points, valid, images, poses, T, REPS)
        fz.rgb.block_until_ready()
        return fz

    def pose_err(res):
        """Pose error of the refined correction vs GROUND TRUTH, which is
        IDENTITY by construction: the per-keyframe images and culled sets are
        generated at the same poses (make_scene), so the true camera<-lidar
        correction is exactly the identity and the solver starts from the
        planted offset T0 (~2.6 cm / 0.36 deg). Reported per variant
        (VERDICT r3 #2) so NID-level differences between schedules are tied
        to what actually matters: the recovered pose. The reference's own
        convergence bar is delta_t < 1 cm / delta_r < 1 deg
        (`visual_camera_calibration.cpp:53-81`)."""
        dt, dr = se3.delta_magnitudes(
            res.T_camera_lidar, se3.identity(res.T_camera_lidar.t.dtype)
        )
        return float(dt) * 100.0, float(np.degrees(dr))

    # Warm-up (compile), then time twice (tunnel noise).
    r = run_refine(T0, "base")
    print("# refine compiled", file=sys.stderr)
    fz = run_colorize(r.T_camera_lidar)
    print("# colorize compiled", file=sys.stderr)

    runs = []
    for run_i in range(3):
        t_refine, r = timed(
            lambda a: run_refine(start_pose(10 * run_i + a), "base"),
            min_refine_s,
            "refine",
        )

        def colorize_attempt(a):
            T = r.T_camera_lidar
            if a:  # vary the pose sub-micron on retries
                T = se3.compose(
                    T, se3.exp(jnp.asarray([1e-7 * a, 0, 0, 0, 0, 0], jnp.float32))
                )
            return run_colorize(T)

        t_colorize, fz = timed(colorize_attempt, min_colorize_s, "colorize")
        runs.append((k / (t_refine + t_colorize), t_refine, t_colorize))

    extras = {}
    if not friendly:
        t_col = runs[-1][2]
        for vi, name in enumerate(
            ("c2f", "frozen", "frozen_c2f", "frozen_c2f_deep")
        ):
            rv = run_refine(T0, name)
            print(f"# {name} refine compiled", file=sys.stderr)
            # MEDIAN of three timed calls — the same protocol as the headline
            # (VERDICT r3 #6): first-call-after-compile walls are sometimes
            # tunnel-inflated, and single walls have shown 2x spread.
            walls = []
            for call_i in range(3):
                t_refine_v, rv = timed(
                    lambda a: run_refine(
                        start_pose(100 + 30 * vi + 10 * call_i + a), name
                    ),
                    min_refine_s * 0.3,  # these variants are legitimately faster
                    name,
                )
                walls.append(t_refine_v)
            t_refine_v = sorted(walls)[1]
            err_cm, err_deg = pose_err(rv)
            extras[name] = {
                "frames_per_s": k / (t_refine_v + t_col),
                "refine_s_calls": [round(w, 4) for w in walls],
                "nid": float(rv.nid),
                "evaluations": int(rv.evaluations),
                "gathers": int(rv.gathers),
                "partial_gathers": int(rv.partial_gathers),
                "gather_drift": round(float(rv.gather_drift), 3),
                "pose_err_cm": err_cm,
                "pose_err_deg": err_deg,
            }

        # SECOND hardened scene (VERDICT r4 #4): different geometry (sloped
        # wall, left occluder, pitching trajectory) and texture spectrum,
        # run under the SAME schedules with no retuning — the compiled
        # refine executables are reused (identical shapes/static args).
        # Ground truth is identity by construction, same as scene 1.
        scene2 = build_bench_scene(width, height, n_map, n_cull, k, scene=2)
        kfs2, T0_2 = scene2[6], scene2[7]
        for name in ("base", "frozen_c2f", "frozen_c2f_deep"):
            walls2 = []
            rv2 = None
            for call_i in range(3):
                t_s2, rv2 = timed(
                    lambda a: run_refine(
                        start_pose(300 + 10 * call_i + a), name, kfs_in=kfs2
                    ),
                    min_refine_s * 0.3,
                    f"scene2:{name}",
                )
                walls2.append(t_s2)
            err_cm, err_deg = pose_err(rv2)
            extras[f"scene2_{name}"] = {
                "frames_per_s": k / (sorted(walls2)[1] + t_col),
                "nid": float(rv2.nid),
                "evaluations": int(rv2.evaluations),
                "pose_err_cm": err_cm,
                "pose_err_deg": err_deg,
            }
    err = pose_err(r)
    # Incremental dump: the axon tunnel has shown rare hard hangs in later
    # phases (a blocked RPC immune to SIGTERM); flushing each phase's
    # results keeps them recoverable from the log.
    print(
        "# PARTIAL " + json.dumps({
            "runs": [[round(v, 4) for v in rr] for rr in runs],
            "nid": float(r.nid), "err": err, "extras": extras,
        }),
        file=sys.stderr, flush=True,
    )
    return runs, float(r.nid), int(fz.colored.sum()), extras, err


def _mls_scene(n_points, seed=1):
    """Hardened MLS scene (VERDICT r2 weak-2): NOT a single flat
    uniform-density patch. Three pieces, 5 mm surface noise everywhere:
      A: dense wall z=6 at ~30k pts/m^2 (the friendly baseline),
      B: PERPENDICULAR wall x=0 sharing the corner edge (grid cells at the
         corner mix two surfaces — the worst case for a hash-grid + single
         plane fit),
      C: sparse extension of A at ~3k pts/m^2 (neighborhoods near the
         density cliff straddle dense and near-empty cells).
    Returns (N, 3) float32 numpy points.
    """
    rng = np.random.default_rng(seed)
    n_a = n_points // 2
    n_b = n_points // 4
    n_c = n_points - n_a - n_b
    side_a = float(np.sqrt(n_a / 30000.0))
    side_b = float(np.sqrt(n_b / 30000.0))
    side_c = float(np.sqrt(n_c / 3000.0))
    noise = lambda n: 0.005 * rng.standard_normal(n)
    a = np.stack([rng.uniform(0, side_a, n_a), rng.uniform(0, side_a, n_a),
                  6.0 + noise(n_a)], -1)
    b = np.stack([0.0 + noise(n_b), rng.uniform(0, side_b, n_b),
                  6.0 - rng.uniform(0, side_b, n_b)], -1)
    c = np.stack([rng.uniform(-side_c, 0, n_c), rng.uniform(0, side_c, n_c),
                  6.0 + noise(n_c)], -1)
    return np.concatenate([a, b, c]).astype(np.float32)


def bench_mls(n_points):
    """Full MLS pass (ops/mls.py) on the hardened scene, current backend.

    The reference's dominant wall-clock stage (`cloudSmooth.cpp:124-154`,
    PCL MLS with 30 threads). Returns two timed runs in points/s.
    """
    import jax
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.ops import mls
    from pointcloudprocessor_tpu.utils.config import MLSConfig

    pts = jax.block_until_ready(jnp.asarray(_mls_scene(n_points)))
    valid = jnp.ones((n_points,), bool)
    cfg = MLSConfig()  # reference params: radius 0.03, sqr_gauss 0.0009

    pos, nrm, ok, _ = mls.mls_smooth(pts, valid, cfg)
    pos.block_until_ready()
    print("# mls compiled", file=sys.stderr)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        pos, nrm, ok, _ = mls.mls_smooth(pts, valid, cfg)
        pos.block_until_ready()
        runs.append(n_points / (time.perf_counter() - t0))
    return runs


def bench_mls_cpu(n_points, n_sample, radius=0.03, sqr_gauss=0.0009):
    """Single-threaded transliteration of the PCL MLS inner loop the
    reference drives (`cloudSmooth.cpp:124-154`; PCL MovingLeastSquares:
    per point kd-tree radius search -> covariance EVD plane -> Gaussian
    exp(-d^2/sqr_gauss)-weighted order-2 polynomial LSQ -> projection),
    timed on ``n_sample`` query points over the SAME hardened scene and
    scaled linearly; the kd-tree build over the full cloud is measured
    directly (PCL pays it once in setInputCloud). The reference configures
    30 threads (`PointCloudProcessor.cpp:72`) with no published numbers —
    divide by 30 for its perfect-scaling bound. Returns points/s
    (single-thread full-scale estimate).
    """
    from scipy.spatial import cKDTree

    pts = _mls_scene(n_points).astype(np.float64)
    t0 = time.perf_counter()
    tree = cKDTree(pts)
    t_tree = time.perf_counter() - t0

    rng = np.random.default_rng(3)
    sample = rng.choice(n_points, size=n_sample, replace=False)
    t0 = time.perf_counter()
    for qi in sample:
        q = pts[qi]
        idx = tree.query_ball_point(q, radius)
        k = len(idx)
        if k < 6:  # PCL: skip when below nr_coeff for order 2
            continue
        nb = pts[idx]
        mean = nb.mean(axis=0)
        d = nb - mean
        cov = d.T @ d
        _, vecs = np.linalg.eigh(cov)
        normal = vecs[:, 0]
        # Local tangent frame + query projected onto the plane.
        u_ax = vecs[:, 2]
        v_ax = vecs[:, 1]
        dq = q - mean
        q_proj = q - np.dot(dq, normal) * normal
        rel = nb - q_proj
        du = rel @ u_ax
        dv = rel @ v_ax
        h = rel @ normal
        w = np.exp(-(rel * rel).sum(axis=1) / sqr_gauss)
        P = np.stack([np.ones(k), du, dv, du * du, du * dv, dv * dv], -1)
        A = P.T @ (w[:, None] * P)
        b = P.T @ (w * h)
        try:
            coeffs = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            continue
        _ = q_proj + coeffs[0] * normal
    per_pt = (time.perf_counter() - t0) / n_sample
    return n_points / (t_tree + per_pt * n_points)


def bench_hpr(n_points):
    """Grid HPR cull (ops/hpr.py:hpr_mask_grid) on a two-wall occluder scene
    at per-keyframe culled scale. Returns two timed runs in milliseconds."""
    import jax
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.ops import hpr

    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n1 = n_points // 2
    w1 = jnp.stack(
        [jax.random.uniform(k1, (n1,), jnp.float32, -2, 2),
         jax.random.uniform(k2, (n1,), jnp.float32, -1.5, 1.5),
         jnp.full((n1,), 5.0)], -1)
    w2 = jnp.stack(
        [jax.random.uniform(k3, (n_points - n1,), jnp.float32, -2, 2),
         jax.random.uniform(k4, (n_points - n1,), jnp.float32, -1.5, 1.5),
         jnp.full((n_points - n1,), 10.0)], -1)
    pts = jax.block_until_ready(jnp.concatenate([w1, w2]))
    valid = jnp.ones((n_points,), bool)

    m = hpr.hpr_mask_grid(pts, valid)
    m.block_until_ready()
    print("# hpr compiled", file=sys.stderr)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        m = hpr.hpr_mask_grid(pts, valid)
        m.block_until_ready()
        runs.append((time.perf_counter() - t0) * 1e3)
    return runs, int(np.asarray(m).sum())


def bench_e2e(width, height, n_map, n_cull, k):
    """End-to-end `runner.process` wall-clock at bench scale (VERDICT r4
    #5): ingest -> crop -> [MLS] -> keyframes -> cull -> NID refine ->
    colorize+fuse -> save, through the REAL pipeline entry including disk
    I/O (JPEG decode, native-codec PCD read/write) and host<->device
    staging — the analogue of `PointCloudProcessor::process`
    (`src/PointCloudProcessor.cpp:1007-1032`). The synthetic dataset is
    written to artifacts/ once and reused across runs.

    Returns (timings_no_mls, timings_mls, pose_err_cm, pose_err_deg,
    colored_points)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.io import pcd
    from pointcloudprocessor_tpu.pipeline import ingest, runner
    from pointcloudprocessor_tpu.utils import config as cfg_mod

    root = os.path.dirname(os.path.abspath(__file__))
    data_dir = os.path.join(root, "artifacts", f"e2e_data_{width}x{n_map}_{k}")
    marker = os.path.join(data_dir, ".complete")
    camera, poses, points, inten, valid, images, kfs, T0 = build_bench_scene(
        width, height, n_map, n_cull, k
    )
    if not os.path.exists(marker):
        os.makedirs(os.path.join(data_dir, "images"), exist_ok=True)
        pts_np = np.asarray(points)
        pcd.write(
            os.path.join(data_dir, "map.pcd"), pts_np,
            intensity=np.asarray(inten),
        )
        times = 1700000000.0 + 0.1 * np.arange(k)
        # Planted odometry error: write O_i = P_i ∘ T0 (the bench's ~2.6 cm
        # / 0.36 deg offset), so the shared correction the NID refine must
        # recover is exactly T0^-1 — the refine does real recovery work and
        # the e2e run reports a pose error vs known ground truth.
        from pointcloudprocessor_tpu.core import se3 as _se3

        op = _se3.compose(poses, T0)
        with open(os.path.join(data_dir, "vo_interpolated_odom.txt"), "w") as f:
            q = np.asarray(op.q)
            t = np.asarray(op.t)
            for i in range(k):
                f.write(
                    f"{times[i]:.6f} {t[i,0]} {t[i,1]} {t[i,2]} "
                    f"{q[i,0]} {q[i,1]} {q[i,2]} {q[i,3]}\n"
                )
        imgs_np = np.asarray(images)
        for i in range(k):
            name = os.path.join(
                data_dir, "images", ingest.cpp_timestamp(times[i]) + ".jpg"
            )
            try:
                import cv2

                cv2.imwrite(name, imgs_np[i][:, :, ::-1])
            except ImportError:
                from PIL import Image

                Image.fromarray(imgs_np[i]).save(name, quality=95)
        open(marker, "w").write("ok")
    del images, kfs  # the pipeline re-reads everything from disk

    def one_run(enable_mls):
        out_dir = tempfile.mkdtemp(prefix="pcp_e2e_")
        cfg = cfg_mod.PipelineConfig(
            point_cloud_path=os.path.join(data_dir, "map.pcd"),
            odometry_path=os.path.join(data_dir, "vo_interpolated_odom.txt"),
            images_folder=os.path.join(data_dir, "images"),
            output_path=out_dir,
            enable_mls=enable_mls,
            enable_nid_optimize=True,
            crop_padding=12.0,  # keep the z=6 wall inside the traj bbox crop
            map_capacity=n_map,
            culled_capacity=n_cull,
            max_keyframes=k,
            camera=cfg_mod.CameraConfig(
                intrinsic=(
                    F_PX * (width / 4096.0), F_PX * (width / 4096.0),
                    width / 2.0, height / 2.0,
                ),
                distortion=(0.0,) * 5,
                width=width,
                height=height,
            ),
            # VGD upsampling is off for the e2e timing: the reference's
            # 1 mm voxel / 4-iteration dilation is sized for its close-range
            # scans — on this synthetic 6 m wall it dilates to ~10^8 voxel
            # centers (measured: a 54 GB allocation at the (N,3) minor-dim
            # layout), which is a scene mismatch, not a pipeline cost.
            mls=cfg_mod.MLSConfig(upsampling="none"),
            # The round-5 tuned schedule (see bench variants / solver_sweep):
            # deeper inner budget gated by ftol; wide/partial opt-ins stay
            # off (measured negative at this scale).
            nid=cfg_mod.NIDConfig(
                max_outer_iterations=2,
                max_inner_iterations=20,
                coarse_outer_iterations=1,
                coarse_stride=16,
                frozen_taps=True,
                frozen_guard_frac=0.75,
                ftol=3e-4,
            ),
        )
        t0 = time.perf_counter()
        res = runner.process(cfg)
        wall = time.perf_counter() - t0
        # Truth for the recovered correction: with odometry written as
        # O_i = P_i ∘ T0, reported-camera-frame points satisfy
        # p_true = T0 ∘ p_reported, and the NID correction's convention is
        # exactly that map (see tests/test_pipeline_e2e.write_dataset's
        # docstring) — so truth is T0 itself. (The first measurement
        # compared against T0^-1 and read dist(T0, T0^-1) = 4.8 cm — i.e.
        # the solver HAD recovered the plant.)
        dt, dr = se3.delta_magnitudes(res.T_correction, T0)
        shutil.rmtree(out_dir, ignore_errors=True)
        return (
            wall,
            dict(res.timings),
            float(dt) * 100.0,
            float(np.degrees(np.asarray(dr))),
            res.num_colored_points,
        )

    wall0, tim0, err_cm, err_deg, colored = one_run(False)
    wall1, tim1, _, _, _ = one_run(True)
    return wall0, tim0, wall1, tim1, err_cm, err_deg, colored


def bench_cpu_reference(width, height, n_cull_sample, inner_iters, outer_iters, n_cull, n_map, k):
    """Single-threaded NumPy transliteration of the reference's per-frame
    work (projection + 4x4 B-spline histogram scatter per NID evaluation,
    projection + sample for colorization), timed on a subsample and scaled
    linearly in point count. Gradient evaluations are charged at 2x forward
    (reverse-mode lower bound; Ceres Jets<7> cost more)."""
    rng = np.random.default_rng(0)
    cx, cy = width / 2.0, height / 2.0
    fx = fy = F_PX
    u = rng.uniform(2, width - 2, n_cull_sample).astype(np.float64)
    v = rng.uniform(2, height - 2, n_cull_sample).astype(np.float64)
    sub = np.stack([(u - cx) / fx * WALL_Z, (v - cy) / fy * WALL_Z, np.full_like(u, WALL_Z)], -1)
    sub_i = _field_wall(np, sub[:, 0], sub[:, 1])
    uu, vv = np.meshgrid(np.arange(width, dtype=np.float32), np.arange(height, dtype=np.float32))
    gray = _field_wall(np, (uu - cx) / fx * WALL_Z, (vv - cy) / fy * WALL_Z).astype(np.float32)
    rgb = (np.stack([gray] * 3, -1) * 255).astype(np.uint8)
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

    # Pin the colorize term with ONE full-scale single-thread measurement
    # (VERDICT r4 weak #5: the subsample-scaled divisor has measured 2-4x
    # spread; the colorize loop is cheap enough to run at full 1M scale).
    full_pts = np.stack(
        [(rng.uniform(2, width - 2, n_map) - cx) / fx * WALL_Z,
         (rng.uniform(2, height - 2, n_map) - cy) / fy * WALL_Z,
         np.full(n_map, WALL_Z)], -1)
    t0 = time.perf_counter()
    colorize_loop(full_pts)
    per_point_col_full = (time.perf_counter() - t0) / n_map

    # Charge the same evaluation counts as the TPU run: per inner iteration
    # one value+grad (3x fwd) plus ~2 line-search probes (1x fwd each).
    evals_fwd_equiv = outer_iters * inner_iters * (3.0 + 2.0)
    t_refine_full = per_point_fwd * n_cull * k * evals_fwd_equiv
    t_colorize_full = per_point_col_full * n_map * k
    print(
        f"# cpu divisor: colorize {per_point_col * 1e6:.3f} us/pt sampled vs "
        f"{per_point_col_full * 1e6:.3f} us/pt at full {n_map} scale "
        f"(pins the extrapolation); nid fwd {per_point_fwd * 1e6:.3f} us/pt",
        file=sys.stderr,
    )
    return k / (t_refine_full + t_colorize_full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (smoke test)")
    args = ap.parse_args()

    # Persistent compilation cache: the full-scale NID refine (3-level nested
    # while_loop) takes ~20 min to compile over the axon tunnel; cached
    # executables bring a repeat bench run to minutes. Safe no-op on backends
    # that don't support executable serialization.
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # pragma: no cover
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    if args.quick:
        width, height, n_map, n_cull, k = 512, 384, 100_000, 32_768, 4
        n_mls, n_hpr = 100_000, 32_768
    else:
        width, height, n_map, n_cull, k = 4096, 3000, 1_000_000, 262_144, 8
        n_mls, n_hpr = 1_000_000, 262_144
    inner_iters, outer_iters = 10, 2

    runs, nid_val, colored, extras, base_err = bench_tpu(
        width, height, n_map, n_cull, k, inner_iters, outer_iters
    )
    (fps1, tr1, tc1), (fps2, t2_ref, t2_col), (fps3, t3_ref, t3_col) = runs
    # MEDIAN of the three timed runs: the tunnel shows both inflated
    # first-call walls and (rarely) bogus-fast ones; the median of three
    # chained runs is robust to one outlier of either sign.
    fps_med = sorted([fps1, fps2, fps3])[1]
    t_ref = sorted([tr1, t2_ref, t3_ref])[1]
    t_col = sorted([tc1, t2_col, t3_col])[1]
    fps_c2f, nid_c2f = extras["c2f"]["frames_per_s"], extras["c2f"]["nid"]
    frz, frz_c2f = extras["frozen"], extras["frozen_c2f"]
    runs_f, nid_f, _, _, _ = bench_tpu(
        width, height, n_map, n_cull, k, inner_iters, outer_iters, friendly=True
    )
    fps_friendly = runs_f[1][0]
    mls_runs = bench_mls(n_mls)
    hpr_runs, hpr_visible = bench_hpr(n_hpr)
    e2e = None
    try:
        e2e = bench_e2e(width, height, n_map, n_cull, k)
        print(
            f"# e2e runner.process: {e2e[0]:.1f}s (no MLS, stages {e2e[1]}), "
            f"{e2e[2]:.1f}s (MLS, stages {e2e[3]}), "
            f"pose-err {e2e[4]:.3f}cm/{e2e[5]:.4f}deg colored {e2e[6]}",
            file=sys.stderr,
        )
    except Exception as exc:  # pragma: no cover — e2e must not sink the bench
        print(f"# e2e bench failed: {exc!r}", file=sys.stderr)
    cpu_fps = bench_cpu_reference(
        width, height, 20_000 if not args.quick else 5_000, inner_iters, outer_iters, n_cull, n_map, k
    )
    mls_cpu_pps = bench_mls_cpu(n_mls, 2_000 if not args.quick else 500)

    # The CPU divisor is a subsample-scaled single-thread estimate with
    # measured 2-4x run-to-run spread (BASELINE.md) — report the ratio as an
    # ORDER OF MAGNITUDE (1 significant digit), not a fake-precision point.
    ratio = fps_med / cpu_fps
    ratio_oom = float(f"{ratio:.0e}")
    mls_ratio = mls_runs[1] / mls_cpu_pps

    print(
        f"# tpu hardened run1: {fps1:.2f} frames/s (refine {tr1:.3f}s colorize {tc1:.3f}s) | "
        f"run2: {fps2:.2f} run3: {fps3:.2f} -> median {fps_med:.2f} frames/s "
        f"(refine {t_ref:.3f}s colorize {t_col:.3f}s) | "
        f"nid {nid_val:.4f} pose-err {base_err[0]:.3f}cm/{base_err[1]:.4f}deg "
        f"colored {colored} | "
        f"c2f {fps_c2f:.2f} frames/s (nid {nid_c2f:.4f}, "
        f"err {extras['c2f']['pose_err_cm']:.3f}cm/{extras['c2f']['pose_err_deg']:.4f}deg) | "
        f"frozen {frz['frames_per_s']:.2f} frames/s (nid {frz['nid']:.4f}, "
        f"{frz['gathers']}/{frz['evaluations']} gathers/evals, "
        f"err {frz['pose_err_cm']:.3f}cm/{frz['pose_err_deg']:.4f}deg) | "
        f"frozen+c2f {frz_c2f['frames_per_s']:.2f} frames/s (nid {frz_c2f['nid']:.4f}, "
        f"err {frz_c2f['pose_err_cm']:.3f}cm/{frz_c2f['pose_err_deg']:.4f}deg) | "
        f"friendly {runs_f[0][0]:.2f}/{fps_friendly:.2f} frames/s (nid {nid_f:.4f}) | "
        f"mls {mls_runs[0] / 1e6:.2f}/{mls_runs[1] / 1e6:.2f} Mpts/s "
        f"(cpu-1t {mls_cpu_pps / 1e6:.4f} -> {mls_ratio:.0f}x, 30-thread-ideal {mls_ratio / 30:.1f}x) | "
        f"hpr {hpr_runs[0]:.1f}/{hpr_runs[1]:.1f} ms (visible {hpr_visible}) | "
        f"cpu-ref {cpu_fps:.3f} frames/s (ratio ~{ratio_oom:.0e})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "colorize_refine_frames_per_s",
                "value": round(fps_med, 3),
                "unit": "frames/s",
                "vs_baseline": ratio_oom,
                "vs_baseline_note": "single-CPU divisor is a subsample-scaled estimate; 1 significant digit",
                "run1_frames_per_s": round(fps1, 3),
                "run2_frames_per_s": round(fps2, 3),
                "run3_frames_per_s": round(fps3, 3),
                "pose_err_cm": round(base_err[0], 4),
                "pose_err_deg": round(base_err[1], 5),
                "c2f_frames_per_s": round(fps_c2f, 3),
                "c2f_nid": round(nid_c2f, 4),
                "c2f_evaluations": extras["c2f"]["evaluations"],
                "c2f_pose_err_cm": round(extras["c2f"]["pose_err_cm"], 4),
                "c2f_pose_err_deg": round(extras["c2f"]["pose_err_deg"], 5),
                "c2f_refine_s_calls": extras["c2f"]["refine_s_calls"],
                "frozen_frames_per_s": round(frz["frames_per_s"], 3),
                "frozen_nid": round(frz["nid"], 4),
                "frozen_gathers": frz["gathers"],
                "frozen_evaluations": frz["evaluations"],
                "frozen_pose_err_cm": round(frz["pose_err_cm"], 4),
                "frozen_pose_err_deg": round(frz["pose_err_deg"], 5),
                "frozen_refine_s_calls": frz["refine_s_calls"],
                "frozen_c2f_frames_per_s": round(frz_c2f["frames_per_s"], 3),
                "frozen_c2f_nid": round(frz_c2f["nid"], 4),
                "frozen_c2f_gathers": frz_c2f["gathers"],
                "frozen_c2f_evaluations": frz_c2f["evaluations"],
                "frozen_c2f_pose_err_cm": round(frz_c2f["pose_err_cm"], 4),
                "frozen_c2f_pose_err_deg": round(frz_c2f["pose_err_deg"], 5),
                "frozen_c2f_refine_s_calls": frz_c2f["refine_s_calls"],
                "hardened_nid": round(nid_val, 4),
                "friendly_frames_per_s": round(fps_friendly, 3),
                "mls_mpts_per_s": round(mls_runs[1] / 1e6, 3),
                "mls_vs_cpu_1thread": round(mls_ratio, 1),
                "mls_vs_cpu_30thread_ideal": round(mls_ratio / 30.0, 2),
                "hpr_grid_ms": round(hpr_runs[1], 2),
                # Round-5 variants (wide frozen cache / solver upgrades) and
                # the scene-2 schedule-robustness runs, flattened.
                **{
                    f"{name}_{field}": (
                        round(val, 4) if isinstance(val, float) else val
                    )
                    for name in extras
                    if name.startswith(("frozen_c2f_deep", "scene2_"))
                    for field, val in extras[name].items()
                },
                **(
                    {
                        "e2e_seconds": round(e2e[0], 2),
                        "e2e_stage_timings": {
                            s: round(v, 2) for s, v in e2e[1].items()
                        },
                        "e2e_mls_seconds": round(e2e[2], 2),
                        "e2e_mls_stage_timings": {
                            s: round(v, 2) for s, v in e2e[3].items()
                        },
                        "e2e_pose_err_cm": round(e2e[4], 4),
                        "e2e_pose_err_deg": round(e2e[5], 5),
                        "e2e_colored_points": e2e[6],
                    }
                    if e2e
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
