"""2D-3D pose estimation: batched-RANSAC rotation + robust reprojection LSQ.

Rebuild of `PointCloudProcessor/src/vlcal/common/estimate_pose.cpp:20-177`
(`PoseEstimation::estimate`): from picked pixel<->3D-point correspondences,

1. a rotation-only RANSAC — the reference runs 8192 hypotheses on OpenMP
   threads with per-thread RNGs and a `#pragma omp critical` best-model
   update (:91-131); here ALL hypotheses are one vmapped batch (two-point
   triad alignment per hypothesis) reduced by `argmax`, so the whole search
   is a single device launch;
2. a full SE(3) refinement minimizing Cauchy-robust reprojection error —
   the reference uses Ceres AutoDiff + Sophus manifold with DENSE_QR
   (:148-177); here IRLS Gauss-Newton on the 6-dof tangent with `jax.grad`
   jacobians (the problem is 6-dim: the normal equations are tiny, the
   residual jacobian is the batched part).

Default parameters mirror `estimate_pose.hpp:11-19` (8192 iterations, 5 px
inlier threshold, Cauchy kernel width 10 px).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..models import camera as cam


class PoseEstimationResult(NamedTuple):
    T_camera_target: se3.SE3  # maps target(LiDAR)-frame points into the camera
    inliers: jnp.ndarray  # (N,) bool from the RANSAC stage
    num_inliers: jnp.ndarray  # scalar int32
    final_error: jnp.ndarray  # mean robust reprojection error (px) at the optimum


def _rotation_from_two_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R with R @ b_i ≈ a_i for two unit-vector pairs.

    Triad (TRIAD algorithm) alignment — the closed-form two-observation
    attitude solution, replacing the reference's 2-point Umeyama SVD
    (`estimate_pose.cpp:55-83`) with no SVD custom call.
    a, b: (2, 3) unit vectors. Returns (3, 3).
    """

    def triad(v):
        t1 = v[0]
        t2 = jnp.cross(v[0], v[1])
        t2 = t2 / jnp.maximum(jnp.linalg.norm(t2), 1e-12)
        t3 = jnp.cross(t1, t2)
        return jnp.stack([t1, t2, t3], axis=-1)  # columns

    return triad(a) @ triad(b).T


def estimate_rotation_ransac(
    camera: cam.PinholeCamera,
    pixels: jnp.ndarray,
    points_3d: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    num_iterations: int = 8192,
    error_thresh_px: float = 5.0,
) -> tuple[se3.SE3, jnp.ndarray]:
    """Rotation-only RANSAC over bearing pairs (`estimate_pose.cpp:40-145`).

    Correspondences where ``valid`` is False never vote. Returns the best
    rotation (as an SE3 with t=0) and its inlier mask.
    """
    n = pixels.shape[0]
    bearings = cam.bearing(camera, pixels)  # (N, 3)
    dirs = points_3d / jnp.maximum(
        jnp.linalg.norm(points_3d, axis=-1, keepdims=True), 1e-12
    )

    # Hypothesis index pairs; invalid rows are re-mapped to index 0 (their
    # hypotheses still compute but can't win if better ones exist).
    idx = jax.random.randint(key, (num_iterations, 2), 0, n)
    idx = jnp.where(valid[idx], idx, 0)

    def one(pair):
        R = _rotation_from_two_pairs(bearings[pair], dirs[pair])
        rot = dirs @ R.T  # (N, 3) candidate camera-frame directions
        # Inlier test in pixel space like the reference's projection check.
        px = cam.project(camera, rot)
        err = jnp.linalg.norm(px - pixels, axis=-1)
        ok = valid & (rot[..., 2] > 0) & (err < error_thresh_px)
        return jnp.sum(ok), R

    scores, Rs = jax.lax.map(one, idx, batch_size=512)
    best = jnp.argmax(scores)
    R_best = Rs[best]
    rot = dirs @ R_best.T
    px = cam.project(camera, rot)
    inliers = valid & (rot[..., 2] > 0) & (
        jnp.linalg.norm(px - pixels, axis=-1) < error_thresh_px
    )
    return se3.SE3(se3.matrix_to_quat(R_best), jnp.zeros((3,), pixels.dtype)), inliers


def _reprojection_residuals(tangent, T0, camera, pixels, points_3d):
    T = se3.compose(se3.exp(tangent), T0)
    pc = se3.transform_points(T, points_3d)
    return cam.project(camera, pc) - pixels  # (N, 2)


@functools.partial(jax.jit, static_argnames=("camera_w", "camera_h", "iterations"))
def _lsq_core(intr, dist, camera_w, camera_h, T0_q, T0_t, pixels, points_3d, w_valid,
              cauchy_kernel, iterations):
    camera = cam.PinholeCamera(intr, dist, camera_w, camera_h)
    T0 = se3.SE3(T0_q, T0_t)

    def step(_, carry):
        tangent, _ = carry
        res = _reprojection_residuals(tangent, T0, camera, pixels, points_3d)
        # Cauchy IRLS weight: rho'(s)/1 with s = ||r||^2/k^2 -> w = 1/(1+s).
        s2 = jnp.sum(res * res, axis=-1)
        w = w_valid / (1.0 + s2 / (cauchy_kernel * cauchy_kernel))
        J = jax.jacfwd(_reprojection_residuals)(tangent, T0, camera, pixels, points_3d)
        Jf = J.reshape(-1, 6)
        rf = res.reshape(-1)
        wf = jnp.repeat(w, 2)
        H = Jf.T @ (Jf * wf[:, None]) + 1e-6 * jnp.eye(6, dtype=Jf.dtype)
        g = Jf.T @ (rf * wf)
        delta = jnp.linalg.solve(H, -g)
        err = jnp.sum(w * s2) / jnp.maximum(jnp.sum(w_valid), 1.0)
        return tangent + delta, err

    tangent, err = jax.lax.fori_loop(
        0, iterations, step, (jnp.zeros((6,), pixels.dtype), jnp.asarray(0.0, pixels.dtype))
    )
    T = se3.compose(se3.exp(tangent), T0)
    return T.q, T.t, err


def estimate_pose_lsq(
    camera: cam.PinholeCamera,
    pixels: jnp.ndarray,
    points_3d: jnp.ndarray,
    valid: jnp.ndarray,
    T_init: se3.SE3,
    cauchy_kernel: float = 10.0,
    iterations: int = 20,
) -> tuple[se3.SE3, jnp.ndarray]:
    """Full 6-dof robust reprojection refinement (`estimate_pose.cpp:148-177`)."""
    q, t, err = _lsq_core(
        camera.intrinsic, camera.distortion, camera.width, camera.height,
        T_init.q, T_init.t, pixels, points_3d,
        valid.astype(pixels.dtype), jnp.asarray(cauchy_kernel, pixels.dtype),
        iterations,
    )
    return se3.SE3(q, t), err


def estimate_pose(
    camera: cam.PinholeCamera,
    pixels: jnp.ndarray,
    points_3d: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    num_ransac_iterations: int = 8192,
    error_thresh_px: float = 5.0,
    cauchy_kernel: float = 10.0,
    lsq_iterations: int = 20,
) -> PoseEstimationResult:
    """RANSAC init + LSQ refine — `PoseEstimation::estimate`
    (`estimate_pose.cpp:20-38`). Needs >= 3 correspondences (the GUI gates
    on that too, `initial_guess_manual.hpp:61-72`); >= 4 recommended.
    """
    pixels = jnp.asarray(pixels, jnp.float32).reshape(-1, 2)
    points_3d = jnp.asarray(points_3d, jnp.float32).reshape(-1, 3)
    if valid is None:
        valid = jnp.ones((pixels.shape[0],), bool)
    key = key if key is not None else jax.random.PRNGKey(8192)

    T_rot, inliers = estimate_rotation_ransac(
        camera, pixels, points_3d, valid, key,
        num_iterations=num_ransac_iterations, error_thresh_px=error_thresh_px,
    )
    T, err = estimate_pose_lsq(
        camera, pixels, points_3d, inliers, T_rot,
        cauchy_kernel=cauchy_kernel, iterations=lsq_iterations,
    )
    return PoseEstimationResult(
        T_camera_target=T,
        inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
        final_error=err,
    )
