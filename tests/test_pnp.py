"""2D-3D pose estimation (RANSAC + robust LSQ) — semantics of
`PointCloudProcessor/src/vlcal/common/estimate_pose.cpp:20-177`."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessor_tpu.core import se3
from pointcloudprocessor_tpu.opt import pnp

from synthetic import simple_camera


def _scene(n=40, seed=0, trans=(0.05, -0.03, 0.08), angle_deg=8.0, outlier_frac=0.0):
    """3D points in the target frame + their pixels under a known pose."""
    rng = np.random.default_rng(seed)
    camera = simple_camera(w=640, h=480, f=400.0)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    th = np.radians(angle_deg)
    q = np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * axis]).astype(np.float32)
    T_true = se3.SE3(jnp.asarray(q), jnp.asarray(np.asarray(trans, np.float32)))

    # Points 8-20 m out, spread over the FoV (far => rotation-dominant, the
    # regime the reference's rotation-only RANSAC assumes).
    u = rng.uniform(60, 580, n)
    v = rng.uniform(60, 420, n)
    z = rng.uniform(8.0, 20.0, n)
    x = (u - 320) / 400.0 * z
    y = (v - 240) / 400.0 * z
    pts_cam = np.stack([x, y, z], -1).astype(np.float32)
    # Target-frame points: T_true maps target -> camera.
    pts_target = np.asarray(se3.transform_points(se3.inverse(T_true), jnp.asarray(pts_cam)))
    pixels = np.array(camera.project(jnp.asarray(pts_cam)))

    n_out = int(outlier_frac * n)
    if n_out:
        pixels[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return camera, pixels.astype(np.float32), pts_target, T_true, n_out


def _pose_error(T_est, T_true):
    dt, dr = se3.delta_magnitudes(T_est, T_true)
    return float(dt), float(np.degrees(float(dr)))


class TestEstimatePose:
    def test_clean_correspondences(self):
        camera, px, pts, T_true, _ = _scene()
        res = pnp.estimate_pose(camera, px, pts, key=jax.random.PRNGKey(0),
                                num_ransac_iterations=2048)
        dt, dr = _pose_error(res.T_camera_target, T_true)
        assert dr < 0.2, dr
        assert dt < 0.05, dt
        assert int(res.num_inliers) >= 35

    def test_with_outliers(self):
        camera, px, pts, T_true, n_out = _scene(n=60, outlier_frac=0.35, seed=1)
        res = pnp.estimate_pose(camera, px, pts, key=jax.random.PRNGKey(1),
                                num_ransac_iterations=4096)
        dt, dr = _pose_error(res.T_camera_target, T_true)
        assert dr < 0.3, dr
        assert dt < 0.08, dt
        # RANSAC must reject the planted outliers.
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() <= 2
        assert inl[n_out:].mean() > 0.8

    def test_distorted_camera(self):
        camera, px, pts, T_true, _ = _scene(seed=2)
        cam_d = simple_camera(w=640, h=480, f=400.0,
                              distortion=[0.05, -0.01, 0.001, -0.002, 0.0])
        # Re-render pixels through the distorted model.
        pts_cam = se3.transform_points(T_true, jnp.asarray(pts))
        px_d = np.asarray(cam_d.project(pts_cam))
        res = pnp.estimate_pose(cam_d, px_d, pts, key=jax.random.PRNGKey(2),
                                num_ransac_iterations=2048)
        dt, dr = _pose_error(res.T_camera_target, T_true)
        assert dr < 0.3, dr
        assert dt < 0.08, dt

    def test_lsq_alone_refines(self):
        camera, px, pts, T_true, _ = _scene(seed=3)
        # Perturb the truth and refine from it.
        T0 = se3.compose(
            se3.exp(jnp.asarray([0.02, -0.01, 0.03, 0.01, -0.015, 0.02], jnp.float32)),
            T_true,
        )
        valid = jnp.ones((px.shape[0],), bool)
        T, err = pnp.estimate_pose_lsq(camera, jnp.asarray(px), jnp.asarray(pts), valid, T0)
        dt, dr = _pose_error(T, T_true)
        assert dr < 0.05, dr
        assert dt < 0.02, dt
        assert float(err) < 1.0
