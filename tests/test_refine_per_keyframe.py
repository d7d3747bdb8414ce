"""Per-keyframe NID refinement (vmapped + sharded) recovers per-keyframe
planted perturbations."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudprocessor_tpu.core import se3
from pointcloudprocessor_tpu.opt import nid, refine

from synthetic import simple_camera
from test_nid import make_keyframe, nid_scene


def _batched_scene(perturbs):
    """One NIDKeyframe batch where keyframe i's points are pre-transformed by
    the INVERSE of perturbation i — the refinement must recover exp(xi_i)."""
    c = simple_camera()
    pts, inten, img = nid_scene(c)
    kf = make_keyframe(c, pts, inten, img)
    pts_list = []
    for xi in perturbs:
        T = se3.inverse(se3.exp(jnp.asarray(xi, jnp.float32)))
        pts_list.append(se3.transform_points(T, kf.points))
    k = len(perturbs)
    return c, nid.NIDKeyframe(
        points=jnp.stack(pts_list),
        intensity=jnp.broadcast_to(kf.intensity, (k,) + kf.intensity.shape),
        valid=jnp.broadcast_to(kf.valid, (k,) + kf.valid.shape),
        bin_image=jnp.broadcast_to(kf.bin_image, (k,) + kf.bin_image.shape),
    )


PERTURBS = [
    [0.02, -0.01, 0.005, 0.004, -0.002, 0.003],
    [-0.015, 0.02, -0.01, -0.003, 0.004, -0.002],
]


def test_per_keyframe_refine_recovers_distinct_poses():
    c, kfs = _batched_scene(PERTURBS)
    res = refine.refine_pose_per_keyframe(
        c, kfs, se3.identity(), max_inner_iterations=30, max_outer_iterations=3
    )
    assert res.T_camera_lidar.t.shape == (2, 3)
    for i, xi in enumerate(PERTURBS):
        T_true = se3.exp(jnp.asarray(xi, jnp.float32))
        T_got = se3.SE3(res.T_camera_lidar.q[i], res.T_camera_lidar.t[i])
        dt, dr = se3.delta_magnitudes(T_true, T_got)
        assert float(dt) < 0.01, f"kf{i} trans residual {float(dt)}"
        assert float(dr) < 0.0175, f"kf{i} rot residual {float(dr)}"


def test_sharded_per_keyframe_matches_single_device():
    from pointcloudprocessor_tpu.parallel import mesh as mesh_lib
    from pointcloudprocessor_tpu.parallel import nid_shard

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multi-device mesh")
    c, kfs = _batched_scene(PERTURBS)
    mesh = mesh_lib.make_mesh(kf=2, pt=1, devices=jax.devices()[:2])
    res_s = nid_shard.refine_per_keyframe_sharded(
        c, kfs, se3.identity(), mesh, max_inner_iterations=30, max_outer_iterations=3
    )
    res_u = refine.refine_pose_per_keyframe(
        c, kfs, se3.identity(), max_inner_iterations=30, max_outer_iterations=3
    )
    # Compiler layout differences across shard placements perturb f32 math,
    # and BFGS amplifies that into slightly different (equally valid) minima
    # — compare within the solver's own convergence thresholds.
    dt, dr = se3.delta_magnitudes(res_s.T_camera_lidar, res_u.T_camera_lidar)
    assert float(np.max(np.asarray(dt))) < 0.01
    assert float(np.max(np.asarray(dr))) < 0.0175
    np.testing.assert_allclose(
        np.asarray(res_s.nid), np.asarray(res_u.nid), atol=1e-3
    )
