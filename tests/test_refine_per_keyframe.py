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
    from pointcloudprocessor_tpu.opt import nid
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
    # and BFGS amplifies that into different (equally valid) stopping points
    # on the NID plateau — pose-space distance between the two runs is NOT
    # bounded by the solver's step-size convergence test (that bounds step
    # length, not distance-to-minimum). Assert what the solver actually
    # guarantees instead:
    #  1. objective-level equivalence: both runs reach the same final NID,
    #     and at least as deep as the planted ground-truth pose's NID
    #     (the plateau around the minimum is ~2e-4 NID wide over ~2 cm);
    #  2. pose-space sanity: both stay well inside the trust region around
    #     the planted truth (catches runaway solves without pretending the
    #     plateau pins the pose tighter than the objective does).
    np.testing.assert_allclose(
        np.asarray(res_s.nid), np.asarray(res_u.nid), atol=1e-3
    )
    pk = nid.prepare_keyframes(kfs)
    for i, xi in enumerate(PERTURBS):
        T_true = se3.exp(jnp.asarray(xi, jnp.float32))
        kf_i = jax.tree.map(lambda a: a[i : i + 1], pk)
        nid_true = float(nid.multi_nid_loss(c, T_true, kf_i, 16))
        for name, res in (("sharded", res_s), ("unsharded", res_u)):
            assert float(res.nid[i]) <= nid_true + 1e-3, (
                f"{name} kf{i}: nid {float(res.nid[i])} vs truth {nid_true}"
            )
            T_got = se3.SE3(res.T_camera_lidar.q[i], res.T_camera_lidar.t[i])
            dt, dr = se3.delta_magnitudes(T_true, T_got)
            assert float(dt) < 0.05, f"{name} kf{i} trans residual {float(dt)}"
            assert float(dr) < 0.035, f"{name} kf{i} rot residual {float(dr)}"
