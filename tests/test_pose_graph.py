"""Pose-graph smoother: drift correction, Schur chain solve, sharded assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessor_tpu.core import se3
from pointcloudprocessor_tpu.opt import pose_graph


def _random_trajectory(rng, k=16, step=0.5):
    """Smooth ground-truth camera-to-world trajectory of K poses."""
    ts = np.cumsum(rng.uniform(0.3, step, size=(k, 3)), axis=0)
    omegas = np.cumsum(rng.uniform(-0.05, 0.05, size=(k, 3)), axis=0)
    tangents = np.concatenate([ts, omegas], axis=-1).astype(np.float32)
    return se3.exp(jnp.asarray(tangents))


def _perturb(rng, poses, trans_sigma, rot_sigma):
    k = poses.q.shape[0]
    xi = np.concatenate(
        [
            rng.normal(0, trans_sigma, size=(k, 3)),
            rng.normal(0, rot_sigma, size=(k, 3)),
        ],
        axis=-1,
    ).astype(np.float32)
    return se3.compose(poses, se3.exp(jnp.asarray(xi)))


def _drifted_odometry(rng, gt, trans_sigma=0.03, rot_sigma=0.005):
    """Integrate noisy relative motions — accumulating drift like real VO."""
    rel = pose_graph.relative_measurements(gt)
    noisy_rel = _perturb(rng, rel, trans_sigma, rot_sigma)
    qs, ts = [gt.q[0]], [gt.t[0]]
    for i in range(noisy_rel.q.shape[0]):
        nxt = se3.compose(
            se3.SE3(qs[-1], ts[-1]), se3.SE3(noisy_rel.q[i], noisy_rel.t[i])
        )
        qs.append(nxt.q)
        ts.append(nxt.t)
    return se3.SE3(jnp.stack(qs), jnp.stack(ts)), noisy_rel


def _ate(a: se3.SE3, b: se3.SE3) -> float:
    return float(jnp.sqrt(jnp.mean(jnp.sum((a.t - b.t) ** 2, axis=-1))))


def test_block_tridiagonal_matches_dense():
    rng = np.random.default_rng(0)
    k = 7
    diag = rng.normal(size=(k, 6, 6)).astype(np.float32)
    diag = diag @ diag.transpose(0, 2, 1) + 6 * np.eye(6, dtype=np.float32)
    upper = 0.1 * rng.normal(size=(k - 1, 6, 6)).astype(np.float32)
    rhs = rng.normal(size=(k, 6)).astype(np.float32)

    dense = np.zeros((6 * k, 6 * k), np.float64)
    for i in range(k):
        dense[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] = diag[i]
    for i in range(k - 1):
        dense[6 * i : 6 * i + 6, 6 * i + 6 : 6 * i + 12] = upper[i]
        dense[6 * i + 6 : 6 * i + 12, 6 * i : 6 * i + 6] = upper[i].T
    expect = np.linalg.solve(dense, rhs.reshape(-1)).reshape(k, 6)

    got = pose_graph.solve_block_tridiagonal(
        jnp.asarray(diag), jnp.asarray(upper), jnp.asarray(rhs)
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-4)


def test_recovers_drifted_trajectory():
    rng = np.random.default_rng(1)
    gt = _random_trajectory(rng, k=24)
    odom, noisy_rel = _drifted_odometry(rng, gt)
    # Absolute measurements: ground truth + small noise (the NID refinements).
    meas = _perturb(rng, gt, 0.01, 0.002)

    res = pose_graph.optimize(
        odom,
        noisy_rel,
        meas,
        abs_weight=jnp.ones(gt.q.shape[0]),
        odo_weight=1.0,
        iterations=8,
    )
    assert res.residual_norm < res.initial_residual_norm
    assert _ate(res.poses, gt) < 0.5 * _ate(odom, gt)
    assert _ate(res.poses, gt) < 0.03


def test_masked_nodes_ride_the_chain():
    """Nodes whose refinement 'failed' (weight 0) are interpolated by odometry."""
    rng = np.random.default_rng(2)
    gt = _random_trajectory(rng, k=16)
    odom, noisy_rel = _drifted_odometry(rng, gt, trans_sigma=0.02)
    meas = _perturb(rng, gt, 0.005, 0.001)
    w = np.ones(16, np.float32)
    w[5:11] = 0.0  # six consecutive keyframes without absolute measurements

    res = pose_graph.optimize(
        odom, noisy_rel, meas, abs_weight=jnp.asarray(w), odo_weight=5.0
    )
    assert _ate(res.poses, gt) < _ate(odom, gt)
    # Masked nodes must still improve over raw drifted odometry.
    masked_err = float(
        jnp.sqrt(jnp.mean(jnp.sum((res.poses.t[5:11] - gt.t[5:11]) ** 2, -1)))
    )
    masked_odo = float(
        jnp.sqrt(jnp.mean(jnp.sum((odom.t[5:11] - gt.t[5:11]) ** 2, -1)))
    )
    assert masked_err < masked_odo


def test_smooth_refined_trajectory_wrapper():
    rng = np.random.default_rng(3)
    gt = _random_trajectory(rng, k=12)
    odom, _ = _drifted_odometry(rng, gt)
    # Corrections that would take each odom pose to (noisy) ground truth.
    target = _perturb(rng, gt, 0.005, 0.001)
    corr = se3.compose(se3.inverse(odom), target)
    converged = jnp.asarray(np.ones(12, bool))

    res = pose_graph.smooth_refined_trajectory(
        odom, corr, converged=converged, odo_weight=1.0
    )
    assert _ate(res.poses, gt) < _ate(odom, gt)


def test_sharded_assembly_matches_local():
    from pointcloudprocessor_tpu.parallel import mesh as meshlib
    from pointcloudprocessor_tpu.parallel import pose_graph_shard

    rng = np.random.default_rng(4)
    gt = _random_trajectory(rng, k=16)
    odom, noisy_rel = _drifted_odometry(rng, gt)
    meas = _perturb(rng, gt, 0.01, 0.002)
    w = jnp.ones(16)

    local = pose_graph.optimize(odom, noisy_rel, meas, abs_weight=w)
    for n in (2, 8):
        m = meshlib.make_mesh(devices=jax.devices()[:n])
        sharded = pose_graph_shard.optimize_sharded(
            m, odom, noisy_rel, meas, abs_weight=w
        )
        # f32 accumulation order differs across shard layouts; both runs
        # converge to the same fixed point within solver tolerance, so
        # compare as SE(3) deltas rather than raw components.
        dt, dr = se3.delta_magnitudes(sharded.poses, local.poses)
        assert float(jnp.max(dt)) < 5e-3
        assert float(jnp.max(dr)) < 5e-3
        np.testing.assert_allclose(
            float(sharded.residual_norm), float(local.residual_norm), rtol=1e-2
        )


def test_consistent_graph_is_fixed_point():
    """Exactly-consistent measurements (zero residuals) must not produce NaN
    and must leave the trajectory unchanged."""
    c2w = se3.SE3(
        q=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (4, 1)),
        t=jnp.asarray([[0, 0, 0], [0.5, 0, 0], [1, 0, 0], [1.5, 0, 0]], jnp.float32),
    )
    res = pose_graph.smooth_refined_trajectory(
        c2w, se3.identity(batch_shape=(4,)), converged=jnp.ones(4, bool)
    )
    assert np.all(np.isfinite(np.asarray(res.poses.t)))
    np.testing.assert_allclose(np.asarray(res.poses.t), np.asarray(c2w.t), atol=1e-5)
