import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessor_tpu.core import se3


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = jnp.asarray(random_quat(rng, (32,)))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    R = se3.quat_to_matrix(q)
    got = se3.quat_rotate(q, v)
    want = jnp.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(1)
    q = random_quat(rng, (64,))
    # Canonicalize sign (w >= 0) since q and -q are the same rotation.
    q = np.where(q[..., :1] < 0, -q, q)
    R = se3.quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(se3.matrix_to_quat(R))
    q2 = np.where(q2[..., :1] < 0, -q2, q2)
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_compose_inverse_identity():
    rng = np.random.default_rng(2)
    T = se3.SE3(jnp.asarray(random_quat(rng, (8,))), jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.abs(np.asarray(I.q[..., 0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(3)
    A = se3.SE3(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    B = se3.SE3(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    got = se3.matrix(se3.compose(A, B))
    want = se3.matrix(A) @ se3.matrix(B)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    xi = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32) * 0.5)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)


def test_exp_small_angle_stable():
    xi = jnp.asarray([1e-6, -2e-6, 3e-6, 1e-7, -1e-7, 2e-7], jnp.float32)
    T = se3.exp(xi)
    assert np.all(np.isfinite(np.asarray(T.q)))
    np.testing.assert_allclose(np.asarray(T.t), np.asarray(xi[:3]), atol=1e-8)
    # Differentiable at zero.
    g = jax.jacobian(lambda x: se3.exp(x).t)(jnp.zeros(6, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_exp_pure_rotation_matches_rodrigues():
    axis = np.array([0.0, 0.0, 1.0], np.float32)
    angle = 0.3
    xi = jnp.asarray(np.concatenate([np.zeros(3, np.float32), axis * angle]))
    T = se3.exp(xi)
    R = np.asarray(se3.quat_to_matrix(T.q))
    c, s = np.cos(angle), np.sin(angle)
    want = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, want, atol=1e-6)


def test_slerp_endpoints_and_midpoint():
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    # 90 degrees about z
    q1 = jnp.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], jnp.float32)
    np.testing.assert_allclose(np.asarray(se3.quat_slerp(q0, q1, jnp.float32(0.0))), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(se3.quat_slerp(q0, q1, jnp.float32(1.0))), np.asarray(q1), atol=1e-6)
    mid = np.asarray(se3.quat_slerp(q0, q1, jnp.float32(0.5)))
    want = np.array([np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)], np.float32)
    np.testing.assert_allclose(mid, want, atol=1e-5)


def test_slerp_shortest_path():
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    q1 = -jnp.asarray([np.cos(0.1), 0, 0, np.sin(0.1)], jnp.float32)  # negated representation
    mid = se3.quat_slerp(q0, q1, jnp.float32(0.5))
    # Rotation angle of midpoint should be ~0.1 rad (half of 0.2), not ~pi.
    ang = float(se3.quat_angle(mid))
    assert abs(ang - 0.1) < 1e-3


def test_interpolate_trajectory():
    times = jnp.asarray([0.0, 1.0, 2.0])
    quats = jnp.asarray(
        [
            [1.0, 0, 0, 0],
            [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
            [0.0, 0, 0, 1.0],
        ],
        jnp.float32,
    )
    pos = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]], jnp.float32)
    q, p = se3.interpolate_trajectory(times, quats, pos, jnp.asarray([0.5, 1.5]))
    np.testing.assert_allclose(np.asarray(p[:, 0]), [0.5, 1.5], atol=1e-6)
    np.testing.assert_allclose(float(se3.quat_angle(q[0])), np.pi / 4, atol=1e-4)


def test_delta_magnitudes():
    T0 = se3.identity()
    xi = jnp.asarray([0.1, 0, 0, 0, 0, 0.05], jnp.float32)
    T1 = se3.compose(T0, se3.exp(xi))
    dt, dr = se3.delta_magnitudes(T0, T1)
    # exp couples rho/omega through the V matrix, so |t| is only ~0.1.
    np.testing.assert_allclose(float(dt), 0.1, atol=1e-3)
    np.testing.assert_allclose(float(dr), 0.05, atol=1e-4)


def test_log_differentiable_at_identity():
    """|v| has a NaN derivative at 0; log must be written around |v|^2 so
    pose-graph Jacobians are finite when residuals are exactly zero."""
    J = jax.jacfwd(lambda xi: se3.log(se3.exp(xi)))(jnp.zeros(6, jnp.float32))
    assert np.all(np.isfinite(np.asarray(J)))
    np.testing.assert_allclose(np.asarray(J), np.eye(6), atol=1e-5)
