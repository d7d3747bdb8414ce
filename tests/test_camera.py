import jax.numpy as jnp
import numpy as np

from pointcloudprocessor_tpu.models import camera as cam
from pointcloudprocessor_tpu.utils.config import CameraConfig


def reference_camera():
    cfg = CameraConfig()
    return cam.create_camera(cfg.model, cfg.intrinsic, cfg.distortion, cfg.width, cfg.height)


def numpy_reference_project(K, D, pts):
    """Direct numpy transliteration of the projection math semantics
    (pinhole.hpp:13-51) as an independent oracle."""
    fx, fy, cx, cy = K
    k1, k2, p1, p2, k3 = D
    x = pts[:, 0] / pts[:, 2]
    y = pts[:, 1] / pts[:, 2]
    r2 = x * x + y * y
    rc = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = rc * x + p1 * (2 * x * y) + p2 * (r2 + 2 * x * x)
    yd = rc * y + p1 * (r2 + 2 * y * y) + p2 * (2 * x * y)
    return np.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def test_project_matches_numpy_oracle():
    c = reference_camera()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(256, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 0.5
    got = np.asarray(cam.project(c, jnp.asarray(pts)))
    want = numpy_reference_project(np.asarray(c.intrinsic), np.asarray(c.distortion), pts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)


def test_center_point_projects_to_principal_point():
    c = reference_camera()
    px = np.asarray(cam.project(c, jnp.asarray([[0.0, 0.0, 1.0]])))
    np.testing.assert_allclose(px[0], np.asarray(c.intrinsic)[2:], atol=1e-3)


def test_undistort_inverts_distort():
    c = reference_camera()
    rng = np.random.default_rng(1)
    pt = jnp.asarray(rng.uniform(-0.4, 0.4, size=(128, 2)).astype(np.float32))
    pt_d = cam.distort(c, pt)
    back = cam.undistort(c, pt_d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pt), atol=1e-5)


def test_bearing_reprojects_to_pixel():
    c = reference_camera()
    pixels = jnp.asarray([[100.0, 200.0], [2000.0, 1500.0], [4000.0, 2900.0]], jnp.float32)
    dirs = cam.bearing(c, pixels)
    reproj = cam.project(c, dirs)
    np.testing.assert_allclose(np.asarray(reproj), np.asarray(pixels), atol=0.35)


def test_fov_reasonable():
    c = reference_camera()
    # fx ~ 4818, W/2 ~ 2048 -> half-FoV ~ atan(2048/4818) ~ 23 deg; corner larger.
    f = float(cam.fov(c))
    assert 0.3 < f < 0.6


def test_in_image():
    c = reference_camera()
    px = jnp.asarray([[-0.5, 10.0], [0.0, 0.0], [4095.9, 2999.9], [4096.0, 100.0]], jnp.float32)
    got = np.asarray(cam.in_image(c, px))
    np.testing.assert_array_equal(got, [False, True, True, False])


def test_cloud_roundtrip_and_crop():
    from pointcloudprocessor_tpu.core import cloud as cl

    pts = np.array([[0, 0, 0], [1, 1, 1], [10, 10, 10]], np.float32)
    pc = cl.make(pts, intensity=[1.0, 2.0, 3.0], capacity=8)
    assert pc.capacity == 8
    assert int(pc.count()) == 3
    cropped = cl.crop_box(pc, jnp.asarray([-1.0, -1, -1]), jnp.asarray([5.0, 5, 5]))
    assert int(cropped.count()) == 2
    comp = cl.compact(cropped)
    assert comp.points.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(comp.intensity), [1.0, 2.0])


def test_normalize_intensity_ignores_padding():
    from pointcloudprocessor_tpu.core import cloud as cl

    pc = cl.make(np.zeros((3, 3), np.float32), intensity=[10.0, 20.0, 30.0], capacity=6)
    out = cl.normalize_intensity(pc)
    vals = np.asarray(out.intensity)[:3]
    np.testing.assert_allclose(vals, [0.0, 0.5, 1.0], atol=1e-6)
