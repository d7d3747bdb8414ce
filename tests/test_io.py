import os

import numpy as np
import pytest

from pointcloudprocessor_tpu.io import odometry as odom_io
from pointcloudprocessor_tpu.io import pcd
from pointcloudprocessor_tpu.pipeline import ingest, keyframes


def test_pcd_ascii_roundtrip_xyzi(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    inten = np.linspace(0, 100, 50).astype(np.float32)
    path = str(tmp_path / "a.pcd")
    pcd.write(path, pts, intensity=inten)
    back = pcd.read(path)
    np.testing.assert_allclose(back.points, pts, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(back.intensity, inten, rtol=1e-5, atol=1e-4)


def test_pcd_binary_roundtrip_rgb_mask(tmp_path):
    pts = np.random.default_rng(1).normal(size=(20, 3)).astype(np.float32)
    rgb = np.random.default_rng(2).integers(0, 256, size=(20, 3)).astype(np.float32)
    mask = np.random.default_rng(3).integers(0, 400, size=(20,)).astype(np.int32)
    path = str(tmp_path / "b.pcd")
    pcd.write(path, pts, rgb=rgb, mask_label=mask, binary=True)
    back = pcd.read(path)
    np.testing.assert_allclose(back.points, pts, atol=1e-6)
    np.testing.assert_array_equal(back.rgb, rgb)
    np.testing.assert_array_equal(back.mask_label, mask)


def test_pcd_cloud_roundtrip_with_padding(tmp_path):
    from pointcloudprocessor_tpu.core import cloud as cl

    pc = cl.make(np.ones((5, 3), np.float32), intensity=np.arange(5.0), capacity=16)
    path = str(tmp_path / "c.pcd")
    pcd.write_cloud(path, pc)
    back = pcd.read_cloud(path, capacity=16)
    assert int(back.count()) == 5
    np.testing.assert_allclose(np.asarray(back.intensity)[:5], np.arange(5.0), atol=1e-5)


def test_odometry_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    q = rng.normal(size=(10, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    traj = odom_io.Trajectory(
        times=np.arange(10) * 0.1 + 1000.0,
        positions=rng.normal(size=(10, 3)).astype(np.float32),
        quats_wxyz=q.astype(np.float32),
    )
    path = str(tmp_path / "odom.txt")
    odom_io.write(path, traj)
    back = odom_io.read(path)
    np.testing.assert_allclose(back.times, traj.times, atol=1e-6)
    np.testing.assert_allclose(back.positions, traj.positions, atol=1e-6)
    np.testing.assert_allclose(back.quats_wxyz, traj.quats_wxyz, atol=1e-6)


def test_odometry_resample():
    traj = odom_io.Trajectory(
        times=np.array([0.0, 1.0]),
        positions=np.array([[0, 0, 0], [2, 0, 0]], np.float32),
        quats_wxyz=np.array([[1, 0, 0, 0], [1, 0, 0, 0]], np.float32),
    )
    out = odom_io.resample(traj, np.array([0.25, 0.75]))
    np.testing.assert_allclose(out.positions[:, 0], [0.5, 1.5], atol=1e-6)


def test_ingest_binds_images_and_skips_missing(tmp_path):
    # Odometry with 3 frames; images exist only for 2.
    odom = tmp_path / "vo_interpolated_odom.txt"
    lines = []
    for i, ts in enumerate([100.0, 100.5, 101.0]):
        lines.append(f"{ts:.6f} {i}.0 0.0 0.0 1.0 0.0 0.0 0.0")
    odom.write_text("\n".join(lines) + "\n")
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    for ts in [100.0, 101.0]:
        (imgdir / f"{ts:.6f}.jpg").write_bytes(b"fake")
    frames = ingest.load_frames(str(odom), str(imgdir))
    assert len(frames) == 2
    assert frames[0].timestamp == 100.0
    assert frames[1].position[0] == 2.0


def test_keyframe_selection_distance():
    traj = odom_io.Trajectory(
        times=np.arange(5, dtype=np.float64),
        positions=np.array(
            [[0, 0, 0], [0.05, 0, 0], [0.12, 0, 0], [0.15, 0, 0], [0.30, 0, 0]], np.float32
        ),
        quats_wxyz=np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (5, 1)),
    )
    from pointcloudprocessor_tpu.utils.config import KeyframeConfig

    idx = keyframes.select(traj, KeyframeConfig(distance_threshold=0.1))
    # Frame 0 always; frame 2 at 0.12 from 0; frame 4 at 0.18 from 2.
    np.testing.assert_array_equal(idx, [0, 2, 4])


def test_mask_matching(tmp_path):
    odom = tmp_path / "odom.txt"
    odom.write_text("100.000000 0 0 0 1 0 0 0\n200.000000 0 0 0 1 0 0 0\n")
    src = tmp_path / "masks"
    src.mkdir()
    (src / "100.200000.png").write_bytes(b"m1")  # within 0.5 of 100.0
    (src / "150.000000.png").write_bytes(b"m2")  # too far from both
    out = tmp_path / "matched"
    n = ingest.match_masks_to_timestamps(str(src), str(odom), str(out))
    assert n == 1
    assert (out / "100.000000.png").exists()


class TestNativeCodec:
    def test_rgb_ascii_roundtrip_exact(self, tmp_path):
        """Every 8-bit channel value must survive ASCII write/read exactly
        (the blue channel lives in the packed value's low bits)."""
        from pointcloudprocessor_tpu.io import pcd

        n = 256
        pts = np.zeros((n, 3), np.float32)
        rgb = np.stack([
            np.arange(n), (np.arange(n) * 7) % 256, (np.arange(n) * 13) % 256
        ], -1).astype(np.float32)
        p = str(tmp_path / "c.pcd")
        pcd.write(p, pts, rgb=rgb)
        out = pcd.read(p)
        np.testing.assert_array_equal(out.rgb, rgb)

    def test_binary_compressed_roundtrip(self, tmp_path):
        from pointcloudprocessor_tpu.io import native, pcd

        if not native.available():
            import pytest

            pytest.skip("native codec unavailable")
        rng = np.random.default_rng(0)
        n = 5000
        pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, n).astype(np.float32)
        rgb = rng.integers(0, 256, (n, 3)).astype(np.float32)
        p = str(tmp_path / "c.pcd")
        pcd.write(p, pts, intensity=inten, rgb=rgb, mask_label=np.arange(n) % 7,
                  compressed=True)
        head = open(p, "rb").read(400)
        assert b"binary_compressed" in head
        out = pcd.read(p)
        np.testing.assert_array_equal(out.points, pts)
        np.testing.assert_array_equal(out.intensity, inten)
        np.testing.assert_array_equal(out.rgb, rgb)
        np.testing.assert_array_equal(out.mask_label, np.arange(n) % 7)

    def test_native_matches_numpy_parse(self, tmp_path):
        from pointcloudprocessor_tpu.io import native

        if not native.available():
            import pytest

            pytest.skip("native codec unavailable")
        body = b"1.5 -2e3 0.125\n7 8.25e-2 -0\nnan 1 2\n"
        t = native.parse_ascii_table(body, 3, 10)
        expect = np.array([[1.5, -2000.0, 0.125], [7.0, 0.0825, -0.0], [np.nan, 1, 2]])
        np.testing.assert_allclose(t, expect, rtol=1e-12)
