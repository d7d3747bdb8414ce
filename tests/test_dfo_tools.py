"""Derivative-free optimizers (`include/dfo/*.hpp` parity) and the offline
tooling layer (`scripts/` parity)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessor_tpu.opt import dfo

from synthetic import simple_camera


def rosenbrock(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


class TestDFO:
    def test_nelder_mead_quadratic(self):
        f = lambda x: jnp.sum((x - jnp.asarray([1.5, -2.0, 0.5])) ** 2)
        res = dfo.nelder_mead(f, jnp.zeros(3), init_step=0.5, max_iterations=400)
        assert float(res.value) < 1e-6
        np.testing.assert_allclose(np.asarray(res.x), [1.5, -2.0, 0.5], atol=1e-3)

    def test_nelder_mead_rosenbrock(self):
        res = dfo.nelder_mead(rosenbrock, jnp.asarray([-1.0, 1.0]), init_step=0.5,
                              max_iterations=800, xtol=1e-10)
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-2)

    def test_nelder_mead_jits_and_vmaps(self):
        f = lambda x: jnp.sum(x * x)
        batched = jax.jit(jax.vmap(lambda x0: dfo.nelder_mead(f, x0, max_iterations=100).value))
        vals = batched(jnp.asarray([[1.0, 2.0], [3.0, -1.0], [0.1, 0.1]]))
        assert np.all(np.asarray(vals) < 1e-4)

    def test_direct_search(self):
        f = lambda x: jnp.sum((x - 0.7) ** 2)
        res = dfo.directional_direct_search(f, jnp.zeros(4), init_step=1.0,
                                            max_iterations=500)
        np.testing.assert_allclose(np.asarray(res.x), 0.7, atol=1e-3)

    def test_estimate_direction_matches_closed_form(self):
        """The reference's Nelder-Mead projection inversion must agree with
        the closed-form bearing (`models/camera.py`)."""
        from pointcloudprocessor_tpu.models import camera as cam

        camera = simple_camera(w=640, h=480, f=400.0,
                               distortion=[0.03, -0.01, 0.0005, -0.001, 0.0])
        px = jnp.asarray([123.0, 401.0])
        d_nm = dfo.estimate_direction_nm(camera, px)
        d_cf = cam.bearing(camera, px)
        assert float(jnp.dot(d_nm, d_cf)) > 0.99999


class TestVOInterp:
    def test_resample_roundtrip(self, tmp_path):
        from pointcloudprocessor_tpu.tools import vo_interp

        # Source track: rotation about z + linear motion, 1 Hz.
        src = tmp_path / "vo.txt"
        lines = []
        for i in range(5):
            th = 0.1 * i
            lines.append(
                f"{100 + i:.6f} {0.5 * i:.8f} 0.0 0.0 {np.cos(th / 2):.8f} 0.0 0.0 {np.sin(th / 2):.8f}"
            )
        src.write_text("\n".join(lines) + "\n")
        tgt = tmp_path / "stamps.txt"
        tgt.write_text("100.500000 junk\n102.500000 junk\n")

        rc = vo_interp.main([
            "--odometry", str(src), "--timestamps", str(tgt),
            "--output", str(tmp_path / "out.txt"),
        ])
        assert rc == 0
        from pointcloudprocessor_tpu.io import odometry as odom_io

        out = odom_io.read(str(tmp_path / "out.txt"))
        np.testing.assert_allclose(out.positions[:, 0], [0.25, 1.25], atol=1e-5)
        # Halfway rotations: angle 0.05 and 0.25 rad about z.
        np.testing.assert_allclose(
            out.quats_wxyz[:, 3], [np.sin(0.025), np.sin(0.125)], atol=1e-5
        )


class TestImageBalance:
    def test_clahe_gamma_folder(self, tmp_path):
        import cv2

        from pointcloudprocessor_tpu.tools import image_balance

        src = tmp_path / "imgs"
        os.makedirs(src)
        rng = np.random.default_rng(0)
        dark = (rng.uniform(0, 80, size=(64, 64, 3))).astype(np.uint8)
        cv2.imwrite(str(src / "a.jpg"), dark)
        n = image_balance.process_folder(str(src), str(tmp_path / "out"), gamma=0.8)
        assert n == 1
        out = cv2.imread(str(tmp_path / "out" / "a.jpg"))
        # gamma 0.8 brightens + CLAHE stretches contrast.
        assert out.mean() > dark.mean()

    def test_agc_brightens_dark_image(self):
        from pointcloudprocessor_tpu.tools import image_balance

        rng = np.random.default_rng(1)
        img = rng.uniform(10, 60, size=(80, 80, 3)).astype(np.uint8)
        out = image_balance.agc_mean_mix(img)
        assert out.dtype == np.uint8
        assert out.mean() > img.mean()

    def test_gamma_identity(self):
        from pointcloudprocessor_tpu.tools import image_balance

        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        np.testing.assert_array_equal(image_balance.adjust_gamma(img, 1.0), img)


class TestDiagnosticsAndPlots:
    def test_nid_diagnostics(self, tmp_path, capsys):
        import cv2

        from pointcloudprocessor_tpu.io import pcd
        from pointcloudprocessor_tpu.tools import nid_diagnostics

        # Cloud in camera frame at z=5 whose intensity equals the image gray.
        rng = np.random.default_rng(2)
        n = 500
        u = rng.uniform(5, 123, n)
        v = rng.uniform(5, 91, n)
        pts = np.stack([(u - 64) / 120 * 5, (v - 48) / 120 * 5, np.full(n, 5.0)], -1)
        inten = (u / 128).astype(np.float32)
        pcd.write(str(tmp_path / "c.pcd"), pts.astype(np.float32), intensity=inten)
        img = np.tile((np.arange(128) * 2).astype(np.uint8), (96, 1))
        cv2.imwrite(str(tmp_path / "i.png"), img)

        rc = nid_diagnostics.main([
            "--cloud", str(tmp_path / "c.pcd"), "--image", str(tmp_path / "i.png"),
            "--intrinsic", "120", "120", "64", "48",
            "--plot", str(tmp_path / "h.png"),
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["num_points"] == n
        assert rep["num_projected"] > 0.9 * n
        # Intensity == image gray at the projection => strongly aligned.
        assert rep["nid"] < 0.4
        assert os.path.exists(str(tmp_path / "h.png"))

    def test_trajectory_plot(self, tmp_path):
        from pointcloudprocessor_tpu.io import pcd
        from pointcloudprocessor_tpu.tools import trajectory_plot

        odom = tmp_path / "o.txt"
        odom.write_text(
            "\n".join(f"{100 + i:.6f} {0.1 * i:.6f} 0 0 1 0 0 0" for i in range(10)) + "\n"
        )
        pts = np.random.default_rng(0).uniform(-1, 1, size=(200, 3)).astype(np.float32)
        pcd.write(str(tmp_path / "m.pcd"), pts)
        rc = trajectory_plot.main([
            "--odometry", f"vo={odom}", "--cloud", str(tmp_path / "m.pcd"),
            "--output", str(tmp_path / "plot.png"),
        ])
        assert rc == 0
        assert os.path.getsize(str(tmp_path / "plot.png")) > 10_000

    def test_epoch_timestamp_precision(self, tmp_path):
        """Epoch timestamps (~1.7e9 s) must keep sub-second interpolation
        precision (float32 would quantize to ~100 s)."""
        from pointcloudprocessor_tpu.io import odometry as odom_io

        t0 = 1_690_000_000.0
        src = tmp_path / "vo.txt"
        src.write_text(
            f"{t0:.6f} 0.0 0.0 0.0 1 0 0 0\n"
            f"{t0 + 1:.6f} 1.0 0.0 0.0 1 0 0 0\n"
        )
        traj = odom_io.read(str(src))
        out = odom_io.resample(traj, np.asarray([t0 + 0.25]))
        np.testing.assert_allclose(out.positions[0, 0], 0.25, atol=1e-4)


class TestVisualization:
    def test_overlay_intensity(self):
        import jax.numpy as jnp

        from pointcloudprocessor_tpu.utils import viz

        camera = simple_camera(w=64, h=48, f=60.0)
        img = jnp.zeros((48, 64, 3), jnp.uint8)
        # One point projecting to the center pixel with intensity 1 (turbo red).
        pts = jnp.asarray([[0.0, 0.0, 2.0]])
        out = viz.overlay_intensity(
            camera, img, pts, jnp.asarray([1.0]), jnp.asarray([True]), blend=1.0
        )
        out = np.asarray(out)
        assert out[24, 32, 0] > 100  # turbo(1.0) is dark red
        assert out[0, 0].sum() == 0  # background untouched

    def test_overlay_blend_zero_keeps_image(self):
        import jax.numpy as jnp

        from pointcloudprocessor_tpu.utils import viz

        camera = simple_camera(w=32, h=24, f=30.0)
        img = jnp.full((24, 32, 3), 99, jnp.uint8)
        pts = jnp.asarray([[0.0, 0.0, 1.0]])
        out = viz.overlay_intensity(
            camera, img, pts, jnp.asarray([0.5]), jnp.asarray([True]), blend=0.0
        )
        np.testing.assert_allclose(np.asarray(out), 99.0)

    def test_visualize_cli(self, tmp_path):
        import cv2

        from pointcloudprocessor_tpu.io import pcd
        from pointcloudprocessor_tpu.tools import visualize

        rng = np.random.default_rng(0)
        n = 300
        pts = np.stack([
            rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n), np.full(n, 3.0)
        ], -1).astype(np.float32)
        pcd.write(str(tmp_path / "c.pcd"), pts, intensity=rng.uniform(0, 1, n).astype(np.float32))
        cv2.imwrite(str(tmp_path / "i.jpg"), np.full((48, 64, 3), 30, np.uint8))

        rc = visualize.main([
            "overlay", "--cloud", str(tmp_path / "c.pcd"), "--image", str(tmp_path / "i.jpg"),
            "--intrinsic", "60", "60", "32", "24",
            "--output", str(tmp_path / "ov.png"),
        ])
        assert rc == 0
        ov = cv2.imread(str(tmp_path / "ov.png"))
        assert ov.shape == (48, 64, 3)
        assert ov.max() > 60  # points drawn over the dark image

        rc = visualize.main([
            "cloud", "--cloud", str(tmp_path / "c.pcd"),
            "--output", str(tmp_path / "cl.png"),
        ])
        assert rc == 0
        assert os.path.getsize(str(tmp_path / "cl.png")) > 5_000
