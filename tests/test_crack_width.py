"""Crack analytics: morphology primitives + 3D width measurement
(`scripts/genNormAndDistanceMask.py` parity)."""

import json
import os

import numpy as np
import pytest

from pointcloudprocessor_tpu.ops import morphology

cv2 = pytest.importorskip("cv2")


class TestMorphology:
    def test_skeletonize_bar(self):
        mask = np.zeros((40, 80), np.uint8)
        mask[15:25, 10:70] = 255  # 10-px-thick horizontal bar
        sk = morphology.skeletonize(mask)
        ys, xs = np.nonzero(sk)
        assert len(xs) > 30  # a line survived
        # Thin: every occupied column has very few pixels.
        for x in np.unique(xs):
            assert (xs == x).sum() <= 2
        # Centered on the bar.
        assert abs(ys.mean() - 19.5) < 2.0

    def test_distance_transform(self):
        mask = np.zeros((30, 30), np.uint8)
        mask[:, 10:20] = 255
        dt = morphology.distance_transform(mask)
        assert dt[15, 14] >= 4.0  # middle of the 10-px stripe
        assert dt[15, 5] == 0.0

    def test_structure_tensor_direction(self):
        mask = np.zeros((60, 60), np.uint8)
        mask[30, 5:55] = 255  # horizontal ridge
        d = morphology.structure_tensor_directions(mask, np.asarray([[30, 30]]))
        assert abs(d[0, 0]) > 0.95  # tangent along x
        assert abs(d[0, 1]) < 0.3

    def test_trace_edges(self):
        mask = np.zeros((40, 40), np.uint8)
        mask[:, 10:30] = 255
        pos = morphology.trace_edges(mask, np.asarray([[20, 20]]),
                                     np.asarray([[1.0, 0.0]]), backoff=3)
        # Exits at x=30, backs off 3 -> 27.
        assert pos[0, 0] == 27
        assert pos[0, 1] == 20


class TestCrackWidth:
    W, H, F, Z = 256, 256, 400.0, 2.0

    def _write_dataset(self, root):
        from pointcloudprocessor_tpu.io import pcd

        os.makedirs(root / "filtered_pcd")
        os.makedirs(root / "mask_select")
        os.makedirs(root / "raw_images")
        rng = np.random.default_rng(0)
        n = 6000
        u = rng.uniform(0, self.W, n)
        v = rng.uniform(0, self.H, n)
        pts = np.stack([
            (u - self.W / 2) / self.F * self.Z,
            (v - self.H / 2) / self.F * self.Z,
            np.full(n, self.Z),
        ], -1).astype(np.float32)
        pcd.write(str(root / "filtered_pcd" / "100.000000.pcd"), pts)

        mask = np.zeros((self.H, self.W), np.uint8)
        mask[40:220, 118:138] = 255  # vertical 20-px stripe
        cv2.imwrite(str(root / "mask_select" / "100.000000.png"), mask)
        cv2.imwrite(str(root / "raw_images" / "100.000000.jpg"),
                    np.full((self.H, self.W, 3), 128, np.uint8))

    def test_end_to_end_width(self, tmp_path):
        from pointcloudprocessor_tpu.tools import crack_width

        self._write_dataset(tmp_path)
        json_path = crack_width.process(
            str(tmp_path),
            intrinsic=(self.F, self.F, self.W / 2, self.H / 2),
            distortion=(0, 0, 0, 0, 0),
            width=self.W,
            height=self.H,
            skeleton_stride=20,
        )
        results = json.loads(open(json_path).read())
        widths = [m["crack_width_mm"] for m in results if m["crack_width_mm"]]
        assert len(widths) >= 3
        # 20 px at z=2 m, f=400 -> 100 mm true width; edge tracing backs off
        # 3 px per side (reference semantics) so ~70-100 mm measured.
        med = np.median(widths)
        assert 55.0 < med < 110.0, widths
        # 2D/3D consistency for each measurement: width_3d ~ px_dist/f*z.
        for m in results[:5]:
            if m["crack_width_mm"] is None:
                continue
            px = np.linalg.norm(
                np.asarray(m["left_edge_pt2d"]) - np.asarray(m["right_edge_pt2d"])
            )
            expect_mm = px / self.F * self.Z * 1e3
            assert abs(m["crack_width_mm"] - expect_mm) < 10.0
        # Artifacts written.
        assert os.path.exists(str(tmp_path / "edt_skeleton" / "100.000000_skeleton.png"))
        assert os.path.exists(str(tmp_path / "norm_masks" / "100.000000_norm.png"))
        assert os.path.exists(
            str(tmp_path / "edt_skeleton" / "100.000000_skeleton_edge_pts.png")
        )

    def test_picked_points_mode(self, tmp_path):
        from pointcloudprocessor_tpu.tools import crack_width

        self._write_dataset(tmp_path)
        picks = {"100.000000": [[128, 100], [128, 150]]}
        (tmp_path / "picks.json").write_text(json.dumps(picks))
        json_path = crack_width.process(
            str(tmp_path),
            intrinsic=(self.F, self.F, self.W / 2, self.H / 2),
            distortion=(0, 0, 0, 0, 0),
            width=self.W,
            height=self.H,
            picks_path=str(tmp_path / "picks.json"),
        )
        results = json.loads(open(json_path).read())
        assert len(results) == 2
        assert results[0]["skeleton_pt"] == [128, 100]
