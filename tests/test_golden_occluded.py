"""Golden OCCLUDED-scene parity: engine vs f64 oracle where hidden-point
removal does real work (VERDICT r3 #4).

The original golden dataset is a bare wall — `hidden_points_removal`
removes essentially nothing there, so the engine-vs-oracle chain had never
exercised occlusion. This dataset plants a foreground slab at z=2
(write_dataset(occluder=True)): wall points in its shadow MUST be culled,
or their (occluder-textured) image samples poison both the NID objective
and the fused colors. Asserted here:

  1. the scene actually occludes (oracle qhull removes a meaningful
     fraction of in-frustum points);
  2. engine HPR (ops/hpr.py support-function hull, transliterating
     `view_culling.cpp:266-334` semantics) and oracle qhull agree on the
     culled SET per keyframe (Jaccard overlap);
  3. the full engine pipeline (culling.method="hpr") and the oracle
     transliteration recover the SAME correction (1 cm / 1 deg) and the
     planted SE(3) truth, with occlusion active;
  4. fused per-point colors match within quantization at a shared pose —
     including on never-shadowed wall AND occluder points.
"""

import numpy as np
import pytest

import reference_oracle as oracle
from pointcloudprocessor_tpu.io import pcd
from test_pipeline_e2e import F, H, W, small_config, write_dataset
from test_reference_oracle import _gray01, _oracle_camera, _read_odom, sharp_field


@pytest.fixture(scope="module")
def golden_occ(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden_occ")
    offset = (0.04, -0.02, 0.0)
    rot_offset = (0.004, -0.006, 0.008)
    write_dataset(root, odom_offset=offset, odom_rot_offset=rot_offset,
                  field=sharp_field, wall_slope=0.25, occluder=True)

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.pipeline import runner

    cfg = small_config(root, enable_nid_optimize=True)
    cfg.map_capacity = 16384  # the occluded map has 8500 points
    cfg.culled_capacity = 16384
    cfg.culling.method = "hpr"
    cfg.fusion.reference_compat_orientation = True
    cfg.nid.max_inner_iterations = 30
    cfg.nid.max_outer_iterations = 5
    res = runner.process(cfg)
    T_engine = np.asarray(se3.matrix(res.T_correction), np.float64)

    cam = _oracle_camera()
    data = pcd.read(str(root / "map.pcd"))
    pts = data.points.astype(np.float64)
    inten = data.fields["intensity"].astype(np.float64)
    inten = (inten - inten.min()) / max(inten.max() - inten.min(), 1e-12)
    positions, quats = _read_odom(root)
    images = [
        np.asarray(
            __import__("cv2").imread(str(root / "images" / f"{100.0 + 0.5 * i:.6f}.jpg"))
        )[:, :, ::-1]
        for i in range(3)
    ]

    keyframes, vis_sets, gate_counts = [], [], []
    for k in range(3):
        T_c2w = oracle.make_T(positions[k], quats[k])
        T_w2c = np.linalg.inv(T_c2w)
        pc = pts @ T_w2c[:3, :3].T + T_w2c[:3, 3]
        vis = oracle.hidden_points_removal(pc, cam)
        # In-frustum gate count for the "occlusion does real work" check.
        uv = np.full((len(pc), 2), -1.0)
        front = pc[:, 2] > 0
        uv[front] = cam.project(pc[front])
        ui = uv.astype(np.int64)
        inb = front & (ui[:, 0] >= 0) & (ui[:, 1] >= 0) & (ui[:, 0] < W) & (ui[:, 1] < H)
        gate_counts.append(int(inb.sum()))
        vis_sets.append(set(int(i) for i in vis))
        keyframes.append(
            (pc[vis], inten[vis], _gray01(root / "images" / f"{100.0 + 0.5 * k:.6f}.jpg"))
        )
    T_oracle = oracle.refine_pose(cam, keyframes, max_outer_iterations=5)
    rgb_o, colored_o = oracle.colorize_and_fuse(
        pts, images, positions, quats, cam, T_correction=T_engine
    )
    return dict(
        root=root, offset=np.asarray(offset), rot_offset=np.asarray(rot_offset),
        res=res, T_engine=T_engine, T_oracle=T_oracle, pts=pts,
        positions=positions, quats=quats,
        vis_sets=vis_sets, gate_counts=gate_counts,
        rgb_oracle=rgb_o, colored_oracle=colored_o,
    )


def test_occlusion_does_real_work(golden_occ):
    """The oracle's qhull HPR must remove a meaningful fraction of
    in-frustum points (the shadowed wall region behind the slab)."""
    for k, (vis, gated) in enumerate(
        zip(golden_occ["vis_sets"], golden_occ["gate_counts"])
    ):
        removed = gated - len(vis)
        assert removed / gated > 0.04, (
            f"kf {k}: qhull removed only {removed}/{gated} in-frustum points "
            "— the occluder is not occluding"
        )


def test_engine_hpr_matches_oracle_qhull_sets(golden_occ):
    """Engine HPR visibility vs oracle qhull visibility per keyframe.

    Measured structure of the disagreement (recorded round 4): the engine's
    support-function visibility is a near-exact SUBSET of qhull's — qhull
    additionally keeps ~5% of in-frustum points, and the MAJORITY of those
    are geometrically INSIDE the occluder's shadow (verified below by exact
    ray-rectangle geometry). That is the classic sparse-occluder HPR leak:
    at the reference's huge flip radius (view_culling.hpp:14, R=90000) the
    flipped depth differences are ~1e-5 relative, and hull facets spanned
    by finitely-sampled occluder points let deeper wall points poke
    through as vertices. The reference inherits that artifact from qhull;
    the engine's support test does not. Asserted: high Jaccard, engine adds
    essentially nothing beyond qhull, and every point BOTH keep outside
    the shadow region agrees."""
    import jax.numpy as jnp

    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.ops import hpr
    from synthetic import simple_camera

    camera = simple_camera()
    pts = jnp.asarray(golden_occ["pts"], jnp.float32)
    valid = jnp.ones((pts.shape[0],), bool)
    world = golden_occ["pts"]
    for k in range(3):
        T_c2w = se3.SE3(
            q=jnp.asarray(golden_occ["quats"][k], jnp.float32),
            t=jnp.asarray(golden_occ["positions"][k], jnp.float32),
        )
        _, mask = hpr.cull_world_points(
            camera, se3.inverse(T_c2w), pts, valid, impl="dense"
        )
        eng = set(np.flatnonzero(np.asarray(mask)).tolist())
        orc = golden_occ["vis_sets"][k]
        jac = len(eng & orc) / max(len(eng | orc), 1)
        assert jac > 0.92, f"kf {k}: engine/oracle culled-set Jaccard {jac:.3f}"
        # Engine visibility ⊂ qhull visibility (the engine never invents
        # visibility qhull denies, beyond a handful of tolerance-boundary
        # points).
        assert len(eng - orc) <= 0.005 * len(eng), (
            f"kf {k}: engine keeps {len(eng - orc)} points qhull hides"
        )
        # Most of qhull's extra points are geometrically shadowed (leak).
        extra = np.array(sorted(orc - eng))
        if len(extra):
            cam_pos = golden_occ["positions"][k]
            w = world[extra] - cam_pos  # rays from the true camera
            s = (2.0 - 0.0) / w[:, 2]  # occluder plane z=2, camera z=0
            hx = cam_pos[0] + s * w[:, 0]
            hy = cam_pos[1] + s * w[:, 1]
            shadowed = (
                (w[:, 2] > 2.5)  # behind the slab
                & (hx >= 0.35) & (hx <= 1.1) & (hy >= -0.45) & (hy <= 0.45)
            )
            assert shadowed.mean() > 0.5, (
                f"kf {k}: qhull-only points are NOT mostly shadow leakage "
                f"({shadowed.mean():.2f}) — investigate"
            )


def test_golden_occluded_correction_parity(golden_occ):
    T_true = np.eye(4)
    T_true[:3, :3] = oracle.exp_se3(
        np.concatenate([np.zeros(3), golden_occ["rot_offset"]])
    )[:3, :3]
    T_true[:3, 3] = golden_occ["offset"]

    dt_eo, dr_eo = oracle.delta_magnitudes(
        golden_occ["T_engine"], golden_occ["T_oracle"]
    )
    assert dt_eo < 0.01, f"engine vs oracle translation gap {dt_eo * 100:.2f} cm"
    assert np.degrees(dr_eo) < 1.0, (
        f"engine vs oracle rotation gap {np.degrees(dr_eo):.3f} deg"
    )
    for name, T in (("engine", golden_occ["T_engine"]),
                    ("oracle", golden_occ["T_oracle"])):
        dt, dr = oracle.delta_magnitudes(T, T_true)
        assert dt < 0.02, f"{name} misses planted truth by {dt * 100:.2f} cm"
        assert np.degrees(dr) < 1.0, f"{name} rotation off truth {np.degrees(dr):.3f} deg"


def test_golden_occluded_fused_colors_parity(golden_occ):
    out = pcd.read(golden_occ["res"].colored_cloud_path)
    key = {tuple(np.float32(p)): i for i, p in enumerate(golden_occ["pts"])}
    idx = np.array([key[tuple(p)] for p in out.points.astype(np.float32)])

    n = len(golden_occ["pts"])
    colored_e = np.zeros(n, bool)
    colored_e[idx] = True
    colored_o = golden_occ["colored_oracle"]
    both = colored_e & colored_o
    union = colored_e | colored_o
    # 0.94 bound: the gap is one-sided and explained — the oracle colors
    # the shadowed wall points qhull's hull leaks as visible (see
    # test_engine_hpr_matches_oracle_qhull_sets), which the engine
    # correctly leaves uncolored (measured overlap 0.947 with the fuse
    # path running HPR visibility; 0.893 when fuse used z-buffer
    # visibility while refine used HPR — the motivation for
    # colorize.fuse(culling_method=...)).
    assert both.sum() / union.sum() > 0.94, (
        f"colored-set overlap {both.sum()}/{union.sum()}"
    )

    rgb_e = np.zeros((n, 3))
    rgb_e[idx] = out.rgb
    diff = np.abs(rgb_e[both] - golden_occ["rgb_oracle"][both].astype(np.float64))
    frac_close = (diff.max(axis=1) <= 2.0).mean()
    assert frac_close > 0.95, f"only {frac_close:.3f} of points within 2 LSB"
    assert np.median(diff.max(axis=1)) <= 1.0
    # The occluder's own points (appended after the 6000 wall points) must
    # be colored with occluder texture by both sides.
    occ_rows = both & (np.arange(n) >= 6000)
    assert occ_rows.sum() > 500, "occluder points missing from fused output"
