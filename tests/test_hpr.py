"""Hidden-point removal (ops/hpr.py) vs the exact Katz construction.

The oracle is the reference's actual algorithm (spherical flip + convex
hull, `view_culling.cpp:266-334`) run exactly via scipy.spatial.ConvexHull
(same qhull library the reference links).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloudprocessor_tpu.ops import hpr

scipy_spatial = pytest.importorskip("scipy.spatial")

R = hpr.DEFAULT_RADIUS


def _two_walls(seed=0, n1=2000, n2=2000):
    rng = np.random.default_rng(seed)
    w1 = np.c_[rng.uniform(-2, 2, n1), rng.uniform(-1.5, 1.5, n1), np.full(n1, 5.0)]
    w2 = np.c_[rng.uniform(-2, 2, n2), rng.uniform(-1.5, 1.5, n2), np.full(n2, 10.0)]
    return np.vstack([w1, w2]).astype(np.float32)


def _exact_katz(pts, radius=R):
    r = np.linalg.norm(pts, axis=1, keepdims=True)
    flipped = pts * (2 * radius - r) / r
    hull = scipy_spatial.ConvexHull(np.vstack([flipped, [[0.0, 0.0, 0.0]]]))
    vis = np.zeros(len(pts) + 1, bool)
    vis[hull.vertices] = True
    return vis[:-1]


def test_spherical_flip_matches_reference_formula():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(256, 3)).astype(np.float32) * 10
    got = np.asarray(hpr.spherical_flip(jnp.asarray(pts), 100.0))
    r = np.linalg.norm(pts, axis=1, keepdims=True)
    want = pts + 2 * (100.0 - r) * pts / r  # view_culling.cpp:292
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_occluded_wall_hidden_front_wall_kept():
    pts = _two_walls()
    n1 = 2000
    mask = np.asarray(
        hpr.hpr_mask(jnp.asarray(pts), jnp.ones(len(pts), bool), block=512, chunk=1024)
    )
    # The front wall is entirely visible; the back wall (fully inside the
    # front wall's angular footprint) is majority-occluded.
    assert mask[:n1].all()
    assert mask[n1:].sum() < 0.6 * (len(pts) - n1)


def test_visible_set_is_subset_of_exact_hull():
    pts = _two_walls(seed=3)
    mask = np.asarray(
        hpr.hpr_mask(jnp.asarray(pts), jnp.ones(len(pts), bool), block=512, chunk=1024)
    )
    exact = _exact_katz(pts)
    false_pos = (mask & ~exact).sum()
    assert false_pos <= 0.01 * max(mask.sum(), 1)
    # And it must agree on the clearly-visible surface: every exact-visible
    # FRONT wall point is also ours.
    assert (exact[:2000] & ~mask[:2000]).sum() == 0


def test_invalid_and_origin_points_stay_hidden():
    pts = np.array([[0, 0, 5.0], [0, 0, 0.0], [1, 0, 5.0]], np.float32)
    valid = np.array([False, True, True])
    mask = np.asarray(hpr.hpr_mask(jnp.asarray(pts), jnp.asarray(valid), block=512, chunk=1024))
    assert not mask[0]  # invalid in, invalid out
    assert not mask[1]  # the viewpoint itself is never visible
    assert mask[2]


def test_grid_matches_dense_on_occluder_scene():
    """The O(N) parabolic-z-buffer kernel reproduces the dense support test:
    same accept/reject on >=98% of points, and identical verdicts on the
    unambiguous ones (front wall all visible; deep-shadow back-wall points
    hidden by both)."""
    pts = _two_walls(seed=5)
    valid = jnp.ones(len(pts), bool)
    dense = np.asarray(hpr.hpr_mask(jnp.asarray(pts), valid, block=512, chunk=1024))
    grid = np.asarray(hpr.hpr_mask_grid(jnp.asarray(pts), valid))
    assert grid[:2000].all(), "front wall must stay visible"
    # Disagreements are confined to the shadow-boundary band (cell
    # quantization of the parabolic penalty); direction of error is
    # toward visible, like the dense path's own tolerance slack.
    assert (grid == dense).mean() > 0.96, f"agreement {(grid == dense).mean():.3f}"
    assert (grid & ~dense).sum() >= (~grid & dense).sum() - 5, "must err toward visible"


def test_grid_visible_set_close_to_exact_hull():
    pts = _two_walls(seed=7)
    mask = np.asarray(hpr.hpr_mask_grid(jnp.asarray(pts), jnp.ones(len(pts), bool)))
    exact = _exact_katz(pts)
    false_pos = (mask & ~exact).sum()
    assert false_pos <= 0.02 * max(mask.sum(), 1)
    assert (exact[:2000] & ~mask[:2000]).sum() == 0


def test_grid_invalid_and_origin_points_stay_hidden():
    pts = np.array([[0, 0, 5.0], [0, 0, 0.0], [1, 0, 5.0], [0.5, 0.2, 5.0]], np.float32)
    valid = np.array([False, True, True, True])
    mask = np.asarray(hpr.hpr_mask_grid(jnp.asarray(pts), jnp.asarray(valid)))
    assert not mask[0] and not mask[1]
    assert mask[2] and mask[3]


def test_cull_world_points_impl_selection():
    """auto picks grid above the cutoff and dense below; both cull the
    occluded wall."""
    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.models import camera as cam

    camera = cam.PinholeCamera(
        intrinsic=jnp.asarray([100.0, 100.0, 64.0, 48.0]),
        distortion=jnp.zeros(5),
        width=128,
        height=96,
    )
    pts = _two_walls(seed=9, n1=1500, n2=1500)  # fits the f=100 frustum
    T = se3.identity()
    valid = jnp.ones(len(pts), bool)
    _, m_dense = hpr.cull_world_points(camera, T, jnp.asarray(pts), valid, impl="dense")
    _, m_grid = hpr.cull_world_points(camera, T, jnp.asarray(pts), valid, impl="grid")
    _, m_auto = hpr.cull_world_points(
        camera, T, jnp.asarray(pts), valid, impl="auto", dense_cutoff=100
    )
    m_dense, m_grid, m_auto = map(np.asarray, (m_dense, m_grid, m_auto))
    assert (m_auto == m_grid).all()  # above cutoff -> grid
    for m in (m_dense, m_grid):
        n1 = 1500
        assert m[:n1].sum() > 0.9 * n1
        assert m[n1:].sum() < 0.6 * n1


def test_cull_world_points_gates_to_frustum():
    from pointcloudprocessor_tpu.core import se3
    from pointcloudprocessor_tpu.models import camera as cam

    camera = cam.PinholeCamera(
        intrinsic=jnp.asarray([100.0, 100.0, 64.0, 48.0]),
        distortion=jnp.zeros(5),
        width=128,
        height=96,
    )
    pts = np.array(
        [[0, 0, 5.0], [0, 0, -5.0], [50.0, 0, 5.0]], np.float32
    )  # centre, behind camera, far outside image
    T = se3.identity()
    _, mask = hpr.cull_world_points(camera, T, jnp.asarray(pts), jnp.ones(3, bool))
    mask = np.asarray(mask)
    assert mask[0] and not mask[1] and not mask[2]
