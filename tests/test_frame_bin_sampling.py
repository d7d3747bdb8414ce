"""Binary frame-directory codec + randomgrid sampling semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudprocessor_tpu.io import frame_bin
from pointcloudprocessor_tpu.ops import voxel


def _frame(n=100, seed=0):
    rng = np.random.default_rng(seed)
    cov = rng.normal(size=(n, 3, 3))
    return frame_bin.FrameBin(
        points=rng.normal(size=(n, 3)),
        times=rng.uniform(0, 1, n),
        normals=rng.normal(size=(n, 3)),
        covs=(cov + cov.transpose(0, 2, 1)) / 2,
        intensities=rng.uniform(0, 255, n),
        aux={"label": rng.integers(0, 255, (n, 2), dtype=np.uint8)},
    )


def test_frame_bin_roundtrip_compact(tmp_path):
    f = _frame()
    frame_bin.save(str(tmp_path), f, compact=True)
    g = frame_bin.load(str(tmp_path))
    np.testing.assert_allclose(g.points, f.points, atol=1e-6)
    np.testing.assert_allclose(g.times, f.times, atol=1e-6)
    np.testing.assert_allclose(g.normals, f.normals, atol=1e-6)
    np.testing.assert_allclose(g.covs, f.covs, atol=1e-6)
    np.testing.assert_allclose(g.intensities, f.intensities, atol=1e-4)
    np.testing.assert_array_equal(g.aux["label"], f.aux["label"])


def test_frame_bin_roundtrip_full_precision(tmp_path):
    f = _frame(seed=1)
    frame_bin.save(str(tmp_path), f, compact=False)
    g = frame_bin.load(str(tmp_path))
    np.testing.assert_array_equal(g.points, f.points)
    np.testing.assert_array_equal(g.covs, f.covs)


def test_frame_bin_full_takes_precedence_over_compact(tmp_path):
    """frame_cpu.cpp:152,191 — points.bin branch wins when both exist."""
    f = _frame(seed=2)
    frame_bin.save(str(tmp_path), f, compact=False)
    g = frame_bin.FrameBin(points=f.points[:10] + 100.0)
    frame_bin.save(str(tmp_path), g, compact=True)
    loaded = frame_bin.load(str(tmp_path))
    assert loaded.size == f.size
    np.testing.assert_array_equal(loaded.points, f.points)


def test_frame_bin_missing_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        frame_bin.load(str(tmp_path))


def test_randomgrid_sampling_budget_semantics():
    """Dense voxels are trimmed to the budget; sparse voxels are kept whole."""
    rng = np.random.default_rng(0)
    # 10 voxels of 100 points each (clusters jittered WITHIN one 0.1-voxel)
    # + 100 voxels of 1 point each.
    centers = rng.integers(100, 200, (10, 3)).astype(np.float64) * 0.1
    dense = np.repeat(centers, 100, axis=0) + rng.uniform(0.005, 0.095, (1000, 3))
    sparse = np.arange(100)[:, None] * np.array([1.0, 0, 0]) + 0.05
    pts = jnp.asarray(np.vstack([dense, sparse]), jnp.float32)
    valid = jnp.ones(len(pts), bool)
    rate = 0.2
    mask = np.asarray(
        voxel.randomgrid_sampling_mask(jax.random.key(0), pts, valid, 0.1, rate)
    )
    n, n_voxels = len(pts), 110
    budget = int(np.ceil(rate * n / n_voxels))  # frame_cpu.cpp:484
    # Single-point voxels are kept whole (modulo rare hash-slot merges).
    assert mask[1000:].sum() >= 95
    # Dense voxels are trimmed to the budget (again modulo slot merges).
    kept_dense = mask[:1000].reshape(10, 100).sum(1)
    assert (kept_dense <= budget).all()
    assert (kept_dense == budget).sum() >= 8
    assert mask.sum() <= int(1.2 * rate * n)  # global cap (:485)


def test_randomgrid_sampling_high_rate_noop():
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(64, 3)), jnp.float32)
    valid = jnp.arange(64) % 2 == 0
    mask = voxel.randomgrid_sampling_mask(jax.random.key(0), pts, valid, 0.1, 1.0)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(valid))


def test_sort_by_time_orders_all_attributes():
    f = _frame(seed=4)
    g = frame_bin.sort_by_time(f)
    assert (np.diff(g.times) >= 0).all()
    order = np.argsort(f.times, kind="stable")
    np.testing.assert_array_equal(g.points, f.points[order])
    np.testing.assert_array_equal(g.aux["label"], f.aux["label"][order])


def test_point_to_plane_distance():
    from pointcloudprocessor_tpu.tools.crack_width import point_to_plane_distance

    # Plane z=1 (normal +z, scaled to check normalization), point at z=4.
    assert np.isclose(point_to_plane_distance([0, 0, 1], [0, 0, 2.0], [5, 7, 4]), 3.0)
