"""Statistical outlier removal on the hash grid.

Semantics of `pcl::StatisticalOutlierRemoval` as used at
`PointCloudProcessor/src/cloudSmooth.cpp:110-115,160-164` (and of the
reference's own k-NN SOR `find_inlier_points`,
`frame_cpu.cpp:625-660`): compute each point's mean distance to its k
nearest neighbors, then drop points whose mean distance exceeds
``global_mean + std_mult * global_std``.

Neighbors come from the grid within a radius bound (cell_size), so this is
the radius-bounded k-NN variant: points with fewer than ``mean_k`` neighbors
inside the search envelope use the neighbors they have (isolated points with
none are outliers by definition).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import knn


def sor_mask(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    mean_k: int = 60,
    std_mult: float = 0.7,
    cell_size: float = 0.5,
    table_size: int | None = None,
    bucket_capacity: int = 64,
    chunk_size: int = 65536,
) -> jnp.ndarray:
    """(N,) bool inlier mask."""
    n = points.shape[0]
    table_size = table_size or max(2 * n, 1024)
    grid = knn.build(points, valid, cell_size, table_size, bucket_capacity)
    idx, dist, ok = knn.chunked_radius_neighbors(
        grid, points, points, radius=cell_size, max_neighbors=mean_k,
        chunk_size=chunk_size, exclude_self=True,
    )
    cnt = jnp.sum(ok, axis=1)
    mean_d = jnp.where(
        cnt > 0, jnp.sum(jnp.where(ok, dist, 0.0), axis=1) / jnp.maximum(cnt, 1), jnp.inf
    )

    finite = valid & jnp.isfinite(mean_d)
    fw = finite.astype(points.dtype)
    denom = jnp.maximum(jnp.sum(fw), 1.0)
    mu = jnp.sum(jnp.where(finite, mean_d, 0.0)) / denom
    var = jnp.sum(jnp.where(finite, (mean_d - mu) ** 2, 0.0)) / denom
    thresh = mu + std_mult * jnp.sqrt(var)
    return valid & finite & (mean_d <= thresh)
