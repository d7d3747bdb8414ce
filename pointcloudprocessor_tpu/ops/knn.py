"""Grid-hash neighbor search — the TPU replacement for kd-trees/octrees.

The reference leans on PCL kd-trees everywhere (MLS neighborhoods
`cloudSmooth.cpp:83,127`, SOR, the color-fusion radius search
`PointCloudProcessor.cpp:480-482,571`, octree smoothing `:642-644`).
Pointer-chasing trees don't map to the TPU; instead points are bucketed by a
spatial hash of their voxel cell (`vector3i_hash.hpp:14-37` primes) into a
fixed (table_size, bucket_capacity) index table built with a sort — O(N log N)
on device, static shapes — and queries examine the 27 neighboring cells.

Guarantee: with cell_size >= search radius, every true neighbor within the
radius lies in one of the 27 cells; results are exact up to bucket overflow
(points beyond ``bucket_capacity`` per cell are dropped — size capacity to
the expected density, as the reference sizes its voxel budgets).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .voxel import voxel_coords, voxel_hash


class HashGrid(NamedTuple):
    """Bucketed point index table.

    buckets: (T, B) int32 point indices, -1 = empty slot.
    counts: (T,) int32 occupancy (may exceed B; slots beyond B dropped).
    cell_size: float used for bucketing.
    table_size: static int.
    """

    buckets: jnp.ndarray
    counts: jnp.ndarray
    cell_size: float
    table_size: int


def build(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    cell_size: float,
    table_size: int,
    bucket_capacity: int = 32,
) -> HashGrid:
    """Build the hash grid with a sort (no atomics):

    1. hash each valid point's cell,
    2. sort point indices by hash,
    3. within-bucket rank = position - first position of the hash run,
    4. scatter indices to (table, rank) for rank < capacity.
    """
    n = points.shape[0]
    h = voxel_hash(voxel_coords(points, cell_size), table_size)
    h = jnp.where(valid, h, table_size)  # invalid points -> sink bucket

    order = jnp.argsort(h)
    h_sorted = h[order]

    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    rank = iota - run_start

    counts = jnp.zeros((table_size + 1,), jnp.int32).at[h].add(
        valid.astype(jnp.int32), mode="drop"
    )

    keep = (rank < bucket_capacity) & (h_sorted < table_size)
    flat_slot = jnp.where(
        keep, h_sorted * bucket_capacity + jnp.minimum(rank, bucket_capacity - 1),
        table_size * bucket_capacity,
    )
    buckets = jnp.full((table_size * bucket_capacity + 1,), -1, jnp.int32)
    buckets = buckets.at[flat_slot].set(order.astype(jnp.int32), mode="drop")
    return HashGrid(
        buckets=buckets[:-1].reshape(table_size, bucket_capacity),
        counts=counts[:-1],
        cell_size=cell_size,
        table_size=table_size,
    )


_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)  # (27, 3)


def gather_candidates(grid: HashGrid, query_points: jnp.ndarray) -> jnp.ndarray:
    """(M, 27*B) candidate point indices (-1 = empty) from the 27 cells
    around each query point."""
    cells = voxel_coords(query_points, grid.cell_size)  # (M, 3)
    neigh = cells[:, None, :] + _OFFSETS[None, :, :]  # (M, 27, 3)
    hashes = voxel_hash(neigh, grid.table_size)  # (M, 27)
    cand = grid.buckets[hashes]  # (M, 27, B)
    return cand.reshape(cand.shape[0], -1)


def radius_neighbors(
    grid: HashGrid,
    points: jnp.ndarray,
    query_points: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    exclude_self_index: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Up to ``max_neighbors`` nearest points within ``radius`` per query.

    Returns (indices (M, K), distances (M, K), valid_mask (M, K)); invalid
    slots have index -1 and distance +inf. The nearest-first ordering comes
    from a top-k over the 27-bucket candidate set.
    """
    cand = gather_candidates(grid, query_points)  # (M, C)
    cand_valid = cand >= 0
    cand_pts = points[jnp.maximum(cand, 0)]  # (M, C, 3)
    d2 = jnp.sum((cand_pts - query_points[:, None, :]) ** 2, axis=-1)
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(cand_valid & (d2 <= radius * radius), d2, big)
    if exclude_self_index is not None:
        d2 = jnp.where(cand == exclude_self_index[:, None], big, d2)

    k = min(max_neighbors, cand.shape[1])
    neg_top, top_idx = jax.lax.top_k(-d2, k)
    top_d2 = -neg_top
    ok = top_d2 < big  # finite <=> in-radius valid candidate
    dist = jnp.sqrt(jnp.maximum(top_d2, 0.0))
    idx = jnp.take_along_axis(cand, top_idx, axis=1)
    return jnp.where(ok, idx, -1), jnp.where(ok, dist, big), ok


def chunked_radius_neighbors(
    grid: HashGrid,
    points: jnp.ndarray,
    query_points: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    chunk_size: int = 65536,
    exclude_self: bool = False,
):
    """Memory-bounded radius_neighbors: processes queries in chunks with
    `lax.map` so the (chunk, 27*B) candidate tensor stays small."""
    m = query_points.shape[0]
    pad = (-m) % chunk_size
    qp = jnp.pad(query_points, ((0, pad), (0, 0)))
    qi = jnp.pad(jnp.arange(m, dtype=jnp.int32), (0, pad), constant_values=-1)
    qp = qp.reshape(-1, chunk_size, 3)
    qi = qi.reshape(-1, chunk_size)

    def one(args):
        q, i = args
        return radius_neighbors(
            grid, points, q, radius, max_neighbors,
            exclude_self_index=i if exclude_self else None,
        )

    idx, dist, ok = jax.lax.map(one, (qp, qi))
    unpad = lambda a: a.reshape(-1, *a.shape[2:])[:m]
    return unpad(idx), unpad(dist), unpad(ok)
