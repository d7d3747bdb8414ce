"""Grouped slab gather (ops/tap_gather.py): exactness vs the plain take.

The grouped path must return BIT-IDENTICAL int32 rows to
`jnp.take(table, idx, axis=0)` for every ok row, across: clean sorted
indices (pure fast path), sparse tails (bounded repair path), unsorted
indices (full-fallback cond), masked-out rows, and non-multiple sizes.
The Pallas selection kernel runs in interpret mode on CPU (same pattern as
tests/test_nid.py's Pallas histogram checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessor_tpu.ops import tap_gather


def make_table(r, seed=0):
    rng = np.random.default_rng(seed)
    # Full 32-bit patterns (nibble-packed words use all bits incl. sign).
    return jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(r, 2), dtype=np.int64).astype(np.int32)
    )


def check(table, idx, ok, **kw):
    got = tap_gather.grouped_take(
        table, jnp.asarray(idx, jnp.int32), jnp.asarray(ok), interpret=True, **kw
    )
    want = jnp.take(table, jnp.asarray(idx, jnp.int32), axis=0)
    okm = np.asarray(ok)
    assert np.array_equal(np.asarray(got)[okm], np.asarray(want)[okm])


def test_sorted_dense_exact():
    r, n = 65536, 4096
    rng = np.random.default_rng(1)
    idx = np.sort(rng.integers(0, r, n))
    check(make_table(r), idx, np.ones(n, bool))


def test_sorted_sparse_tail_uses_repair():
    # Mostly dense sorted indices with a few groups spanning huge gaps —
    # those overflow the window and must be repaired, not corrupted.
    r, n = 1 << 20, 2048
    rng = np.random.default_rng(2)
    idx = np.sort(rng.integers(0, 4096, n))  # dense cluster
    idx[512:528] = np.sort(rng.integers(0, r, 16))  # one group spans ~R
    idx[1024:1040] = np.sort(rng.integers(r // 2, r, 16))
    idx = np.sort(idx)
    check(make_table(r), idx, np.ones(n, bool))


def test_unsorted_falls_back_exact():
    r, n = 65536, 2048
    rng = np.random.default_rng(3)
    idx = rng.integers(0, r, n)  # unsorted: nearly every group overflows
    check(make_table(r), idx, np.ones(n, bool))


def test_masked_rows_ignored():
    r, n = 32768, 1024
    rng = np.random.default_rng(4)
    idx = np.sort(rng.integers(0, r, n))
    ok = rng.random(n) > 0.3
    # Invalid rows carry arbitrary indices (like behind-camera knots).
    idx[~ok] = rng.integers(0, r, (~ok).sum())
    check(make_table(r), idx, ok)


def test_non_multiple_sizes_and_tiny_table():
    check(
        make_table(1000),
        np.sort(np.random.default_rng(5).integers(0, 1000, 777)),
        np.ones(777, bool),
    )


def test_all_masked_group():
    r, n = 32768, 512
    rng = np.random.default_rng(6)
    idx = np.sort(rng.integers(0, r, n))
    ok = np.ones(n, bool)
    ok[:64] = False  # whole leading groups invalid
    check(make_table(r), idx, ok)


def test_duplicate_and_boundary_indices():
    r = 16384
    idx = np.array(
        [0, 0, 0, 1, 1, 2, 1023, 1024, 1025, 2047, 2048, 4095]
        + [r - 1] * 4
        + list(range(8000, 8000 + 16)),
        dtype=np.int64,
    )
    idx = np.sort(idx)
    check(make_table(r), idx, np.ones(len(idx), bool))


def _plane_slabs(table, slab):
    r = table.shape[0]
    pad = (-r) % slab
    w0 = jnp.pad(table[:, 0], (0, pad))
    w1 = jnp.pad(table[:, 1], (0, pad))
    n_slabs = (r + pad) // slab
    return jnp.concatenate(
        [w0.reshape(n_slabs, slab), w1.reshape(n_slabs, slab)], axis=1
    )


@pytest.mark.parametrize("case", ["dense", "sparse_tail", "unsorted", "masked"])
def test_streamed_variant_exact(case):
    """grouped_take_streamed (Pallas-DMA mega-window variant) must be
    bit-identical to the plain take across the same regimes as the
    take-windowed path: fast path, bounded repair, full fallback, masks."""
    r = 1 << 19
    rng = np.random.default_rng(hash(case) % 2**31)
    n = 4096
    if case == "dense":
        idx = np.sort(rng.integers(0, r // 8, n))
        ok = np.ones(n, bool)
    elif case == "sparse_tail":
        idx = np.sort(rng.integers(0, 2048, n))
        idx[1024:1088] = np.sort(rng.integers(0, r, 64))
        idx = np.sort(idx)
        ok = np.ones(n, bool)
    elif case == "unsorted":
        idx = rng.integers(0, r, n)
        ok = np.ones(n, bool)
    else:
        idx = np.sort(rng.integers(0, r, n))
        ok = rng.random(n) > 0.3
    table = make_table(r, seed=11)
    slab = 512
    got = tap_gather.grouped_take_streamed(
        _plane_slabs(table, slab),
        jnp.asarray(idx, jnp.int32),
        jnp.asarray(ok),
        slab=slab,
        interpret=True,
    )
    want = jnp.take(table, jnp.asarray(np.minimum(idx, r - 1), jnp.int32), axis=0)
    okm = np.asarray(ok)
    assert np.array_equal(np.asarray(got)[okm], np.asarray(want)[okm])


def test_streamed_all_masked_group_keeps_step_window():
    """An all-masked group must adopt its step's slab base, not base 0 —
    base 0 dragged the whole 32-group step's window to block 0 and flagged
    every co-step group as overflow (round-4 advisor finding). Exactness
    holds either way (the fallback is exact); this exercises the
    empty-group adoption path on dense high-index input."""
    r = 1 << 19
    rng = np.random.default_rng(17)
    n = 4096
    # Dense sorted run far from row 0, whole groups masked out.
    idx = np.sort(rng.integers(r - 8192, r, n))
    ok = np.ones(n, bool)
    ok[512:640] = False  # four whole 32-point groups
    ok[2048:2080] = False
    table = make_table(r, seed=18)
    slab = 512
    got = tap_gather.grouped_take_streamed(
        _plane_slabs(table, slab),
        jnp.asarray(idx, jnp.int32),
        jnp.asarray(ok),
        slab=slab,
        interpret=True,
    )
    want = jnp.take(table, jnp.asarray(idx, jnp.int32), axis=0)
    assert np.array_equal(np.asarray(got)[ok], np.asarray(want)[ok])


@pytest.mark.parametrize("stride", [1, 4])
def test_matches_nid_gather_shapes(stride):
    """The shapes the NID objective actually uses: K keyframes flattened
    into one call (kf-offset indices into a concatenated table)."""
    k, r, n = 3, 50_000, 4096 // stride
    rng = np.random.default_rng(7 + stride)
    tables = make_table(k * r, seed=8)
    idx = np.concatenate(
        [np.sort(rng.integers(0, r, n)) + kf * r for kf in range(k)]
    )
    ok = rng.random(k * n) > 0.1
    check(tables, idx, ok)
