"""Grouped slab gather: the TPU-shaped replacement for the per-point
tap-table row gather.

Problem (README "NID kernel cost anatomy", round 3): `jnp.take` of (N, 2)
int32 rows costs ~10 ns per INDEX on XLA's TPU gather emitter — 20.5 ms for
the 2.1M rows of one NID evaluation, ~200x the HBM bandwidth floor —
invariant to table size, index order and layout (all measured), so no
XLA-level rewrite reaches it. The per-index cost is also why a group-local
`take_along_axis` would win nothing: XLA charges per index regardless of
how small the source is.

Design (round 4): exploit that the NID points are RASTER-SORTED
(`opt/nid.sort_by_raster`), so consecutive points hit near-monotone table
rows:

1. Points form groups of ``group`` (=16) consecutive entries. A group's
   rows span ~`group * R/N` table rows (~750 at bench scale, measured by
   `tools/slab_gather_probe`).
2. Each group fetches a WINDOW of `2*slab` consecutive table rows as TWO
   wide `jnp.take` rows: the table reshaped to (R/slab, slab*2) makes one
   slab a single take row of `slab*2` int32 (8 KB at slab=1024) — the
   emitter's per-index cost is amortized over 8 KB instead of 8 B, and the
   take count drops from N to 2*N/group (65x fewer).
3. The group-local per-point selection runs inside a Pallas kernel
   (`_select_kernel`), entirely in VMEM/registers — XLA would either
   charge per index again (gather) or materialize gigabyte one-hots:
   each group's window arrives as vregs of 128 packed words; a one-hot
   (G, 32) @ (32, 128) MXU dot per u16-plane picks each point's vreg ROW,
   then a lane mask picks its two adjacent words. u16-splitting keeps the
   f32 selection arithmetic exact (values < 2^16; one-hot products and
   their sums are exact in f32 regardless of matmul precision).
4. Exactness is unconditional: per-point overflow (a point beyond its
   group's window — sparse image regions) is repaired by a bounded
   per-point re-take of up to ``repair_groups`` worst groups (top_k on the
   per-group overflow flags), and if more groups overflow than that — e.g.
   unsorted input — the whole call falls back to the plain per-point
   `jnp.take` via `lax.cond`, i.e. worst case equals the round-3 cost.

The kernel is forward-only (taps are int32; pose gradients flow through
the fractional offsets, never through the gather — same structure as
`nid_cost.hpp:78-92`, where Ceres Jets only see the spline weights).

Reference semantics replaced: per-point image window reads inside the Ceres
cost (`PointCloudProcessor/include/vlcal/costs/nid_cost.hpp:78-92`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GBLK = 16  # groups per Pallas grid step


def _pow2ceil(x: int) -> int:
    return 1 << max(int(math.ceil(math.log2(max(x, 1)))), 0)


def default_slab(n_rows: int, n_idx: int, group: int) -> int:
    """Static slab size from the mean table-rows-per-index density.

    The window (2 slabs, base aligned down to a slab multiple) guarantees
    coverage of spans up to ``slab + 1`` rows. Group spans are HEAVY-TAILED
    (measured on the full-scale bench scene, `tools/slab_gather_probe`:
    p50 = 0.8x the mean*group, p90 = 1.7x, p99 = 3.9x, p99.9 = 9.5x — the
    tail comes from culled-set coverage holes, e.g. occluder shadows), so
    the slab targets ~2.7x the mean (pow2ceil of 2x): measured overflow at
    that size is ~1% of groups, which the bounded repair pass absorbs
    (`repair_groups` scales with the group count). A mean-sized slab
    (factor 1) measured 6.3% overflow — past any sane repair bound, i.e.
    permanent full-fallback.
    """
    density = max(n_rows // max(n_idx, 1), 1)
    return min(max(_pow2ceil(2 * group * density), 512), 1 << 16)


def _select_kernel(w0_ref, w1_ref, offs_ref, out_ref, *, slab: int, group: int):
    """Group-local selection: out[g, :, p] = window[g, offs[g, p], :].

    w0/w1: (GBLK, slab*2//128, 128) int32 — each group's two window slabs,
        flattened (row-major: table row r's words at flat positions 2r,
        2r+1) and pre-reshaped to vreg rows of 128 words.
    offs: (GBLK, group) int32 — per-point table-row offset within the
        window, pre-clamped to [0, 2*slab).
    out: (GBLK, 2, group) int32 — the two packed words per point.
    """
    rows_per_slab = slab * 2 // 128
    n_rows = 2 * rows_per_slab
    offs_all = offs_ref[:]  # (GBLK, G)
    for g in range(offs_all.shape[0]):
        win = jnp.concatenate([w0_ref[g], w1_ref[g]], axis=0)  # (n_rows, 128)
        win_u = win.astype(jnp.uint32)
        lo = (win_u & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (win_u >> jnp.uint32(16)).astype(jnp.float32)

        offs_g = offs_all[g]  # (G,)
        # Level A (MXU): pick each point's vreg row. Word index = 2*offs,
        # so vreg row = offs >> 6 and lane = (offs & 63) * 2; the second
        # word is always at lane+1 (<= 127), i.e. in the SAME vreg row.
        row_id = jax.lax.shift_right_logical(offs_g, 6)  # (G,)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (group, n_rows), 1)
            == row_id[:, None]
        ).astype(jnp.float32)
        # One-hot selection sums are exact in f32 at any matmul precision
        # (each output is a single u16-ranged term plus exact zeros).
        rows_lo = jax.lax.dot_general(
            onehot, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, 128)
        rows_hi = jax.lax.dot_general(
            onehot, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # Level B (VPU): lane masks for the two adjacent words.
        lane = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 1)
        c = (offs_g & jnp.int32(63))[:, None] * 2
        sel0 = (lane == c).astype(jnp.float32)
        sel1 = (lane == c + 1).astype(jnp.float32)

        def pick(sel):
            l_ = jnp.sum(rows_lo * sel, axis=1).astype(jnp.int32)  # (G,)
            h_ = jnp.sum(rows_hi * sel, axis=1).astype(jnp.int32)
            return jax.lax.shift_left(h_, 16) | l_

        out_ref[g, 0, :] = pick(sel0)
        out_ref[g, 1, :] = pick(sel1)


def _local_select(w0, w1, offs, *, slab: int, group: int, interpret: bool):
    """(Ng, slab*2) int32 windows + (Ng, G) offsets -> (Ng, G, 2) int32."""
    ng = offs.shape[0]
    rows_per_slab = slab * 2 // 128
    w0v = w0.reshape(ng, rows_per_slab, 128)
    w1v = w1.reshape(ng, rows_per_slab, 128)
    grid = (ng // _GBLK,)
    out = pl.pallas_call(
        functools.partial(_select_kernel, slab=slab, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_GBLK, rows_per_slab, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_GBLK, rows_per_slab, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_GBLK, group), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_GBLK, 2, group), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ng, 2, group), jnp.int32),
        interpret=interpret,
    )(w0v, w1v, offs)
    return jnp.moveaxis(out, 1, 2)  # (Ng, G, 2)


def _use_grouped_default() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def grouped_take(
    table: jnp.ndarray,  # (R, 2) int32
    idx: jnp.ndarray,  # (N,) int32 in [0, R), near-sorted for speed
    ok: jnp.ndarray,  # (N,) bool — rows with ~ok return unspecified data
    *,
    group: int = 16,
    slab: int | None = None,
    repair_groups: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact `jnp.take(table, idx, axis=0)` for every ``ok`` row (rows with
    ``~ok`` contain unspecified values — callers mask them downstream, as
    the NID inlier gate already does). Fast when ``idx`` is near-sorted;
    falls back to the plain take otherwise. See the module docstring."""
    r, c = table.shape
    assert c == 2, "nibble-packed tap rows are (R, 2) int32"
    n = idx.shape[0]
    if slab is None:
        slab = default_slab(r, n, group)

    block = group * _GBLK
    n_pad = -n % block
    if n_pad:
        idx = jnp.pad(idx, (0, n_pad))
        ok = jnp.pad(ok, (0, n_pad))
    npad = idx.shape[0]
    ng = npad // group

    r_pad_rows = -r % slab
    n_slabs = (r + r_pad_rows) // slab
    if n_slabs < 2:
        r_pad_rows += slab * (2 - n_slabs)
        n_slabs = 2
    table_p = (
        jnp.pad(table, ((0, r_pad_rows), (0, 0))) if r_pad_rows else table
    )

    idx2 = idx.reshape(ng, group)
    ok2 = ok.reshape(ng, group)
    big = jnp.int32(2**31 - 1)
    base = jnp.min(jnp.where(ok2, idx2, big), axis=1)
    base = jnp.where(jnp.any(ok2, axis=1), base, 0)
    slab_id = jnp.clip(base // slab, 0, n_slabs - 2)  # window = [id, id+2)*slab
    idx_eff = jnp.where(ok2, idx2, base[:, None])
    offs = idx_eff - slab_id[:, None] * slab
    ovf_pt = ok2 & (offs >= 2 * slab)
    ovf_grp = jnp.any(ovf_pt, axis=1)
    n_ovf = jnp.sum(ovf_grp.astype(jnp.int32))
    if repair_groups is None:
        # ~1.5% of groups: above the measured ~1% overflow at the default
        # slab, well below top_k's cost cliff (probe: k in the low
        # thousands over ~131k flags is cheap).
        repair_groups = max(256, ng // 64)
    f_rep = min(repair_groups, ng)

    def fast(_):
        tblr = table_p.reshape(n_slabs, slab * 2)
        w0 = jnp.take(tblr, slab_id, axis=0)  # (Ng, slab*2)
        w1 = jnp.take(tblr, slab_id + 1, axis=0)
        taps = _local_select(
            w0, w1, jnp.clip(offs, 0, 2 * slab - 1),
            slab=slab, group=group, interpret=interpret,
        )  # (Ng, G, 2)
        # Bounded repair: re-take the worst groups per point (top_k over
        # 0/1 flags returns overflowing groups first; surplus slots repair
        # healthy groups, which is an idempotent rewrite).
        _, rep_groups = jax.lax.top_k(ovf_grp.astype(jnp.int32), f_rep)
        rep_idx = idx_eff[rep_groups].reshape(-1)  # (f_rep*G,)
        rep_taps = jnp.take(table_p, rep_idx, axis=0).reshape(f_rep, group, 2)
        taps = taps.at[rep_groups].set(rep_taps)
        return taps.reshape(npad, 2)

    def slow(_):
        return jnp.take(table_p, jnp.clip(idx, 0, r - 1), axis=0)

    taps = jax.lax.cond(n_ovf > f_rep, slow, fast, None)
    return taps[:n]
