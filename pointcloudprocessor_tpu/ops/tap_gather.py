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
   rows span ~`2 * group * R/N` table rows typically, with a heavy tail
   from culled-set coverage holes (measured by `tools/slab_gather_probe`:
   p99 ~4x the mean).
2. Each group fetches a WINDOW of 2 consecutive slabs as two wide
   `jnp.take` rows from the PLANE-CONCAT slab table (built once per solve
   by `opt/nid.build_tap_slabs`): slab row j = [word0 of table rows
   jS..jS+S-1 | word1 of the same rows], `2S` int32 = 16 KB at S=2048.
   The take emitter's per-index cost is amortized over 16 KB instead of
   8 B, and the take count drops from N to 2*N/group.
   Layout note: the obvious alternative — reshaping the (K, H*W, 2)
   interleaved tap-row stack — is a trap: that array's tile-padded
   default layout (minor dim 2 -> 128 lanes) is 64x = 50 GB at bench
   scale, and it materializes whenever the array crosses a jit/op
   boundary whose program prefers the default layout (measured compile-
   AND run-time OOMs). Every shape in THIS pipeline has a 128-divisible
   minor dim.
3. The group-local per-point selection runs inside a Pallas kernel
   (`_select_kernel`), entirely in VMEM/registers — XLA would either
   charge per index again (gather) or materialize gigabyte one-hots:
   each group's two window planes arrive as vregs of 128 words; a one-hot
   (G, rows) @ (rows, 128) MXU dot per u16 half-plane picks each point's
   vreg ROW, then one lane mask picks its word in each plane.
   u16-splitting keeps the f32 selection arithmetic exact — at HIGHEST
   matmul precision: the TPU default lowers f32 dots to a single bf16
   pass, which rounds the u16 VALUE operand (8-bit mantissa) and silently
   corrupts the selection (found on-chip via a diverging objective;
   interpret mode is exact f32 and hides it).
4. Exactness is unconditional: per-point overflow (a point beyond its
   group's window — sparse/holey regions) is repaired by a bounded
   re-take of the worst ``repair_groups`` groups (top_k on per-group
   overflow flags; element lookups from the slab table), and if more
   groups overflow than that — e.g. unsorted input — the whole call falls
   back to the plain per-element lookup via `lax.cond`, i.e. worst case
   ~the round-3 cost.

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
    """Group-local selection from plane-concat slab windows.

    w0/w1: (GBLK, 2*slab//128, 128) int32 — each group's two window slabs
        in plane-concat layout: the first slab//128 vreg rows are the
        word0 plane (one word per table row), the rest the word1 plane.
    offs: (GBLK, group) int32 — per-point table-row offset within the
        2-slab window, pre-clamped to [0, 2*slab).
    out: (GBLK, 2, group) int32 — the two packed words per point.
    """
    nrh = slab // 128  # vreg rows per plane per slab
    offs_all = offs_ref[:]  # (GBLK, G)
    for g in range(offs_all.shape[0]):
        a = w0_ref[g]  # (2*nrh, 128)
        b = w1_ref[g]
        plane0 = jnp.concatenate([a[:nrh], b[:nrh]], axis=0)  # (2*nrh, 128)
        plane1 = jnp.concatenate([a[nrh:], b[nrh:]], axis=0)

        offs_g = offs_all[g]  # (G,)
        # Each table row is ONE word per plane, so the word position in a
        # plane window equals the row offset: vreg row = offs >> 7,
        # lane = offs & 127 — the SAME (row, lane) in both planes.
        row_id = jax.lax.shift_right_logical(offs_g, 7)
        onehot = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (group, 2 * nrh), 1)
            == row_id[:, None],
            1.0,
            0.0,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 1)
        sel = jnp.where(lane == (offs_g & jnp.int32(127))[:, None], 1.0, 0.0)

        def pick(plane):
            # u16 split in int32 space (Mosaic has no uint32->f32 cast);
            # both halves land in [0, 65535], exact in f32.
            lo = (plane & jnp.int32(0xFFFF)).astype(jnp.float32)
            hi = jax.lax.shift_right_logical(plane, jnp.int32(16)).astype(
                jnp.float32
            )
            # HIGHEST precision: the TPU default lowers f32 dots to a
            # SINGLE bf16 pass, which rounds u16 values (>8-bit mantissa)
            # and silently corrupts the selection — caught on-chip by a
            # diverging objective (interpret mode is exact f32 and hides
            # it). These dots are tiny; exactness is non-negotiable.
            rows_lo = jax.lax.dot_general(
                onehot, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (G, 128)
            rows_hi = jax.lax.dot_general(
                onehot, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            l_ = jnp.sum(rows_lo * sel, axis=1).astype(jnp.int32)  # (G,)
            h_ = jnp.sum(rows_hi * sel, axis=1).astype(jnp.int32)
            return jax.lax.shift_left(h_, 16) | l_

        out_ref[g, 0, :] = pick(plane0)
        out_ref[g, 1, :] = pick(plane1)


def _local_select(w0, w1, offs, *, slab: int, group: int, interpret: bool):
    """(Ng, 2*slab) int32 plane-concat windows + (Ng, G) offsets
    -> (Ng, G, 2) int32."""
    ng = offs.shape[0]
    rows = 2 * slab // 128
    w0v = w0.reshape(ng, rows, 128)
    w1v = w1.reshape(ng, rows, 128)
    grid = (ng // _GBLK,)
    out = pl.pallas_call(
        functools.partial(_select_kernel, slab=slab, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_GBLK, rows, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_GBLK, rows, 128), lambda i: (i, 0, 0),
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


def _planes_lookup(table_slabs: jnp.ndarray, slab: int, idx: jnp.ndarray):
    """Exact (M, 2) int32 rows for flat indices, from the plane-concat slab
    table: two element gathers (the per-index emitter cost again — used
    only by the bounded repair and the rare full fallback)."""
    j = idx // slab
    m = idx % slab
    w0 = table_slabs[j, m]
    w1 = table_slabs[j, slab + m]
    return jnp.stack([w0, w1], axis=-1)


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
    falls back to the plain per-element lookup otherwise. See the module
    docstring.

    Convenience form for tests/small tables: builds the plane-concat slab
    layout per call. Hot paths pre-build it once per solve
    (`opt/nid.prepare_keyframes` -> ``tap_slabs``) and call
    :func:`grouped_take_slabbed`.
    """
    r, c = table.shape
    assert c == 2, "nibble-packed tap rows are (R, 2) int32"
    if slab is None:
        slab = default_slab(r, idx.shape[0], group)

    r_pad_rows = -r % slab
    n_slabs = (r + r_pad_rows) // slab
    if n_slabs < 2:
        r_pad_rows += slab * (2 - n_slabs)
        n_slabs = 2
    w0 = jnp.pad(table[:, 0], (0, r_pad_rows))
    w1 = jnp.pad(table[:, 1], (0, r_pad_rows))
    slabs = jnp.concatenate(
        [w0.reshape(n_slabs, slab), w1.reshape(n_slabs, slab)], axis=1
    )
    return grouped_take_slabbed(
        slabs,
        jnp.minimum(idx, r - 1),
        ok,
        slab=slab,
        group=group,
        repair_groups=repair_groups,
        interpret=interpret,
    )


def grouped_take_slabbed(
    table_slabs: jnp.ndarray,  # (n_slabs, 2*slab) or (K, n_slabs_kf, 2*slab)
    idx: jnp.ndarray,  # (N,) int32 flat = kf * R + anchor, near-sorted per kf
    ok: jnp.ndarray,  # (N,) bool
    *,
    slab: int,
    group: int = 16,
    repair_groups: int | None = None,
    interpret: bool = False,
    lookup_rows=None,  # (M,) flat idx -> (M, 2); default: slab-table planes
) -> jnp.ndarray:
    """Hot-path grouped take over the plane-concat slab table (possibly K
    keyframes' tables stacked — the leading-dim merge is layout-free).
    Groups spanning a keyframe boundary (N not a multiple of ``group``)
    simply overflow into the repair path — exactness is unaffected.

    ``lookup_rows``: exact per-index row fetch for the repair/fallback
    paths. The default (two element-gathers from the slab planes) costs
    ~2x a row take — callers holding the original (R, 2) row table should
    pass a row-take lookup so the UNSORTED-input fallback degrades to the
    direct path's cost (measured 65.9 ms vs 28.5 ms per eval otherwise)."""
    slabs2 = table_slabs.reshape(-1, 2 * slab)
    n_slabs = slabs2.shape[0]
    n = idx.shape[0]
    idx = jnp.minimum(idx, n_slabs * slab - 1)

    block = group * _GBLK
    n_pad = -n % block
    if n_pad:
        idx = jnp.pad(idx, (0, n_pad))
        ok = jnp.pad(ok, (0, n_pad))
    npad = idx.shape[0]
    ng = npad // group

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
        w0 = jnp.take(slabs2, slab_id, axis=0)  # (Ng, 2*slab)
        w1 = jnp.take(slabs2, slab_id + 1, axis=0)
        taps = _local_select(
            w0, w1, jnp.clip(offs, 0, 2 * slab - 1),
            slab=slab, group=group, interpret=interpret,
        )  # (Ng, G, 2)
        # Bounded repair: re-take the worst groups per point (top_k over
        # 0/1 flags returns overflowing groups first; surplus slots repair
        # healthy groups, which is an idempotent rewrite).
        _, rep_groups = jax.lax.top_k(ovf_grp.astype(jnp.int32), f_rep)
        rep_idx = idx_eff[rep_groups].reshape(-1)  # (f_rep*G,)
        rep_taps = lookup(rep_idx).reshape(f_rep, group, 2)
        taps = taps.at[rep_groups].set(rep_taps)
        return taps.reshape(npad, 2)

    def slow(_):
        return lookup(idx)

    lookup = lookup_rows or (lambda i: _planes_lookup(slabs2, slab, i))
    taps = jax.lax.cond(n_ovf > f_rep, slow, fast, None)
    return taps[:n]


# ---------------------------------------------------------------------------
# Streamed variant: Pallas-DMA mega-windows instead of XLA takes.
# ---------------------------------------------------------------------------
#
# The XLA-take windowed path above measured SLOWER than the plain per-point
# take at bench scale (round 4, tools/nid_locality: 65 ms vs 28.6 ms per
# value+grad eval): wide-row `jnp.take` tops out at ~140-215 GB/s on the
# gather emitter, so the 2x-overlapped 4.3 GB of windows cost ~30 ms before
# the selection kernel runs. This variant replaces every take with the
# Pallas PIPELINE's own block DMA: the grid walks point-steps; each step's
# two table mega-blocks are fetched by BlockSpec index_maps driven by a
# SCALAR-PREFETCHED per-step block id (monotone, so consecutive steps reuse
# blocks and total DMA ~ 2x the table at full HBM bandwidth); each group
# dynamic-slices its sub-window from the assembled window in VMEM and runs
# one one-hot MXU dot.

_SPG = 32  # groups per grid step
_WBLK = 64  # table slab-rows per mega-block
_SUBROWS = 4  # slab-rows per group sub-window


def _streamed_kernel(blk0_ref, rel_ref, ta_ref, tb_ref, offs_ref, out_ref,
                     win_ref, *, slab: int, group: int):
    """One step: assemble the 2-block window, select every group's taps.

    blk0/rel arrive as SCALAR-PREFETCH refs (full SMEM arrays — blocked
    SMEM operands hit the (8,128) divisibility rule): rel is flattened
    (n_steps*SPG,), indexed as rel_ref[i*SPG + g].
    ta/tb: (WBLK, 2*slab//128, 128) int32 mega-blocks (plane-concat rows).
    offs: (1, SPG, G) int32 — per-point table-row offset within the
        sub-window, pre-clamped to [0, SUBROWS*slab).
    out: (1, SPG, 2, G) int32.
    win_ref: VMEM scratch (2*WBLK, 2*slab//128, 128).
    """
    i = pl.program_id(0)
    wpr = 2 * slab // 128  # vreg-rows per slab-row (both planes)
    win_ref[: _WBLK] = ta_ref[:]
    win_ref[_WBLK:] = tb_ref[:]
    nsub = _SUBROWS * wpr  # vreg-rows per sub-window
    half = nsub // 2  # per plane
    offs_all = offs_ref[0]  # (SPG, G)
    for g in range(_SPG):
        sub = win_ref[pl.ds(rel_ref[i * _SPG + g], _SUBROWS)]  # (SUBROWS, wpr, 128)
        p0 = sub[:, : wpr // 2].reshape(half, 128)  # word0 plane
        p1 = sub[:, wpr // 2:].reshape(half, 128)  # word1 plane

        offs_g = offs_all[g]  # (G,)
        row_id = jax.lax.shift_right_logical(offs_g, 7)  # [0, half)
        onehot = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (group, half), 1)
            == row_id[:, None],
            1.0,
            0.0,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (group, 128), 1)
        sel = jnp.where(lane == (offs_g & jnp.int32(127))[:, None], 1.0, 0.0)

        # One dot for all four u16 half-planes: rhs (half, 512) f32.
        def split(p):
            lo = (p & jnp.int32(0xFFFF)).astype(jnp.float32)
            hi = jax.lax.shift_right_logical(p, jnp.int32(16)).astype(
                jnp.float32
            )
            return lo, hi

        lo0, hi0 = split(p0)
        lo1, hi1 = split(p1)
        rhs = jnp.concatenate([lo0, hi0, lo1, hi1], axis=1)  # (half, 512)
        # HIGHEST precision, non-negotiable: the TPU DEFAULT dot is a
        # single bf16 pass that rounds u16 values (>8-bit mantissa) and
        # silently corrupts the taps (found on-chip via a diverging
        # objective — interpret mode is exact f32 and hides it), and
        # Mosaic does not lower Precision.HIGH (bf16x3, which would also
        # be exact for one-hot selection). nid_locality's accumulator
        # tripwire re-verifies exactness on-chip.
        rows = jax.lax.dot_general(
            onehot, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, 512)

        def pick(j):
            l_ = jnp.sum(rows[:, 128 * (2 * j): 128 * (2 * j) + 128] * sel,
                         axis=1).astype(jnp.int32)
            h_ = jnp.sum(rows[:, 128 * (2 * j + 1): 128 * (2 * j + 1) + 128]
                         * sel, axis=1).astype(jnp.int32)
            return jax.lax.shift_left(h_, 16) | l_

        out_ref[0, g, 0, :] = pick(0)
        out_ref[0, g, 1, :] = pick(1)


def grouped_take_streamed(
    table_slabs: jnp.ndarray,  # (n_slabs, 2*slab) or (K, n_slabs_kf, 2*slab)
    idx: jnp.ndarray,  # (N,) int32 flat, near-sorted
    ok: jnp.ndarray,
    *,
    slab: int,
    group: int = 32,
    repair_groups: int | None = None,
    interpret: bool = False,
    lookup_rows=None,  # see grouped_take_slabbed
) -> jnp.ndarray:
    """Streamed grouped take: same contract as :func:`grouped_take_slabbed`,
    windows delivered by the Pallas pipeline's DMA instead of XLA takes."""
    slabs2 = table_slabs.reshape(-1, 2 * slab)
    n_slabs0 = slabs2.shape[0]
    n = idx.shape[0]
    idx = jnp.minimum(idx, n_slabs0 * slab - 1)

    # Pad the slab axis to a whole number of mega-blocks, at least 2.
    pad_rows = (-n_slabs0) % _WBLK
    if (n_slabs0 + pad_rows) // _WBLK < 2:
        pad_rows += _WBLK * (2 - (n_slabs0 + pad_rows) // _WBLK)
    slabs_p = (
        jnp.pad(slabs2, ((0, pad_rows), (0, 0))) if pad_rows else slabs2
    )
    n_blocks = slabs_p.shape[0] // _WBLK
    wpr = 2 * slab // 128
    slabs_v = slabs_p.reshape(-1, wpr, 128)

    block = group * _SPG
    n_pad = -n % block
    if n_pad:
        idx = jnp.pad(idx, (0, n_pad))
        ok = jnp.pad(ok, (0, n_pad))
    npad = idx.shape[0]
    ng = npad // group
    n_steps = ng // _SPG

    idx2 = idx.reshape(ng, group)
    ok2 = ok.reshape(ng, group)
    big = jnp.int32(2**31 - 1)
    any_ok = jnp.any(ok2, axis=1)
    base = jnp.min(jnp.where(ok2, idx2, big), axis=1)
    # An all-masked group must NOT drag its 32-group step's slab window to
    # block 0 (that would clip every co-step group's rel and flag them all
    # as overflow, exhausting the repair budget on well-sorted input —
    # round-4 advisor finding): exclude empty groups from the step min,
    # then give them the step's own base so their (unspecified-output)
    # lanes stay in-window.
    slab_id_real = jnp.where(any_ok, base // slab, big)
    step_slab0 = jnp.min(slab_id_real.reshape(n_steps, _SPG), axis=1)
    step_slab0 = jnp.where(step_slab0 == big, 0, step_slab0)  # all-empty step
    slab_id = jnp.where(
        any_ok,
        base // jnp.int32(slab),
        jnp.broadcast_to(step_slab0[:, None], (n_steps, _SPG)).reshape(ng),
    )
    base = jnp.where(any_ok, base, slab_id * slab)
    blk0 = jnp.clip(step_slab0 // _WBLK, 0, n_blocks - 2)  # (n_steps,)
    rel = jnp.clip(
        slab_id.reshape(n_steps, _SPG) - blk0[:, None] * _WBLK,
        0,
        2 * _WBLK - _SUBROWS,
    ).astype(jnp.int32)  # (n_steps, SPG)
    win_start = (blk0[:, None] * _WBLK + rel) * slab  # (n_steps, SPG) rows
    idx_eff = jnp.where(ok2, idx2, base[:, None]).reshape(
        n_steps, _SPG, group
    )
    offs = idx_eff - win_start[:, :, None]
    ovf_pt = ok2.reshape(n_steps, _SPG, group) & (
        (offs < 0) | (offs >= _SUBROWS * slab)
    )
    ovf_grp = jnp.any(ovf_pt, axis=2).reshape(ng)
    n_ovf = jnp.sum(ovf_grp.astype(jnp.int32))
    if repair_groups is None:
        repair_groups = max(256, ng // 32)
    f_rep = min(repair_groups, ng)
    offs_cl = jnp.clip(offs, 0, _SUBROWS * slab - 1).astype(jnp.int32)

    def fast(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # blk0 (n_steps,), rel (n_steps*SPG,)
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (_WBLK, wpr, 128), lambda i, b, r: (b[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_WBLK, wpr, 128), lambda i, b, r: (b[i] + 1, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _SPG, group), lambda i, b, r: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _SPG, 2, group), lambda i, b, r: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * _WBLK, wpr, 128), jnp.int32),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_streamed_kernel, slab=slab, group=group),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_steps, _SPG, 2, group), jnp.int32
            ),
            interpret=interpret,
        )(blk0.astype(jnp.int32), rel.reshape(-1), slabs_v, slabs_v, offs_cl)
        taps = jnp.moveaxis(out.reshape(ng, 2, group), 1, 2)  # (ng, G, 2)

        _, rep_groups = jax.lax.top_k(ovf_grp.astype(jnp.int32), f_rep)
        rep_idx = idx_eff.reshape(ng, group)[rep_groups].reshape(-1)
        rep_taps = lookup(rep_idx).reshape(f_rep, group, 2)
        taps = taps.at[rep_groups].set(rep_taps)
        return taps.reshape(npad, 2)

    def slow(_):
        return lookup(idx)

    lookup = lookup_rows or (lambda i: _planes_lookup(slabs2, slab, i))

    taps = jax.lax.cond(n_ovf > f_rep, slow, fast, None)
    return taps[:n]
