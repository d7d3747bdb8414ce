"""Probe the building blocks of the grouped slab tap-gather (round 4).

Round 3 established (README "NID kernel cost anatomy") that `jnp.take` of
(N, 2) int32 rows costs ~10 ns per INDEX on the TPU gather emitter,
invariant to table size / index order / layout — 20.5 ms for the 2.1M rows
of one NID evaluation. The round-4 design routes around the per-index cost
by gathering few, WIDE rows: raster-sorted points are grouped (G points per
group), each group fetches one aligned slab-pair (2*SLAB consecutive table
rows, reshaped so a slab is ONE take row of SLAB*2 int32), and the
group-local per-point selection runs on the MXU/VPU inside a Pallas kernel.

This probe measures, on the current backend (run it on the real chip):

  1. take-width sweep: wall time of `jnp.take` at a fixed total byte volume
     as row width grows (8 B .. 32 KB per row) — is the emitter cost per
     index (wide rows amortize it) or per byte?
  2. group-span distribution on the actual bench scene: for G-point groups
     of raster-sorted culled points, the table-row span percentiles and the
     overflow fraction vs candidate SLAB sizes (window = 2 slabs, base
     aligned down) — sizes the static slab and validates that the
     full-gather fallback would be rare.

Timing uses the chained-repetition protocol (CLAUDE.md): reps are chained
inside one jit with a data dependence through the gathered values, median
of 3 calls, with a bandwidth-derived floor tripwire.

Usage: python -m pointcloudprocessor_tpu.tools.slab_gather_probe
           [--quick] [--reps 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--skip-scene", action="store_true",
                    help="only the take-width sweep (no bench scene build)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # pragma: no cover
        print(f"# cache unavailable: {e}", file=sys.stderr)

    reps = args.reps

    # ------------------------------------------------------------------
    # 1. take-width sweep at (roughly) constant gathered byte volume.
    # ------------------------------------------------------------------
    # Control row: the NID tap gather shape per keyframe (262144 indices of
    # (2,) int32 rows from a 12.3M-row table). Wide rows: the same table
    # reshaped to (R/S, S*2) with ~N/16 group indices.
    R = 12_288_000 if not args.quick else 1_228_800
    N = 262_144 if not args.quick else 32_768

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain_take(table, idx, reps):
        # CHAIN RULES (learned the hard way — the first version of this
        # probe used `out[0] & 0` as the dependence and `out[-1]` as the
        # consumer: XLA folded the AND to zero, DCE'd all but one gathered
        # element, and LICM'd the loop — the "timings" were of nothing):
        #   1. consume EVERY gathered element (jnp.sum), so no row is dead;
        #   2. derive the next indices from a value XLA cannot constant-fold
        #      (total & 1 of unknown data), so iterations truly serialize.
        def body(i, carry):
            idx_c, acc = carry
            out = jnp.take(table, idx_c, axis=0)
            total = jnp.sum(out)  # int32 wraparound is fine; depends on all
            bump = total & jnp.int32(1)
            nrows = table.shape[0]
            return (jnp.minimum(idx_c + bump, nrows - 1), acc + total)

        _, acc = jax.lax.fori_loop(0, reps, body, (idx, jnp.int32(0)))
        return acc

    def timed(fn, floor_s, tag):
        """fn(attempt) — MUST vary its device inputs with the attempt
        index: repeat calls on identical buffers are the primary trigger
        of the axon bogus-wall bug (CLAUDE.md)."""
        walls = []
        tries = 0
        while len(walls) < 3 and tries < 9:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(tries))
            dt = time.perf_counter() - t0
            tries += 1
            if dt < floor_s:
                print(f"# bogus wall for {tag}: {dt*1e3:.3f} ms < floor "
                      f"{floor_s*1e3:.3f} ms — retry", file=sys.stderr)
                continue
            walls.append(dt)
        return sorted(walls)[len(walls) // 2] / reps if walls else float("nan")

    key = jax.random.PRNGKey(0)
    results = []
    # (slab_rows_per_take_row, n_indices): slab=1 is the per-point control.
    cases = [
        (1, N),          # control: today's per-point row gather
        (64, N // 16),   # 512 B rows
        (256, N // 16),  # 2 KB rows
        (1024, N // 16),  # 8 KB rows — the design point (G=16)
        (4096, N // 64),  # 32 KB rows — coarse-stride design point
    ]
    for slab, n_idx in cases:
        rows = R // slab
        table = jnp.arange(rows * slab * 2, dtype=jnp.int32).reshape(rows, slab * 2)
        # Sorted indices spread over the table (mimicking group bases).
        idx = jnp.sort(jax.random.randint(key, (n_idx,), 0, rows, jnp.int32))
        table, idx = jax.block_until_ready((table, idx))
        bytes_out = n_idx * slab * 2 * 4
        # HBM peak (~0.82 TB/s on v5e) is the physical floor for the
        # gathered bytes; anything under it is the axon bogus-wall bug.
        floor = max(bytes_out / 0.82e12, 2e-5) * reps
        chain_take(table, idx, reps).block_until_ready()  # compile
        dt = timed(
            lambda a: chain_take(
                table, jnp.minimum(idx + a, rows - 1), reps
            ),
            floor, f"slab{slab}",
        )
        row = {
            "probe": "take_width",
            "slab_rows": slab,
            "n_indices": n_idx,
            "row_bytes": slab * 2 * 4,
            "gathered_mb": round(bytes_out / 1e6, 1),
            "ms": round(dt * 1e3, 3),
            "ns_per_index": round(dt / n_idx * 1e9, 2),
            "gb_per_s": round(bytes_out / dt / 1e9, 1),
        }
        results.append(row)
        print(json.dumps(row))

    # ------------------------------------------------------------------
    # 1b. top_k cost at repair-selection shapes (sizes the bounded-repair
    # capacity: CLAUDE.md records lax.top_k stalling at k=262k of 1M;
    # the repair path needs k in the hundreds-to-thousands over ~131k
    # group flags — measure where the cliff is).
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("k_sel", "reps"))
    def chain_topk(flags, k_sel, reps):
        def body(i, carry):
            f, acc = carry
            vals, idxs = jax.lax.top_k(f, k_sel)
            total = jnp.sum(idxs) + jnp.sum(vals)
            return (f + (total & jnp.int32(1)), acc + total)

        _, acc = jax.lax.fori_loop(0, reps, body, (flags, jnp.int32(0)))
        return acc

    n_flags = 131072 if not args.quick else 16384
    flags = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(7), (n_flags,), 0, 2, jnp.int32)
    )
    for k_sel in (256, 2048, 8192):
        chain_topk(flags, k_sel, reps).block_until_ready()
        dt = timed(lambda a: chain_topk(flags + a, k_sel, reps), 1e-5 * reps,
                   f"topk{k_sel}")
        print(json.dumps({"probe": "top_k", "n": n_flags, "k": k_sel,
                          "ms": round(dt * 1e3, 3)}))

    # ------------------------------------------------------------------
    # 2. group-span distribution on the bench scene.
    # ------------------------------------------------------------------
    if not args.skip_scene:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
        from bench import build_bench_scene

        from ..core import se3
        from ..models import camera as cam
        from ..opt import nid

        if args.quick:
            width, height, n_map, n_cull, k = 512, 384, 100_000, 32_768, 4
        else:
            width, height, n_map, n_cull, k = 4096, 3000, 1_000_000, 262_144, 8

        camera, poses, points, inten, valid, images, kfs, T0 = build_bench_scene(
            width, height, n_map, n_cull, k
        )
        kfs = nid.sort_by_raster(camera, T0, kfs)

        @functools.partial(jax.jit, static_argnames=("stride",))
        def span_stats(kfs_pts, kfs_valid, q, t, stride: int = 1):
            def one(pts, vld):
                pts_cam = se3.transform_points(se3.SE3(q, t), pts[::stride])
                proj = cam.project(camera, pts_cam)
                knot = jnp.floor(proj).astype(jnp.int32)
                inb = (
                    vld[::stride]
                    & (knot[:, 0] >= 0) & (knot[:, 0] < camera.width)
                    & (knot[:, 1] >= 0) & (knot[:, 1] < camera.height)
                    & (pts_cam[:, 2] > 0)
                )
                anchor = knot[:, 1] * camera.width + knot[:, 0]
                return anchor, inb

            anchors, inb = jax.vmap(one)(kfs_pts, kfs_valid)
            G = 16
            n = anchors.shape[1] - anchors.shape[1] % G
            a = anchors[:, :n].reshape(-1, G)
            ok = inb[:, :n].reshape(-1, G)
            big = jnp.int32(2**31 - 1)
            lo = jnp.min(jnp.where(ok, a, big), axis=1)
            hi = jnp.max(jnp.where(ok, a, jnp.int32(-1)), axis=1)
            has = jnp.any(ok, axis=1)
            span = jnp.where(has, hi - lo, 0)
            ovf = {}
            for slab in (512, 1024, 2048, 4096, 8192):
                base = (lo // slab) * slab
                bad = jnp.any(ok & (a >= base[:, None] + 2 * slab), axis=1) & has
                ovf[slab] = jnp.mean(bad.astype(jnp.float32))
            return span, ovf

        import numpy as np

        # Span distributions at the SORT pose (stride 1 and the c2f coarse
        # subsample) AND at the solve's destination pose (identity) with
        # the points still in the sort-pose order — the pose-drift
        # measurement behind the streamed-gather default decision (README
        # "Streamed slab gather": drifted spans p50 29k / p90 74k rows).
        cases = [("sort_pose", T0.q, T0.t, 1), ("sort_pose", T0.q, T0.t, 4)]
        ident = se3.identity()
        cases.append(("drifted_to_identity", ident.q, ident.t, 1))
        for pose_tag, q, t, stride in cases:
            span, ovf = jax.block_until_ready(
                span_stats(kfs.points, kfs.valid, q, t, stride=stride)
            )
            s = np.sort(np.asarray(span))
            row = {
                "probe": "group_span",
                "pose": pose_tag,
                "stride": stride,
                "G": 16,
                "p50": int(s[len(s) // 2]),
                "p90": int(s[int(len(s) * 0.9)]),
                "p99": int(s[int(len(s) * 0.99)]),
                "p999": int(s[int(len(s) * 0.999)]),
                "max": int(s[-1]),
                "overflow_frac_by_slab": {
                    str(k_): float(v) for k_, v in ovf.items()
                },
            }
            print(json.dumps(row))


if __name__ == "__main__":
    main()
