"""Experiment (VERDICT r4 #3): can a VMEM-resident Pallas z-buffer beat the
XLA scatter-min that dominates colorize?

Round-4 anatomy (`tools/colorize_anatomy`): the per-keyframe z-buffer cull
costs 13.7 of 22.2 ms/frame — a scatter-min of 1M ranges into the 14x-
downsampled 293x215 ~63k-cell buffer plus the per-point cell-min gather
back. The buffer is ~250 KB: it fits in VMEM ~64x over, so the round-4
README flagged a VMEM-resident Pallas kernel as the untried design once
refine stopped dominating (its re-judge trigger fired in round 4).

The Pallas design measured here: grid over point blocks; the z-buffer
lives in a VMEM scratch accumulator across all grid steps; each step
scalar-loops its block's points, updating buf[cell] = min(buf, r) with
dynamic element stores. TPU has no vector scatter, so the scalar core
(~1 op/cycle) is the only expression of this — the question is whether
its per-point cost undercuts XLA's measured ~7 ns/index scatter emitter.

Also measured: the XLA scatter-min alone, the cell-min gather alone, and
both fused (the production shape of `ops/zbuffer.cull_mask_uv`).

Usage:
  python -m pointcloudprocessor_tpu.tools.zbuffer_probe [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 2048  # points per grid step


def _zmin_kernel(cell_ref, rng_ref, out_ref, acc_ref, *, n_rows):
    """One grid step: scalar-loop a point block into the SMEM accumulator
    (TPU has no vector scatter; SMEM is the only memory with cheap dynamic
    per-element addressing); the final step copies the accumulator out."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        def init(j, _):
            acc_ref[j >> 7, j & 127] = jnp.float32(3.0e38)
            return 0

        jax.lax.fori_loop(0, n_rows * 128, init, 0)

    def body(j, _):
        c = cell_ref[j >> 7, j & 127]
        r = rng_ref[j >> 7, j & 127]
        row = jax.lax.shift_right_logical(c, 7)
        lane = c & 127
        acc_ref[row, lane] = jnp.minimum(acc_ref[row, lane], r)
        return 0

    jax.lax.fori_loop(0, _BLK, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        def copy(j, _):
            out_ref[j >> 7, j & 127] = acc_ref[j >> 7, j & 127]
            return 0

        jax.lax.fori_loop(0, n_rows * 128, copy, 0)


def pallas_zmin(cell, rng, n_cells, interpret=False):
    """(N,) cells + ranges -> (rows, 128) z-buffer via the scalar kernel."""
    n = cell.shape[0]
    n_rows = -(-n_cells // 128)
    n_rows = -(-n_rows // 8) * 8  # (8, 128) tile multiple
    grid = (n // _BLK,)
    return pl.pallas_call(
        functools.partial(_zmin_kernel, n_rows=n_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (_BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_rows, 128), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((n_rows, 128), jnp.float32)],
        interpret=interpret,
    )(cell.reshape(-1, 128), rng.reshape(-1, 128))


@functools.partial(jax.jit, static_argnames=("reps", "n_cells", "impl", "interpret"))
def timed_zmin(cell, rng, reps, n_cells, impl, interpret=False):
    """Chained scatter-min repetitions (unfoldable chain, full consume)."""

    def xla_zmin(c, r):
        buf = jnp.full((n_cells + 1,), 3.0e38, jnp.float32)
        return buf.at[c].min(r, mode="drop")

    def body(_, carry):
        c0, acc = carry
        if impl == "pallas":
            buf = pallas_zmin(c0, rng, n_cells, interpret)
        elif impl == "xla":
            buf = xla_zmin(c0, rng)
        else:  # xla scatter + per-point cell-min gather (production shape)
            buf = xla_zmin(c0, rng)
            per_pt = buf[c0]
            buf = buf[: n_cells + 1] * 1.0
            acc = acc + jnp.sum(per_pt) * 1e-30
        # Chain: the next iteration's cells depend on the FULL buffer sum
        # (cannot constant-fold, output fully consumed — CLAUDE.md rules).
        s = jnp.sum(buf) * 1e-30
        c1 = jnp.minimum(
            cell + (jnp.float32(0) < s).astype(jnp.int32), n_cells - 1
        )
        return (c1, acc + s)

    return jax.lax.fori_loop(0, reps, body, (cell, jnp.float32(0.0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    try:
        import os

        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # pragma: no cover
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)

    if args.quick:
        n, gw, gh = 65536, 64, 48
    else:
        n, gw, gh = 1_000_000 // _BLK * _BLK, 293, 215  # 14x downsample of 4096x3000
    n_cells = gw * gh
    key = jax.random.PRNGKey(0)
    cell = jax.random.randint(key, (n,), 0, n_cells, jnp.int32)
    rng = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32, 2.0, 12.0)
    cell, rng = jax.block_until_ready((cell, rng))
    interpret = jax.default_backend() not in ("tpu", "axon")

    # Physical floor tripwire (CLAUDE.md): the scatter reads/writes >= N
    # indices; anything below ~1 ns/index is the axon bogus-timing bug.
    floor_ms = n * 1e-9 * 1e3 * 0.5
    out = {"backend": jax.default_backend(), "n_points": n, "n_cells": n_cells}
    for impl in ("xla", "xla_with_gather", "pallas"):
        def fn(attempt):
            # FRESH inputs each call — identical-buffer re-runs are the
            # usual bogus-fast trigger on axon.
            c2 = jnp.minimum(cell + attempt, n_cells - 1)
            return timed_zmin(c2, rng, args.reps, n_cells, impl, interpret)

        jax.block_until_ready(fn(0))
        times = []
        attempt = 1
        while len(times) < 3 and attempt < 9:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(attempt))
            dt = (time.perf_counter() - t0) / args.reps * 1e3
            attempt += 1
            if dt < floor_ms:
                print(f"# bogus wall for {impl}: {dt:.3f} ms — retry",
                      file=sys.stderr)
                continue
            times.append(dt)
        med = sorted(times)[len(times) // 2] if times else float("nan")
        print(f"# zmin {impl}: {'/'.join(f'{t:.2f}' for t in times)} "
              f"-> {med:.2f} ms/rep", file=sys.stderr)
        out[f"{impl}_ms"] = round(med, 3)

    # Correctness cross-check (single shot, both backends).
    buf_p = pallas_zmin(cell, rng, n_cells, interpret)[: -(-n_cells // 128)]
    buf_x = jnp.full((n_cells + 1,), 3.0e38, jnp.float32).at[cell].min(
        rng, mode="drop"
    )
    flat_p = buf_p.reshape(-1)[:n_cells]
    np.testing.assert_array_equal(
        np.asarray(flat_p), np.asarray(buf_x[:n_cells])
    )
    out["exact"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
