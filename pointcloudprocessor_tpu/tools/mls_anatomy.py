"""MLS cost anatomy: per-stage device-time breakdown of the full MLS pass.

VERDICT r3 #5: MLS is the pipeline's dominant stage with --enableMLS
(0.355 Mpts/s => 2.8 s at 1M points) and, unlike NID, never had a measured
breakdown. This tool times nested prefixes of the pass on the hardened
bench scene (`bench._mls_scene`):

  grid    : hash-grid build (sort + scatter, ops/knn.build store_points)
  neigh   : + chunked 27-cell candidate fetch & radius filter
            (knn.radius_neighbors_with_points, the row-gather path)
  fit     : + weighted covariance + inverse-iteration normals + batched
            6x6 polynomial solves (ops/mls.fit_surfaces)
  full    : + projection (= ops/mls._mls_smooth_jit, what mls_smooth runs)

Successive differences attribute the cost per stage. Timing protocol =
CLAUDE.md: chained repetitions inside one jit (a data-dependent point
perturbation serializes iterations), median of 3 calls, floor tripwire.

Usage: python -m pointcloudprocessor_tpu.tools.mls_anatomy [--quick]
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
    ap.add_argument("--reps", type=int, default=3)
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

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from bench import _mls_scene

    from ..ops import knn, mls
    from ..utils.config import MLSConfig

    n = 100_000 if args.quick else 1_000_000
    cfg = MLSConfig()
    pts0 = jax.block_until_ready(jnp.asarray(_mls_scene(n)))
    valid = jnp.ones((n,), bool)
    reps = args.reps

    radius = float(cfg.search_radius)
    kw = dict(
        search_radius=radius,
        max_neighbors=int(cfg.max_neighbors),
        sqr_gauss_param=float(cfg.sqr_gauss_param),
        polynomial_order=int(cfg.polynomial_order),
        bucket_capacity=int(cfg.bucket_capacity),
        table_size=max(n // 2, 1024),
        chunk_size=16384,
    )

    def stage_fn(points, stage):
        grid = knn.build(
            points, valid, cell_size=radius,
            table_size=kw["table_size"], bucket_capacity=kw["bucket_capacity"],
            store_points=True,
        )
        if stage == "grid":
            return grid.counts.sum().astype(jnp.float32)
        pad = (-n) % kw["chunk_size"]
        qc = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, kw["chunk_size"], 3)

        def one(q):
            if stage.startswith("m_"):
                # MOMENTS-path anatomy (VERDICT r4 #1 missing): the shipping
                # fit_impl="moments" pass had no measured breakdown — only
                # the retired top-k path's. Prefix stages: coordinate-plane
                # candidate fetch -> moments fit -> + projection (= the
                # production `_mls_smooth_jit` moments branch).
                cx, cy, cz = knn.candidate_points(grid, q)
                if stage == "m_cand":
                    return jnp.sum(jnp.where(jnp.isfinite(cz), cx + cy + cz, 0.0))
                surf = mls.fit_surfaces_moments(
                    q, cx, cy, cz, radius, kw["sqr_gauss_param"],
                    kw["polynomial_order"],
                )
                if stage == "m_fit":
                    return (
                        jnp.sum(surf.origin) + jnp.sum(surf.coeffs)
                        + jnp.sum(surf.normal)
                    )
                pos, nrm = mls.project_onto(surf, q)
                return jnp.sum(pos) + jnp.sum(nrm)
            if stage == "cand":
                # Candidate fetch only: the two 27-cell row gathers + d2
                # mask (no top-k/selection) — splits the dominant "neigh"
                # stage into gather vs selection.
                cand, cx, cy, cz = knn._candidates_with_points(
                    grid, points, q
                )
                dx = cx - q[:, 0:1]
                dy = cy - q[:, 1:2]
                dz = cz - q[:, 2:3]
                d2 = dx * dx + dy * dy + dz * dz
                inr = (cand >= 0) & (d2 <= radius * radius)
                return jnp.sum(jnp.where(inr, d2, 0.0)) + jnp.sum(
                    cand.astype(jnp.float32)
                )
            if stage == "cand_pts":
                # Coordinate-row gather only (no bucket-index gather):
                # what a selection-free moments formulation would pay.
                cells = knn.voxel_coords(q, grid.cell_size)
                neigh_c = cells[:, None, :] + knn._OFFSETS[None, :, :]
                hashes = knn.voxel_hash(neigh_c, grid.table_size)
                rows = grid.bucket_points[hashes]
                return jnp.sum(jnp.where(jnp.isfinite(rows), rows, 0.0))
            idx, npts, _, ok = knn.radius_neighbors_with_points(
                grid, points, q, radius, kw["max_neighbors"], select="approx"
            )
            if stage == "neigh":
                return (
                    jnp.sum(ok.astype(jnp.float32))
                    + jnp.sum(jnp.where(ok[..., None], npts, 0.0))
                )
            surf = mls.fit_surfaces(
                points, q, idx, ok, kw["sqr_gauss_param"],
                kw["polynomial_order"], neigh_pts=npts,
            )
            if stage == "fit":
                return (
                    jnp.sum(surf.origin) + jnp.sum(surf.coeffs)
                    + jnp.sum(surf.normal)
                )
            pos, nrm = mls.project_onto(surf, q)
            return jnp.sum(pos) + jnp.sum(nrm)

        return jnp.sum(jax.lax.map(one, qc))

    @functools.partial(jax.jit, static_argnames=("stage", "reps"))
    def chain(points, stage, reps):
        def body(i, carry):
            p, acc = carry
            out = stage_fn(p, stage)
            # Serialize: next iteration's points depend on this output.
            eps = 1e-12 * jnp.tanh(out)
            return (p + eps, acc + out)

        _, acc = jax.lax.fori_loop(0, reps, body, (points, jnp.float32(0.0)))
        return acc

    # Floors: the full pass measured ~2.8 s at 1M (round 3); even the grid
    # build alone is a 1M-point sort, physically >= ~5 ms.
    scale = n / 1e6
    floors = {"grid": 0.004 * scale, "cand": 0.01 * scale,
              "cand_pts": 0.008 * scale, "neigh": 0.02 * scale,
              "fit": 0.03 * scale, "full": 0.04 * scale,
              "m_cand": 0.008 * scale, "m_fit": 0.02 * scale,
              "m_full": 0.025 * scale}

    results = {}
    for stage in ("grid", "cand_pts", "cand", "neigh", "fit", "full",
                  "m_cand", "m_fit", "m_full"):
        chain(pts0, stage, reps).block_until_ready()  # compile
        print(f"# {stage} compiled", file=sys.stderr)
        walls = []
        tries = 0
        while len(walls) < 3 and tries < 6:
            p_in = pts0 + 1e-7 * (tries + 1)
            t0 = time.perf_counter()
            chain(p_in, stage, reps).block_until_ready()
            dt = time.perf_counter() - t0
            tries += 1
            if dt < floors[stage] * reps:
                print(f"# bogus wall for {stage}: {dt*1e3:.1f} ms — retry",
                      file=sys.stderr)
                continue
            walls.append(dt / reps)
        results[stage] = sorted(walls)[len(walls) // 2] if walls else float("nan")
        print(json.dumps({"stage": stage, "s": round(results[stage], 4),
                          "calls": [round(w, 4) for w in walls]}))

    g, cp, ca, ne, fi, fu = (
        results[s] for s in ("grid", "cand_pts", "cand", "neigh", "fit", "full")
    )
    mc, mf, mu = (results[s] for s in ("m_cand", "m_fit", "m_full"))
    print(json.dumps({
        "metric": "mls_anatomy_s",
        "n_points": n,
        "grid_build": round(g, 4),
        "coord_row_gather": round(cp - g, 4),
        "index_row_gather_and_mask": round(ca - cp, 4),
        "selection_topk": round(ne - ca, 4),
        "fits": round(fi - ne, 4),
        "projection": round(fu - fi, 4),
        "full": round(fu, 4),
        "mpts_per_s": round(n / fu / 1e6, 3),
        # Shipping moments path (fit_impl="moments") attribution:
        "moments_coord_gather": round(mc - g, 4),
        "moments_fit": round(mf - mc, 4),
        "moments_projection": round(mu - mf, 4),
        "moments_full": round(mu, 4),
        "moments_mpts_per_s": round(n / mu / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
