"""Multi-device NID refinement: keyframes and points sharded over a mesh.

The TPU-native replacement for the reference's OpenMP parallel cost
evaluation (`visual_camera_calibration.cpp:110-114`): each device computes
the NID histograms for its (keyframe-shard × point-shard), histograms
reduce over the point axis with `psum`, per-keyframe NIDs reduce over the
keyframe axis with `psum`. The BFGS state (6-dim tangent + 6x6 inverse
Hessian) is replicated — collectives carry only (bins x bins + 2*bins + 1)
floats per keyframe per evaluation, so the solve is ICI-bandwidth-trivial
and compute-bound on the projection/gather/matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import se3
from ..models import camera as cam
from ..opt import bfgs
from ..opt.nid import (
    NIDKeyframe,
    TapCache,
    _gather_taps,
    _histograms_from_taps,
    _project_all,
    nid_from_histograms,
    prepare_keyframes,
)
from . import mesh as mesh_lib


def sharded_multi_nid_loss(
    camera: cam.PinholeCamera,
    T_camera_lidar: se3.SE3,
    kfs: NIDKeyframe,
    mesh: Mesh,
    bins: int = 16,
) -> jnp.ndarray:
    """Sum of NIDs over keyframes, computed SPMD over the (kf, pt) mesh.

    Input layout: every NIDKeyframe field has a leading keyframe axis;
    points/intensity/valid additionally shard their point axis over ``pt``;
    bin_image replicates over ``pt`` (each point shard samples the full
    image) and shards over ``kf``.
    """

    kfs = prepare_keyframes(kfs)  # no-op when the solver prepared already

    def local(points, intensity, valid, bin_image, tap_rows, tap_slabs):
        # points: (K_local, N_local, 3) etc.; bin_image: (K_local, H, W).
        # The tap gather is hoisted out of the keyframe vmap into one
        # flattened shard-local call (same restructure as
        # opt/nid.multi_nid_loss): bit-identical histograms, but the
        # grouped slab gather's overflow cond stays a real branch — it is
        # shard-local (no collectives inside), so devices may take
        # different branches safely.
        lk = NIDKeyframe(points, intensity, valid, bin_image, tap_rows,
                         tap_slabs)
        proj, knot, inl = _project_all(camera, T_camera_lidar, lk)
        s = proj - knot.astype(proj.dtype)
        taps = _gather_taps(camera, lk, knot, inl)
        inl_f = inl.astype(proj.dtype)

        def per_kf(taps1, s1, inten1, inl1):
            bin_pts = jnp.clip((inten1 * bins).astype(jnp.int32), 0, bins - 1)
            hj, hi, hp, num = _histograms_from_taps(
                taps1, s1, bin_pts, inl1, bins, None
            )
            # Reduce histogram mass over the point shards.
            hj = jax.lax.psum(hj, mesh_lib.PT_AXIS)
            hi = jax.lax.psum(hi, mesh_lib.PT_AXIS)
            hp = jax.lax.psum(hp, mesh_lib.PT_AXIS)
            num = jax.lax.psum(num, mesh_lib.PT_AXIS)
            return nid_from_histograms(hj, hi, hp, num)

        local_sum = jnp.sum(jax.vmap(per_kf)(taps, s, intensity, inl_f))
        return jax.lax.psum(local_sum, mesh_lib.KF_AXIS)

    if kfs.tap_slabs is None:
        def local5(points, intensity, valid, bin_image, tap_rows):
            return local(points, intensity, valid, bin_image, tap_rows, None)

        fn, args, extra_specs = local5, (), ()
    else:
        fn = local
        args = (kfs.tap_slabs,)
        extra_specs = (P(mesh_lib.KF_AXIS),)  # tap_slabs (replicated over pt)

    # check_vma=False: the Pallas histogram kernel's out_shape carries no
    # varying-mesh-axes annotation, which trips shard_map's vma checker on
    # TPU; replication of the psum'd scalar output is guaranteed manually.
    return jax.shard_map(
        fn,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS),  # points
            P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS),  # intensity
            P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS),  # valid
            P(mesh_lib.KF_AXIS),  # bin_image (replicated over pt)
            P(mesh_lib.KF_AXIS),  # tap_rows (replicated over pt)
        ) + extra_specs,
        out_specs=P(),
    )(kfs.points, kfs.intensity, kfs.valid, kfs.bin_image, kfs.tap_rows, *args)


def make_sharded_loss(mesh: Mesh):
    """Adapter with the `multi_nid_loss` signature for opt.refine.refine_pose."""

    def loss_fn(camera, T, kfs, bins):
        return sharded_multi_nid_loss(camera, T, kfs, mesh, bins)

    return loss_fn


def make_sharded_frozen(mesh: Mesh):
    """Sharded implementations of the frozen-tap objective
    (`opt/nid.TapCache` / `multi_nid_loss_cached` semantics, SPMD over the
    (kf, pt) mesh) for `opt.refine.refine_pose(frozen_taps=True,
    frozen_impl=...)`.

    The cache fields live sharded exactly like the point arrays (taps/knot
    (K, N, 2) over (kf, pt); inlier (K, N)); the staleness decision psums
    the drift counts over BOTH axes so every device takes the same
    `lax.cond` branch, and the re-gather happens shard-locally (tap tables
    are replicated over pt, as in the direct sharded loss).
    """
    pkp = P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS)
    pk = P(mesh_lib.KF_AXIS)
    both = (mesh_lib.KF_AXIS, mesh_lib.PT_AXIS)

    def _slab_args(kfs):
        """(extra shard_map args, extra in_specs) for the optional slab
        table — sharded over kf with the tap tables, replicated over pt."""
        if kfs.tap_slabs is None:
            return (), ()
        return (kfs.tap_slabs,), (pk,)

    def make_cache(camera, T, kfs) -> TapCache:
        def local(points, intensity, valid, tap_rows, *slabs):
            lk = NIDKeyframe(points, intensity, valid, None, tap_rows,
                             slabs[0] if slabs else None)
            proj, knot, inl = _project_all(camera, T, lk)
            taps = _gather_taps(camera, lk, knot, inl)
            return taps, knot, inl.astype(proj.dtype)

        args, specs = _slab_args(kfs)
        taps, knot, inlf = jax.shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(pkp, pkp, pkp, pk) + specs,
            out_specs=(pkp, pkp, pkp),
        )(kfs.points, kfs.intensity, kfs.valid, kfs.tap_rows, *args)
        return TapCache(taps, knot, inlf, jnp.asarray(1, jnp.int32))

    def cached_loss(
        camera, T, kfs, cache, bins, guard_frac=0.25, allow_refresh=True
    ):
        def local(points, intensity, valid, tap_rows, c_taps, c_knot, c_inl,
                  *slabs):
            lk = NIDKeyframe(points, intensity, valid, None, tap_rows,
                             slabs[0] if slabs else None)
            proj, knot_true, inl_true = _project_all(camera, T, lk)

            shift = jnp.max(
                jnp.abs(
                    knot_true.astype(jnp.float32) - c_knot.astype(jnp.float32)
                ),
                axis=-1,
            )
            care = inl_true | (c_inl > 0)
            n_care = jnp.maximum(
                jax.lax.psum(jnp.sum(care), both), 1
            ).astype(jnp.float32)
            frac1 = jax.lax.psum(jnp.sum((shift >= 1.0) & care), both) / n_care
            frac2 = jax.lax.psum(jnp.sum((shift >= 2.0) & care), both) / n_care
            stale = ((frac1 > guard_frac) | (frac2 > 0.001)) & allow_refresh

            def fresh(_):
                return (
                    _gather_taps(camera, lk, knot_true, inl_true),
                    knot_true,
                    inl_true.astype(proj.dtype),
                )

            taps, knot, inlf = jax.lax.cond(
                stale, fresh, lambda _: (c_taps, c_knot, c_inl), None
            )
            s = jnp.clip(
                proj - jax.lax.stop_gradient(knot).astype(proj.dtype), -1.5, 2.5
            )

            def per_kf(taps1, s1, inten1, inl1):
                bin_pts = jnp.clip(
                    (inten1 * bins).astype(jnp.int32), 0, bins - 1
                )
                hj, hi, hp, num = _histograms_from_taps(
                    taps1, s1, bin_pts, inl1, bins, None
                )
                hj = jax.lax.psum(hj, mesh_lib.PT_AXIS)
                hi = jax.lax.psum(hi, mesh_lib.PT_AXIS)
                hp = jax.lax.psum(hp, mesh_lib.PT_AXIS)
                num = jax.lax.psum(num, mesh_lib.PT_AXIS)
                return nid_from_histograms(hj, hi, hp, num)

            losses = jax.vmap(per_kf)(taps, s, intensity, inlf)
            loss = jax.lax.psum(jnp.sum(losses), mesh_lib.KF_AXIS)
            return loss, taps, knot, inlf, stale.astype(jnp.int32)

        args, specs = _slab_args(kfs)
        loss, taps, knot, inlf, inc = jax.shard_map(
            local,
            mesh=mesh,
            check_vma=False,
            in_specs=(pkp, pkp, pkp, pk, pkp, pkp, pkp) + specs,
            out_specs=(P(), pkp, pkp, pkp, P()),
        )(
            kfs.points,
            kfs.intensity,
            kfs.valid,
            kfs.tap_rows,
            cache.taps,
            cache.knot,
            cache.inlier,
            *args,
        )
        return loss, TapCache(taps, knot, inlf, cache.refreshes + inc)

    return make_cache, cached_loss


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "bins", "max_outer_iterations", "max_inner_iterations"),
)
def refine_per_keyframe_sharded(
    camera: cam.PinholeCamera,
    kfs: NIDKeyframe,
    T_init: se3.SE3,
    mesh: Mesh,
    *,
    bins: int = 16,
    max_outer_iterations: int = 10,
    max_inner_iterations: int = 64,
):
    """Per-keyframe NID refinement with keyframes sharded over the ``kf``
    mesh axis. The solves are independent (no collectives): each device runs
    the vmapped BFGS for its local keyframe shard — the embarrassingly
    parallel limit of the reference's OpenMP-over-keyframes pattern. Returns
    a RefineResult batched over keyframes (kf-sharded outputs)."""
    from ..opt.refine import refine_pose_per_keyframe

    kfs = prepare_keyframes(kfs)
    k = kfs.points.shape[0]
    q0 = jnp.broadcast_to(T_init.q, (k, 4))
    t0 = jnp.broadcast_to(T_init.t, (k, 3))

    def local(points, intensity, valid, bin_image, tap_rows, q, t):
        return refine_pose_per_keyframe(
            camera,
            NIDKeyframe(points, intensity, valid, bin_image, tap_rows),
            se3.SE3(q, t),
            bins=bins,
            max_outer_iterations=max_outer_iterations,
            max_inner_iterations=max_inner_iterations,
        )

    kf_spec = P(mesh_lib.KF_AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(kf_spec,) * 7,
        out_specs=kf_spec,
        check_vma=False,
    )(kfs.points, kfs.intensity, kfs.valid, kfs.bin_image, kfs.tap_rows, q0, t0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "bins",
        "max_outer_iterations",
        "max_inner_iterations",
        "frozen_taps",
        "coarse_outer_iterations",
        "coarse_stride",
    ),
)
def refine_pose_sharded(
    camera: cam.PinholeCamera,
    kfs: NIDKeyframe,
    T_init: se3.SE3,
    mesh: Mesh,
    *,
    bins: int = 16,
    max_outer_iterations: int = 10,
    max_inner_iterations: int = 64,
    frozen_taps: bool = False,
    frozen_guard_frac: float = 0.25,
    coarse_outer_iterations: int = 0,
    coarse_stride: int = 4,
):
    """Multi-device version of opt.refine.refine_pose (same semantics,
    including the optional frozen-tap gather reuse — the cache shards with
    the points, see :func:`make_sharded_frozen` — and the coarse-to-fine
    schedule: the coarse phase's strided point subsample slices the SHARDED
    point axis, so each device's shard subsamples locally and the histogram
    psum tree is unchanged; exposing it here gives the bench's headline
    frozen+c2f config a multi-device twin, VERDICT r3 #3)."""
    from ..opt.refine import refine_pose

    # Tap tables built once, outside the solver loops (sharded over kf with
    # their bin images).
    kfs = prepare_keyframes(kfs)
    # refine_pose is itself jitted; calling it inside jit simply inlines.
    return refine_pose(
        camera,
        kfs,
        T_init,
        bins=bins,
        max_outer_iterations=max_outer_iterations,
        max_inner_iterations=max_inner_iterations,
        loss_fn=make_sharded_loss(mesh),
        frozen_taps=frozen_taps,
        frozen_guard_frac=frozen_guard_frac,
        frozen_impl=make_sharded_frozen(mesh) if frozen_taps else None,
        coarse_outer_iterations=coarse_outer_iterations,
        coarse_stride=coarse_stride,
    )
