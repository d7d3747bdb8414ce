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
    nid_from_histograms,
    nid_histograms,
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

    def local(points, intensity, valid, bin_image, tap_rows):
        # points: (K_local, N_local, 3) etc.; bin_image: (K_local, H, W)
        def per_kf(p, i, v, b, t):
            hj, hi, hp, num = nid_histograms(
                camera, T_camera_lidar, NIDKeyframe(p, i, v, b, t), bins
            )
            # Reduce histogram mass over the point shards.
            hj = jax.lax.psum(hj, mesh_lib.PT_AXIS)
            hi = jax.lax.psum(hi, mesh_lib.PT_AXIS)
            hp = jax.lax.psum(hp, mesh_lib.PT_AXIS)
            num = jax.lax.psum(num, mesh_lib.PT_AXIS)
            return nid_from_histograms(hj, hi, hp, num)

        local_sum = jnp.sum(
            jax.vmap(per_kf)(points, intensity, valid, bin_image, tap_rows)
        )
        return jax.lax.psum(local_sum, mesh_lib.KF_AXIS)

    # check_vma=False: the Pallas histogram kernel's out_shape carries no
    # varying-mesh-axes annotation, which trips shard_map's vma checker on
    # TPU; replication of the psum'd scalar output is guaranteed manually.
    return jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS),  # points
            P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS),  # intensity
            P(mesh_lib.KF_AXIS, mesh_lib.PT_AXIS),  # valid
            P(mesh_lib.KF_AXIS),  # bin_image (replicated over pt)
            P(mesh_lib.KF_AXIS),  # tap_rows (replicated over pt)
        ),
        out_specs=P(),
    )(kfs.points, kfs.intensity, kfs.valid, kfs.bin_image, kfs.tap_rows)


def make_sharded_loss(mesh: Mesh):
    """Adapter with the `multi_nid_loss` signature for opt.refine.refine_pose."""

    def loss_fn(camera, T, kfs, bins):
        return sharded_multi_nid_loss(camera, T, kfs, mesh, bins)

    return loss_fn


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
    static_argnames=("mesh", "bins", "max_outer_iterations", "max_inner_iterations"),
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
):
    """Multi-device version of opt.refine.refine_pose (same semantics)."""
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
    )
