"""Occlusion culling as a scatter-min z-buffer — static shapes, mask output.

Replaces the reference's hidden-point removal. The reference's ACTIVE path is
Katz spherical-flip + qhull convex hull
(`PointCloudProcessor/src/vlcal/calib/view_culling.cpp:266-334`, called from
`cull` at :46); qhull's data-dependent output is not expressible as a
static-shape TPU kernel. The reference ALSO carries a z-buffer depth-culling
path (`view_culling.cpp:52-174`, 14× image downsample at :63, 0.05 m depth
epsilon at :157) which it keeps as an alternative; that design IS a pure
scatter-min and is the one rebuilt here. Both accept/reject the same
dominant-surface points on the benchmark scenes; the z-buffer additionally
has a tunable resolution/epsilon, and unlike qhull it returns a mask of the
ORIGINAL indices, which removes the reference's kd-tree re-association step
(`PointCloudProcessor.cpp:557-571`) entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import camera as cam


def cull_mask(
    camera: cam.PinholeCamera,
    points_camera: jnp.ndarray,
    valid: jnp.ndarray,
    downsample_factor: int = 14,
    depth_epsilon: float = 0.05,
    enable_depth_buffer: bool = True,
) -> jnp.ndarray:
    """Visibility mask for camera-frame points.

    Stages (matching `view_culling.cpp:52-174` semantics):
      1. in-front gate  z > 0           (:76-80)
      2. in-image gate (projected px)   (:90-94)
      3. scatter-min range per downsampled cell; keep points whose range is
         within ``depth_epsilon`` of the cell minimum (:100-171).

    Args:
        camera: projection model (full-resolution intrinsics).
        points_camera: (N, 3) points already in the camera frame.
        valid: (N,) bool input validity.
        downsample_factor: z-buffer cell size in pixels.
        depth_epsilon: metres of slack behind the nearest return per cell.

    Returns:
        (N,) bool visibility mask (subset of ``valid``).
    """
    ds = int(downsample_factor)
    grid_w = camera.width // ds
    grid_h = camera.height // ds

    z = points_camera[..., 2]
    in_front = z > 0.0

    pixels = cam.project(camera, points_camera)
    in_img = cam.in_image(camera, pixels)
    ok = valid & in_front & in_img

    if not enable_depth_buffer:
        return ok

    u = jnp.clip((pixels[..., 0] / ds).astype(jnp.int32), 0, grid_w - 1)
    v = jnp.clip((pixels[..., 1] / ds).astype(jnp.int32), 0, grid_h - 1)
    cell = v * grid_w + u
    rng = jnp.linalg.norm(points_camera, axis=-1)

    big = jnp.asarray(jnp.finfo(rng.dtype).max, rng.dtype)
    rng_masked = jnp.where(ok, rng, big)
    # Invalid points scatter to a sink cell so they never shadow real ones.
    cell_masked = jnp.where(ok, cell, grid_w * grid_h)

    zmin = jnp.full((grid_w * grid_h + 1,), big, rng.dtype)
    zmin = zmin.at[cell_masked].min(rng_masked, mode="drop")

    cell_min = zmin[cell_masked]
    return ok & (rng <= cell_min + depth_epsilon)


def cull_world_points(
    camera: cam.PinholeCamera,
    T_camera_world,
    points_world: jnp.ndarray,
    valid: jnp.ndarray,
    downsample_factor: int = 14,
    depth_epsilon: float = 0.05,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform world points into the camera frame and cull.

    Returns (points_camera, visibility_mask). Mirrors the
    transform-then-cull sequence at `PointCloudProcessor.cpp:186-207`.
    """
    from ..core import se3

    pts_cam = se3.transform_points(T_camera_world, points_world)
    mask = cull_mask(camera, pts_cam, valid, downsample_factor, depth_epsilon)
    return pts_cam, mask
