"""Synthetic scene builders shared by culling / colorization / NID tests."""

import numpy as np
import jax.numpy as jnp

from pointcloudprocessor_tpu.models import camera as cam


def simple_camera(w=128, h=96, f=120.0, distortion=None):
    d = np.zeros(5, np.float32) if distortion is None else np.asarray(distortion, np.float32)
    return cam.PinholeCamera(
        intrinsic=jnp.asarray([f, f, w / 2.0, h / 2.0], jnp.float32),
        distortion=jnp.asarray(d),
        width=w,
        height=h,
    )


def wall_scene(camera, wall_z=5.0, occluder_z=2.5, n_side=40, rng=None):
    """A wall of points filling the FoV at wall_z, plus a small occluder patch
    in front of the central region. Returns (points (N,3) camera frame,
    is_occluder (N,), expected_hidden (N,)).

    The occluder covers pixels in the central quarter of the image; wall
    points projecting there are hidden.
    """
    rng = rng or np.random.default_rng(0)
    fx = float(camera.intrinsic[0])
    cx, cy = float(camera.intrinsic[2]), float(camera.intrinsic[3])
    w, h = camera.width, camera.height

    # Wall points: regular pixel grid un-projected to wall_z.
    us = np.linspace(4, w - 4, n_side)
    vs = np.linspace(4, h - 4, n_side)
    uu, vv = np.meshgrid(us, vs)
    x = (uu - cx) / fx * wall_z
    y = (vv - cy) / fx * wall_z
    wall = np.stack([x, y, np.full_like(x, wall_z)], axis=-1).reshape(-1, 3)

    # Occluder: covers central pixel box [cx±w/8, cy±h/8] at occluder_z.
    us2 = np.linspace(cx - w / 8, cx + w / 8, n_side // 2)
    vs2 = np.linspace(cy - h / 8, cy + h / 8, n_side // 2)
    uu2, vv2 = np.meshgrid(us2, vs2)
    x2 = (uu2 - cx) / fx * occluder_z
    y2 = (vv2 - cy) / fx * occluder_z
    occ = np.stack([x2, y2, np.full_like(x2, occluder_z)], axis=-1).reshape(-1, 3)

    points = np.concatenate([wall, occ]).astype(np.float32)
    is_occ = np.zeros(len(points), bool)
    is_occ[len(wall):] = True

    hidden = np.zeros(len(points), bool)
    wall_px = np.stack([uu.ravel(), vv.ravel()], axis=-1)
    inside = (
        (wall_px[:, 0] > cx - w / 8)
        & (wall_px[:, 0] < cx + w / 8)
        & (wall_px[:, 1] > cy - h / 8)
        & (wall_px[:, 1] < cy + h / 8)
    )
    hidden[: len(wall)] = inside
    return points, is_occ, hidden


def gradient_image(w=128, h=96):
    """RGB uint8 image with distinct per-pixel values: R=u, G=v, B=128."""
    u = np.arange(w, dtype=np.uint16)[None, :].repeat(h, 0)
    v = np.arange(h, dtype=np.uint16)[:, None].repeat(w, 1)
    img = np.stack([(u * 255) // max(w - 1, 1), (v * 255) // max(h - 1, 1), np.full_like(u, 128)], axis=-1)
    return img.astype(np.uint8)
