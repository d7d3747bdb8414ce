"""Odometry / trajectory file IO and resampling.

Covers:
* the pipeline's odometry input ``vo_interpolated_odom.txt`` — lines of
  ``ts x y z qw qx qy qz`` (parsed by the reference at
  `PointCloudProcessor/src/PointCloudProcessor.cpp:970-978`),
* the VO resampling tool that PRODUCES that file
  (`PointCloudProcessor/scripts/make_vo_odom_for_fastlio.py:50-188`:
  read wxyz track, interpolate onto target timestamps, write wxyz),
* generic TUM-ish tracks used by `scripts/pose_interp.py`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import se3


class Trajectory(NamedTuple):
    """A timestamped pose track (host/numpy or device/jnp arrays)."""

    times: np.ndarray  # (M,)
    positions: np.ndarray  # (M, 3)
    quats_wxyz: np.ndarray  # (M, 4)

    def __len__(self):
        return len(self.times)


def read(path: str) -> Trajectory:
    """Read ``ts x y z qw qx qy qz`` lines (the reference's odometry format)."""
    table = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if table.shape[1] < 8:
        raise ValueError(f"{path}: expected 8 columns 'ts x y z qw qx qy qz'")
    return Trajectory(
        times=table[:, 0],
        positions=table[:, 1:4].astype(np.float32),
        quats_wxyz=table[:, 4:8].astype(np.float32),
    )


def write(path: str, traj: Trajectory) -> None:
    """Write in the reference's odometry format (`make_vo_odom_for_fastlio.py:111-126`:
    ``ts`` with 6 decimals, pose with 8)."""
    with open(path, "w") as f:
        for t, p, q in zip(traj.times, traj.positions, traj.quats_wxyz):
            f.write(
                f"{t:.6f} {p[0]:.8f} {p[1]:.8f} {p[2]:.8f} "
                f"{q[0]:.8f} {q[1]:.8f} {q[2]:.8f} {q[3]:.8f}\n"
            )


def resample(traj: Trajectory, query_times: np.ndarray) -> Trajectory:
    """Interpolate the track at query timestamps (slerp + lerp) — the job of
    `make_vo_odom_for_fastlio.py:86-109` / `pose_interp.py:25-138`.

    Bracket indices + fractions are computed in HOST float64: epoch
    timestamps (~1e9 s) lose sub-second precision in on-device float32 (the
    reference converts to integer microseconds for the same reason,
    `make_vo_odom_for_fastlio.py:98`). Only the slerp itself runs as f32
    array math. Queries outside the track span clamp to the ends.
    """
    times = np.asarray(traj.times, np.float64)
    t = np.clip(np.asarray(query_times, np.float64), times[0], times[-1])
    upper = np.clip(np.searchsorted(times, t, side="right"), 1, len(times) - 1)
    lower = upper - 1
    dt = times[upper] - times[lower]
    frac = np.where(dt > 0, (t - times[lower]) / np.maximum(dt, 1e-12), 0.0)

    q = se3.quat_normalize(se3.quat_slerp(
        jnp.asarray(traj.quats_wxyz[lower], jnp.float32),
        jnp.asarray(traj.quats_wxyz[upper], jnp.float32),
        jnp.asarray(frac, jnp.float32),
    ))
    p = (1.0 - frac)[:, None] * np.asarray(traj.positions[lower], np.float64) + frac[
        :, None
    ] * np.asarray(traj.positions[upper], np.float64)
    return Trajectory(
        times=np.asarray(query_times),
        positions=p.astype(np.float32),
        quats_wxyz=np.asarray(q),
    )


def poses(traj: Trajectory) -> se3.SE3:
    """Batched SE3 (camera/body -> world) from the track."""
    return se3.SE3(
        q=se3.quat_normalize(jnp.asarray(traj.quats_wxyz, jnp.float32)),
        t=jnp.asarray(traj.positions, jnp.float32),
    )
