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
    `make_vo_odom_for_fastlio.py:86-109` / `pose_interp.py:25-138`, as one
    vectorised call."""
    q, p = se3.interpolate_trajectory(
        jnp.asarray(traj.times, jnp.float64 if traj.times.dtype == np.float64 else jnp.float32),
        jnp.asarray(traj.quats_wxyz, jnp.float32),
        jnp.asarray(traj.positions, jnp.float32),
        jnp.asarray(query_times),
    )
    return Trajectory(times=np.asarray(query_times), positions=np.asarray(p), quats_wxyz=np.asarray(q))


def poses(traj: Trajectory) -> se3.SE3:
    """Batched SE3 (camera/body -> world) from the track."""
    return se3.SE3(
        q=se3.quat_normalize(jnp.asarray(traj.quats_wxyz, jnp.float32)),
        t=jnp.asarray(traj.positions, jnp.float32),
    )
