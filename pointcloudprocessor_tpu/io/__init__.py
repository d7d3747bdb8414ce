from . import frame_bin, images, odometry, pcd

__all__ = ["frame_bin", "images", "odometry", "pcd"]
