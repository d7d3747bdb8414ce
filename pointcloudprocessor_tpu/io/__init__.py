from . import pcd, odometry, images

__all__ = ["pcd", "odometry", "images"]
