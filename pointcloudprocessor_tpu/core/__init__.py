from . import se3
from .cloud import PointCloud

__all__ = ["se3", "PointCloud"]
