from . import fusion, hpr, voxel, zbuffer

__all__ = ["fusion", "hpr", "voxel", "zbuffer"]
