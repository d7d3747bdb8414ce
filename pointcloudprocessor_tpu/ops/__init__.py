from . import zbuffer, fusion, voxel

__all__ = ["zbuffer", "fusion", "voxel"]
