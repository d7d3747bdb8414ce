from . import mesh, nid_shard

__all__ = ["mesh", "nid_shard"]
