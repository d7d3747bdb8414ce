from . import mesh, nid_shard, pose_graph_shard

__all__ = ["mesh", "nid_shard", "pose_graph_shard"]
