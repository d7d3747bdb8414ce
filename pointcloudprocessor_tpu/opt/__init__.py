from . import bfgs, dfo, nid, pnp, pose_graph, refine

__all__ = ["bfgs", "dfo", "nid", "pnp", "pose_graph", "refine"]
