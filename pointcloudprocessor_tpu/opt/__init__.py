from . import nid, bfgs, refine

__all__ = ["nid", "bfgs", "refine"]
