from . import bfgs, dfo, nid, pnp, refine

__all__ = ["bfgs", "dfo", "nid", "pnp", "refine"]
