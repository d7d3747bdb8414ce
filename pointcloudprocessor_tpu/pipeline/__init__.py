from . import ingest, keyframes, colorize

__all__ = ["ingest", "keyframes", "colorize"]
