from .config import (
    CameraConfig,
    CullingConfig,
    FusionConfig,
    KeyframeConfig,
    MLSConfig,
    NIDConfig,
    PipelineConfig,
)

__all__ = [
    "CameraConfig",
    "CullingConfig",
    "FusionConfig",
    "KeyframeConfig",
    "MLSConfig",
    "NIDConfig",
    "PipelineConfig",
]
