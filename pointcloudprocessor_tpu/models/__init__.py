from .camera import PinholeCamera, create_camera

__all__ = ["PinholeCamera", "create_camera"]
