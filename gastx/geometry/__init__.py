from gastx.geometry.quaternion import qrot, qinverse
from gastx.geometry.camera import (
    normalize_screen_coordinates,
    image_coordinates,
    world_to_camera,
    camera_to_world,
    project_to_2d,
)

__all__ = [
    "qrot",
    "qinverse",
    "normalize_screen_coordinates",
    "image_coordinates",
    "world_to_camera",
    "camera_to_world",
    "project_to_2d",
]
