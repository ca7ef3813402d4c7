from gastx.viz.animation import (
    color_edge,
    render_animation,
    render_animation_multiperson,
)
from gastx.viz.draw2d import draw_bboxes, draw_keypoints, resize_img
from gastx.viz.video_io import (
    downsample_tensor,
    get_fps,
    get_resolution,
    read_video,
)

__all__ = [
    "draw_bboxes",
    "draw_keypoints",
    "resize_img",
    "color_edge",
    "render_animation",
    "render_animation_multiperson",
    "downsample_tensor",
    "get_fps",
    "get_resolution",
    "read_video",
]
