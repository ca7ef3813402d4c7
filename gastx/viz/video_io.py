"""Host-side video IO via ffmpeg/ffprobe subprocess pipes.

Functional parity with the reference's decode helpers
(tools/visualization.py:38-81): probe resolution/fps, stream raw RGB frames,
and mean-pool temporal downsampling.
"""
from __future__ import annotations

import subprocess as sp
from typing import Iterator, Optional, Tuple

import numpy as np


def get_resolution(filename: str) -> Tuple[int, int]:
    cmd = ["ffprobe", "-v", "error", "-select_streams", "v:0",
           "-show_entries", "stream=width,height", "-of", "csv=p=0",
           filename]
    out = sp.check_output(cmd).decode().strip().splitlines()[0]
    w, h = out.split(",")[:2]
    return int(w), int(h)


def get_fps(filename: str) -> float:
    cmd = ["ffprobe", "-v", "error", "-select_streams", "v:0",
           "-show_entries", "stream=r_frame_rate", "-of", "csv=p=0",
           filename]
    out = sp.check_output(cmd).decode().strip().splitlines()[0]
    num, den = out.split("/")
    return int(num) / int(den)


def read_video(filename: str, skip: int = 0,
               limit: int = -1) -> Iterator[np.ndarray]:
    """Yield (H, W, 3) uint8 RGB frames."""
    w, h = get_resolution(filename)
    cmd = ["ffmpeg", "-i", filename, "-f", "image2pipe", "-pix_fmt",
           "rgb24", "-vsync", "0", "-vcodec", "rawvideo", "-"]
    i = 0
    with sp.Popen(cmd, stdout=sp.PIPE, stderr=sp.DEVNULL,
                  bufsize=-1) as pipe:
        while True:
            data = pipe.stdout.read(w * h * 3)
            if not data or len(data) < w * h * 3:
                break
            i += 1
            if limit != -1 and i > limit:
                continue
            if i > skip:
                yield np.frombuffer(data, dtype=np.uint8).reshape((h, w, 3))


def downsample_tensor(x: np.ndarray, factor: int) -> np.ndarray:
    """Mean-pool along the leading (time) axis."""
    length = x.shape[0] // factor * factor
    return np.mean(x[:length].reshape(-1, factor, *x.shape[1:]), axis=1)
