"""Functional YOLOv3 in JAX (NHWC, channels-last for TPU).

Parity targets: reference ``lib/detector/yolov3/darknet.py`` — module builder
(:138-263), forward with route/shortcut caching and 3-scale detection concat
(:280-346), and the sequential binary ``.weights`` loader (:348-433) — plus
the box decode ``predict_transform`` (lib/detector/yolov3/util.py:34-81).

TPU-first notes: BN is folded into a scale/shift at load time (inference
only), activations stay NHWC so convs hit the MXU directly, and the decode is
pure jnp (sigmoid/exp/grid offsets) fused by XLA into the head convs.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv_layer_indices(blocks: List[Dict]) -> List[int]:
    """Indices (into blocks[1:]) of convolutional layers, in weight order."""
    return [i for i, b in enumerate(blocks[1:])
            if b["type"] == "convolutional"]


def load_darknet_weights(path: str, blocks: List[Dict]) -> List[Dict]:
    """Read the darknet binary: 5 int32 header, then per conv layer either
    (bn_bias, bn_scale, bn_mean, bn_var, conv_w) or (conv_bias, conv_w),
    conv_w stored as (out, in, k, k) fp32.

    Returns per-layer param dicts aligned with blocks[1:] (non-conv layers
    get empty dicts). BN is folded: y = conv(x) * scale + shift.
    """
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)
        assert header.shape[0] == 5, "truncated darknet weights header"
        weights = np.fromfile(f, dtype=np.float32)

    params: List[Dict] = [{} for _ in blocks[1:]]
    ptr = 0
    in_channels = int(blocks[0].get("channels", 3))
    channels_per_layer = _infer_channels(blocks, in_channels)

    for i, block in enumerate(blocks[1:]):
        if block["type"] != "convolutional":
            continue
        filters = int(block["filters"])
        size = int(block["size"])
        c_in = channels_per_layer[i]
        has_bn = int(block.get("batch_normalize", 0)) == 1

        if has_bn:
            bn_bias = weights[ptr:ptr + filters]; ptr += filters
            bn_scale = weights[ptr:ptr + filters]; ptr += filters
            bn_mean = weights[ptr:ptr + filters]; ptr += filters
            bn_var = weights[ptr:ptr + filters]; ptr += filters
            inv = bn_scale / np.sqrt(bn_var + 1e-5)
            scale, shift = inv, bn_bias - bn_mean * inv
        else:
            conv_bias = weights[ptr:ptr + filters]; ptr += filters
            scale = np.ones(filters, np.float32)
            shift = conv_bias

        n_w = filters * c_in * size * size
        w = weights[ptr:ptr + n_w].reshape(filters, c_in, size, size)
        ptr += n_w
        # (out, in, kh, kw) -> HWIO
        params[i] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift),
        }

    assert ptr == len(weights), (
        f"weights file mismatch: consumed {ptr} of {len(weights)} floats")
    return params


def _infer_channels(blocks: List[Dict], in_channels: int) -> List[int]:
    """Input channel count for every layer (route concat handling)."""
    out_ch: List[int] = []
    in_ch: List[int] = []
    for i, block in enumerate(blocks[1:]):
        in_ch.append(in_channels)
        t = block["type"]
        if t == "convolutional":
            in_channels = int(block["filters"])
        elif t == "route":
            layers = [int(x) for x in block["layers"].split(",")]
            layers = [l if l < 0 else l - i for l in layers]
            in_channels = sum(out_ch[i + l] for l in layers)
        elif t in ("shortcut", "upsample", "maxpool", "yolo"):
            pass
        out_ch.append(in_channels)
    return in_ch


def _decode_scale(x: jnp.ndarray, inp_dim: int, anchors: np.ndarray
                  ) -> jnp.ndarray:
    """predict_transform: (B, G, G, A*85) NHWC feature map -> (B, G*G*A, 85)
    boxes in input-pixel scale (util.py:34-81)."""
    b, g = x.shape[0], x.shape[1]
    stride = inp_dim // g
    a = anchors.shape[0]
    x = x.reshape(b, g * g, a, -1)

    grid = np.arange(g, dtype=np.float32)
    gx, gy = np.meshgrid(grid, grid)
    offsets = np.stack([gx.reshape(-1), gy.reshape(-1)],
                       axis=1)[None, :, None, :]  # (1, G*G, 1, 2)
    anchors_s = (anchors / stride)[None, None, :, :]

    xy = (jax.nn.sigmoid(x[..., :2]) + offsets) * stride
    wh = jnp.exp(x[..., 2:4]) * anchors_s * stride
    obj = jax.nn.sigmoid(x[..., 4:5])
    cls = jax.nn.sigmoid(x[..., 5:])
    return jnp.concatenate([xy, wh, obj, cls],
                           axis=-1).reshape(b, g * g * a, -1)


def make_yolo_forward(blocks: List[Dict], inp_dim: int = 416):
    """Build the jittable forward: (params, x NHWC in [0,1]) -> (B, N, 85)."""
    body = blocks[1:]
    all_anchors = None
    for blk in body:
        if blk["type"] == "yolo":
            vals = [int(v) for v in blk["anchors"].split(",")]
            all_anchors = np.array(vals, np.float32).reshape(-1, 2)
            break

    def forward(params: List[Dict], x: jnp.ndarray) -> jnp.ndarray:
        outputs: Dict[int, jnp.ndarray] = {}
        detections = []
        for i, blk in enumerate(body):
            t = blk["type"]
            if t == "convolutional":
                p = params[i]
                size = int(blk["size"])
                stride = int(blk["stride"])
                pad = (size - 1) // 2 if int(blk.get("pad", 0)) else 0
                x = jax.lax.conv_general_dilated(
                    x, p["w"], window_strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = x * p["scale"] + p["shift"]
                if blk.get("activation") == "leaky":
                    x = jax.nn.leaky_relu(x, 0.1)
            elif t == "upsample":
                b_, h_, w_, c_ = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            elif t == "maxpool":
                size = int(blk["size"])
                stride = int(blk["stride"])
                if stride == 1:
                    # darknet MaxPoolStride1: replicate-pad right/bottom by
                    # size-1 then VALID pool (darknet.py:70-78)
                    p = size - 1
                    x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)),
                                mode="edge")
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, size, size, 1),
                        (1, 1, 1, 1), "VALID")
                else:
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, size, size, 1),
                        (1, stride, stride, 1), "VALID")
            elif t == "route":
                layers = [int(v) for v in blk["layers"].split(",")]
                layers = [l if l < 0 else l - i for l in layers]
                maps = [outputs[i + l] for l in layers]
                x = maps[0] if len(maps) == 1 else jnp.concatenate(
                    maps, axis=-1)
            elif t == "shortcut":
                x = outputs[i - 1] + outputs[i + int(blk["from"])]
            elif t == "yolo":
                mask = [int(v) for v in blk["mask"].split(",")]
                detections.append(_decode_scale(
                    outputs[i - 1], inp_dim, all_anchors[mask]))
                x = outputs[i - 1]
            outputs[i] = x
        return jnp.concatenate(detections, axis=1)

    return forward
