"""Functional PoseResNet (SimpleBaseline) in JAX, NHWC, inference-mode.

Parity target: reference ``lib/pose/hrnet/lib/models/pose_resnet.py`` — the
alternative registered 2D-pose backbone (ResNet stem/stages + 3 stride-2
deconv layers + final conv to heatmaps, :103-271). Same flat torch-named
param convention as :mod:`gastx.pipeline.hrnet.model` with folded BN.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gastx.pipeline.hrnet.model import fold_conv_bn, _conv

RESNET_SPEC = {
    18: ("basic", [2, 2, 2, 2]),
    34: ("basic", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
}


def import_pose_resnet_params(sd: Dict[str, np.ndarray], num_layers: int = 50,
                              num_deconv: int = 3) -> Dict:
    block, layers = RESNET_SPEC[num_layers]
    params: Dict[str, Dict] = {"_block": block, "_layers": layers,
                               "_num_deconv": num_deconv}

    def cb(conv, bn):
        params[conv] = fold_conv_bn(sd, conv, bn)

    cb("conv1", "bn1")
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            base = f"layer{stage}.{b}"
            cb(f"{base}.conv1", f"{base}.bn1")
            cb(f"{base}.conv2", f"{base}.bn2")
            if block == "bottleneck":
                cb(f"{base}.conv3", f"{base}.bn3")
            if f"{base}.downsample.0.weight" in sd:
                cb(f"{base}.downsample.0", f"{base}.downsample.1")

    # deconv stack: ConvTranspose2d at indices 0, 3, 6; BN at 1, 4, 7
    for i in range(num_deconv):
        w = sd[f"deconv_layers.{3 * i}.weight"]  # (in, out, kh, kw)
        assert w.shape[2] == 4, "only k=4 deconvs supported (the default)"
        bn = f"deconv_layers.{3 * i + 1}"
        gamma, beta = sd[f"{bn}.weight"], sd[f"{bn}.bias"]
        mean, var = sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"]
        inv = gamma / np.sqrt(var + 1e-5)
        params[f"deconv.{i}"] = {
            # torch ConvTranspose2d(k=4, s=2, p=1) == lax.conv_transpose with
            # kernel (kh, kw, out, in), padding k-1-p=2, transpose_kernel=True
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "scale": jnp.asarray(inv.astype(np.float32)),
            "shift": jnp.asarray((beta - mean * inv).astype(np.float32)),
        }

    params["final_layer"] = {
        "w": jnp.asarray(np.transpose(sd["final_layer.weight"],
                                      (2, 3, 1, 0))),
        "b": jnp.asarray(sd["final_layer.bias"]),
    }
    return params


def _res_basic(params, base, x, stride):
    residual = x
    y = _conv(x, params[f"{base}.conv1"], stride=stride, pad=1)
    y = _conv(y, params[f"{base}.conv2"], stride=1, pad=1, relu=False)
    if f"{base}.downsample.0" in params:
        residual = _conv(x, params[f"{base}.downsample.0"], stride=stride,
                         relu=False)
    return jax.nn.relu(y + residual)


def _res_bottleneck(params, base, x, stride):
    residual = x
    y = _conv(x, params[f"{base}.conv1"])
    y = _conv(y, params[f"{base}.conv2"], stride=stride, pad=1)
    y = _conv(y, params[f"{base}.conv3"], relu=False)
    if f"{base}.downsample.0" in params:
        residual = _conv(x, params[f"{base}.downsample.0"], stride=stride,
                         relu=False)
    return jax.nn.relu(y + residual)


def pose_resnet_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/4, W/4, num_joints) heatmaps."""
    block, layers = params["_block"], params["_layers"]
    block_fn = _res_basic if block == "basic" else _res_bottleneck

    # stem: 7x7/2 conv + 3x3/2 maxpool
    x = jax.lax.conv_general_dilated(
        x, params["conv1"]["w"], window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(x * params["conv1"]["scale"] + params["conv1"]["shift"])
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])

    for stage, blocks in enumerate(layers, start=1):
        stride = 1 if stage == 1 else 2
        for b in range(blocks):
            x = block_fn(params, f"layer{stage}.{b}", x,
                         stride if b == 0 else 1)

    # deconv stack: k=4 s=2 p=1 transposed convs + folded BN + relu
    for i in range(params["_num_deconv"]):
        p = params[f"deconv.{i}"]
        x = jax.lax.conv_transpose(
            x, p["w"], strides=(2, 2), padding=[(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        x = jax.nn.relu(x * p["scale"] + p["shift"])

    y = jax.lax.conv_general_dilated(
        x, params["final_layer"]["w"], window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["final_layer"]["b"]
