"""Functional HRNet (PoseHighResolutionNet) in JAX, NHWC, inference-mode.

Parity target: reference ``lib/pose/hrnet/lib/models/pose_hrnet.py`` — stem
(2x stride-2 convs) -> Bottleneck layer1 -> three multi-resolution stages of
``HighResolutionModule`` branches with up/downsample fuse layers -> final 1x1
conv to per-joint heatmaps (:274-461).

TPU-first design: parameters are stored FLAT, keyed by the torch state_dict
names, with every conv+BN pair folded at import time into a single
scale/shift (this pipeline only ever runs inference — the reference never
trains HRNet either, it loads the published ``pose_hrnet_w48_384x288.pth``).
The forward walks the stage spec computing the same names the torch module
tree would produce, so importing a published checkpoint is a rename-free
pass over the file.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


# ---------------- parameter import ----------------

def fold_conv_bn(sd: Dict[str, np.ndarray], conv: str, bn: str,
                 eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """(torch conv weight, BN) -> {w HWIO, scale, shift} with BN folded."""
    w = sd[f"{conv}.weight"]  # (out, in, kh, kw)
    gamma = sd[f"{bn}.weight"]
    beta = sd[f"{bn}.bias"]
    mean = sd[f"{bn}.running_mean"]
    var = sd[f"{bn}.running_var"]
    inv = gamma / np.sqrt(var + eps)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "scale": jnp.asarray(inv.astype(np.float32)),
        "shift": jnp.asarray((beta - mean * inv).astype(np.float32)),
    }


def import_hrnet_params(sd: Dict[str, np.ndarray], extra: Dict,
                        num_joints: int = 17) -> Dict:
    """Flat torch state_dict -> folded gastx param dict."""
    params: Dict[str, Dict] = {}

    def cb(conv: str, bn: str):
        params[conv] = fold_conv_bn(sd, conv, bn)

    cb("conv1", "bn1")
    cb("conv2", "bn2")

    # layer1: 4 bottlenecks, first with downsample
    for b in range(4):
        base = f"layer1.{b}"
        cb(f"{base}.conv1", f"{base}.bn1")
        cb(f"{base}.conv2", f"{base}.bn2")
        cb(f"{base}.conv3", f"{base}.bn3")
        if f"{base}.downsample.0.weight" in sd:
            cb(f"{base}.downsample.0", f"{base}.downsample.1")

    for s, stage_key in ((2, "STAGE2"), (3, "STAGE3"), (4, "STAGE4")):
        spec = extra[stage_key]
        n_br = spec["NUM_BRANCHES"]
        # transition
        t = f"transition{s - 1}"
        for i in range(n_br):
            if f"{t}.{i}.0.weight" in sd:  # existing-branch channel adapt
                cb(f"{t}.{i}.0", f"{t}.{i}.1")
            else:
                j = 0
                while f"{t}.{i}.{j}.0.weight" in sd:  # new-branch downsamples
                    cb(f"{t}.{i}.{j}.0", f"{t}.{i}.{j}.1")
                    j += 1
        # modules
        for m in range(spec["NUM_MODULES"]):
            for br in range(n_br):
                for blk in range(spec["NUM_BLOCKS"][br]):
                    base = f"stage{s}.{m}.branches.{br}.{blk}"
                    cb(f"{base}.conv1", f"{base}.bn1")
                    cb(f"{base}.conv2", f"{base}.bn2")
                    if f"{base}.downsample.0.weight" in sd:
                        cb(f"{base}.downsample.0", f"{base}.downsample.1")
            # fuse layers
            for i in range(n_br):
                for j in range(n_br):
                    base = f"stage{s}.{m}.fuse_layers.{i}.{j}"
                    if f"{base}.0.weight" in sd:  # j > i upsample path
                        cb(f"{base}.0", f"{base}.1")
                    else:  # j < i downsample chain
                        k = 0
                        while f"{base}.{k}.0.weight" in sd:
                            cb(f"{base}.{k}.0", f"{base}.{k}.1")
                            k += 1

    params["final_layer"] = {
        "w": jnp.asarray(np.transpose(sd["final_layer.weight"],
                                      (2, 3, 1, 0))),
        "b": jnp.asarray(sd["final_layer.bias"]),
    }
    return params


# ---------------- forward ----------------

def _conv(x, p, stride=1, pad=0, relu=True):
    x = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x * p["scale"] + p["shift"]
    return jax.nn.relu(x) if relu else x


def _basic_block(params, base, x):
    residual = x
    y = _conv(x, params[f"{base}.conv1"], stride=1, pad=1)
    y = _conv(y, params[f"{base}.conv2"], stride=1, pad=1, relu=False)
    if f"{base}.downsample.0" in params:
        residual = _conv(x, params[f"{base}.downsample.0"], relu=False)
    return jax.nn.relu(y + residual)


def _bottleneck(params, base, x):
    residual = x
    y = _conv(x, params[f"{base}.conv1"])
    y = _conv(y, params[f"{base}.conv2"], stride=1, pad=1)
    y = _conv(y, params[f"{base}.conv3"], relu=False)
    if f"{base}.downsample.0" in params:
        residual = _conv(x, params[f"{base}.downsample.0"], relu=False)
    return jax.nn.relu(y + residual)


def _upsample_nearest(x, factor: int):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def _hr_module(params, base, xs: List, n_br: int, n_blocks: List[int],
               multi_scale_output: bool) -> List:
    xs = [x for x in xs]
    for br in range(n_br):
        for blk in range(n_blocks[br]):
            xs[br] = _basic_block(params, f"{base}.branches.{br}.{blk}",
                                  xs[br])
    if n_br == 1:
        return xs

    def fuse_term(i: int, j: int):
        if j == i:
            return xs[j]
        if j > i:
            fused = _conv(xs[j], params[f"{base}.fuse_layers.{i}.{j}.0"],
                          relu=False)
            return _upsample_nearest(fused, 2 ** (j - i))
        # j < i: strided 3x3 downsample chain; ReLU on all but the last
        term = xs[j]
        for k in range(i - j):
            term = _conv(term, params[f"{base}.fuse_layers.{i}.{j}.{k}.0"],
                         stride=2, pad=1, relu=(k != i - j - 1))
        return term

    out = []
    n_out = n_br if multi_scale_output else 1
    for i in range(n_out):
        y = fuse_term(i, 0)
        for j in range(1, n_br):
            y = y + fuse_term(i, j)
        out.append(jax.nn.relu(y))
    return out


def hrnet_forward(params: Dict, x: jnp.ndarray, extra: Dict) -> jnp.ndarray:
    """(B, H, W, 3) normalized input -> (B, H/4, W/4, num_joints) heatmaps."""
    x = _conv(x, params["conv1"], stride=2, pad=1)
    x = _conv(x, params["conv2"], stride=2, pad=1)
    for b in range(4):
        x = _bottleneck(params, f"layer1.{b}", x)

    xs = [x]
    for s, stage_key in ((2, "STAGE2"), (3, "STAGE3"), (4, "STAGE4")):
        spec = extra[stage_key]
        n_br = spec["NUM_BRANCHES"]
        t = f"transition{s - 1}"
        new_xs = []
        for i in range(n_br):
            if f"{t}.{i}.0" in params:
                # channel-adapting conv; the reference feeds the LAST previous
                # map here (pose_hrnet.py:437-455)
                new_xs.append(_conv(xs[-1], params[f"{t}.{i}.0"],
                                    stride=1, pad=1))
            elif f"{t}.{i}.0.0" in params:  # new branch: strided conv chain
                y = xs[-1]
                j = 0
                while f"{t}.{i}.{j}.0" in params:
                    y = _conv(y, params[f"{t}.{i}.{j}.0"], stride=2, pad=1)
                    j += 1
                new_xs.append(y)
            else:
                new_xs.append(xs[i])
        xs = new_xs
        for m in range(spec["NUM_MODULES"]):
            multi = not (stage_key == "STAGE4"
                         and m == spec["NUM_MODULES"] - 1)
            xs = _hr_module(params, f"stage{s}.{m}", xs, n_br,
                            spec["NUM_BLOCKS"], multi)

    y = jax.lax.conv_general_dilated(
        xs[0], params["final_layer"]["w"], window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["final_layer"]["b"]
