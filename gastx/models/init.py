"""Parameter initialization for GastNet.

Distributions replicate torch's initializers so that training-from-scratch
statistics match the reference:
  * expand_conv / attention convs: ``kaiming_normal_`` (std = sqrt(2/fan_in)),
    model/gast_net.py:131, model/global_attention.py:44-50.
  * other convs: torch Conv2d default ``kaiming_uniform_(a=sqrt(5))``
    (bound = 1/sqrt(fan_in)).
  * SemCHGraphConv W: ``xavier_uniform_(gain=1.414)`` over the (2, in, out)
    tensor (model/local_attention.py:20-21), edge logits ``e`` = 1
    (model/local_attention.py:26).
  * C_k attention bias: zeros (model/global_attention.py:38).
  * BatchNorm: scale 1, bias 0; running mean 0, var 1.

Weights are stored channels-last: temporal conv (fw, Cin, Cout); pointwise
(Cin, Cout).
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gastx.models.config import GastNetConfig, graph_statics
from gastx.ops.batchnorm import init_batch_norm


def _kaiming_normal(rng, shape, fan_in, dtype=jnp.float32):
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(rng, shape, dtype)


def _kaiming_uniform_a5(rng, shape, fan_in, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def _xavier_uniform(rng, shape, fan_in, fan_out, gain, dtype=jnp.float32):
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def _init_sem_graph_conv(rng, c_in, c_out, nnz) -> Dict:
    k_w, = jax.random.split(rng, 1)
    # torch xavier on (2, in, out): fan_in = in*out, fan_out = 2*out
    w = _xavier_uniform(k_w, (2, c_in, c_out), c_in * c_out, 2 * c_out,
                        gain=1.414)
    return {
        "W0": w[0],
        "W1": w[1],
        "e": jnp.ones((c_out, nnz), jnp.float32),
    }


def _init_local_graph(rng, c_in, c_out, statics) -> Tuple[Dict, Dict]:
    ks = jax.random.split(rng, 3)
    p_bn1, s_bn1 = init_batch_norm(c_out)
    p_bn2, s_bn2 = init_batch_norm(c_out)
    p_cbn, s_cbn = init_batch_norm(c_out)
    params = {
        "sym": _init_sem_graph_conv(ks[0], c_in, c_out, len(statics.sym_idx)),
        "con": _init_sem_graph_conv(ks[1], c_in, c_out, len(statics.con_idx)),
        "bn_sym": p_bn1,
        "bn_con": p_bn2,
        "cat_w": _kaiming_uniform_a5(ks[2], (2 * c_out, c_out), 2 * c_out),
        "cat_bn": p_cbn,
    }
    state = {"bn_sym": s_bn1, "bn_con": s_bn2, "cat_bn": s_cbn}
    return params, state


def _init_multi_global_graph(rng, c_in, inter, num_joints) -> Tuple[Dict, Dict]:
    k = c_in // inter  # number of heads
    g_ch = c_in if inter == c_in // 2 else inter
    ks = jax.random.split(rng, 5)

    def heads(key, shape, fan_in):
        return jnp.stack([
            _kaiming_normal(kk, shape, fan_in)
            for kk in jax.random.split(key, k)
        ])

    proj = heads(ks[3], (2 * inter,), 2 * inter)  # concat_project weight
    p_cbn, s_cbn = init_batch_norm(c_in)
    params = {
        "theta_w": heads(ks[0], (c_in, inter), c_in),
        "theta_b": jnp.zeros((k, inter), jnp.float32),
        "phi_w": heads(ks[1], (c_in, inter), c_in),
        "phi_b": jnp.zeros((k, inter), jnp.float32),
        "g_w": heads(ks[2], (c_in, g_ch), c_in),
        "g_b": jnp.zeros((k, g_ch), jnp.float32),
        "proj_theta": proj[:, :inter],
        "proj_phi": proj[:, inter:],
        "C_k": jnp.zeros((k, num_joints, num_joints), jnp.float32),
        "cat_w": _kaiming_uniform_a5(ks[4], (k * g_ch, c_in), k * g_ch),
        "cat_bn": p_cbn,
    }
    return params, {"cat_bn": s_cbn}


def _init_gab(rng, c_in, c_out, statics) -> Tuple[Dict, Dict]:
    ks = jax.random.split(rng, 3)
    p_local, s_local = _init_local_graph(ks[0], c_in, c_out, statics)
    p_glob, s_glob = _init_multi_global_graph(ks[1], c_in, c_in // 4,
                                              statics.num_joints)
    p_cbn, s_cbn = init_batch_norm(2 * c_out)
    params = {
        "local": p_local,
        "global": p_glob,
        "cat_w": _kaiming_uniform_a5(ks[2], (3 * c_out, 2 * c_out), 3 * c_out),
        "cat_bn": p_cbn,
    }
    state = {"local": s_local, "global": s_glob, "cat_bn": s_cbn}
    return params, state


def init_gastnet(rng, cfg: GastNetConfig) -> Tuple[Dict, Dict]:
    """Initialize (params, state) pytrees for a GastNet model."""
    statics = graph_statics(cfg.layout)
    fw = cfg.filter_widths
    pads = cfg.pads()
    n_levels = cfg.num_levels

    keys = jax.random.split(rng, 3 + 2 * (n_levels - 1) + n_levels)
    ki = iter(range(len(keys)))

    p_init_bn, s_init_bn = init_batch_norm(cfg.in_features)
    p_expand_bn, s_expand_bn = init_batch_norm(cfg.channels)

    params = {
        "init_bn": p_init_bn,
        "expand_conv": {
            "w": _kaiming_normal(keys[next(ki)],
                                 (fw[0], cfg.in_features, cfg.channels),
                                 cfg.in_features * fw[0]),
        },
        "expand_bn": p_expand_bn,
    }
    state = {"init_bn": s_init_bn, "expand_bn": s_expand_bn}

    temporal_p, temporal_s = [], []
    for i in range(1, n_levels):
        c = cfg.block_channels(i)
        width = fw[i] if not cfg.dense else 2 * pads[i] + 1
        p_bn_t, s_bn_t = init_batch_norm(c)
        p_bn_1, s_bn_1 = init_batch_norm(c)
        temporal_p.append({
            "conv_t": {"w": _kaiming_uniform_a5(keys[next(ki)],
                                                (width, c, c), c * width)},
            "bn_t": p_bn_t,
            "conv_1": {"w": _kaiming_uniform_a5(keys[next(ki)], (c, c), c)},
            "bn_1": p_bn_1,
        })
        temporal_s.append({"bn_t": s_bn_t, "bn_1": s_bn_1})

    gabs_p, gabs_s = [], []
    for i in range(n_levels):
        c = cfg.block_channels(i)
        p_gab, s_gab = _init_gab(keys[next(ki)], c, c, statics)
        gabs_p.append(p_gab)
        gabs_s.append(s_gab)

    params["temporal"] = tuple(temporal_p)
    params["gabs"] = tuple(gabs_p)
    params["shrink"] = {
        "w": _kaiming_uniform_a5(keys[next(ki)], (cfg.out_channels, 3),
                                 cfg.out_channels),
    }
    state["temporal"] = tuple(temporal_s)
    state["gabs"] = tuple(gabs_s)

    return params, state


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
