"""PyTorch checkpoint interchange for GastNet weights.

Maps the reference's ``state_dict`` layout (module names as constructed in
model/gast_net.py:107-233: expand_conv / init_bn / expand_bn / layers_conv /
layers_bn / layers_graph_conv.{i}.{local_graph_layer,global_graph_layer,
cat_conv,cat_bn} / shrink, including BatchNorm running stats) onto the gastx
(params, state) pytrees — and back. This enables bit-parity evaluation against
distributed reference checkpoints such as ``27_frame_model.bin``
(README.md:85-87) and round-tripping weights for external consumers.

Torch conv weights are (Cout, Cin, kh, kw); ours are channels-last
(kh, Cin, Cout) for temporal convs and (Cin, Cout) for pointwise convs.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from gastx.models.config import GastNetConfig, graph_statics
from gastx.models.init import init_gastnet


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().numpy()  # torch tensor


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.bin`` checkpoint into a flat numpy state dict.

    Accepts either the training-checkpoint dict ``{..., 'model_pos': sd}``
    (trainval.py:151-157) or a bare state_dict. ``module.`` DataParallel
    prefixes are stripped.
    """
    import torch  # local import: torch is only needed for interchange

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_pos" in blob:
        blob = blob["model_pos"]
    sd = {}
    for key, value in blob.items():
        if key.startswith("module."):
            key = key[len("module."):]
        sd[key] = _np(value)
    return sd


def _bn_params(sd, prefix):
    return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]})


def _tconv(sd, key):
    # (Cout, Cin, fw, 1) -> (fw, Cin, Cout)
    return np.transpose(sd[key][:, :, :, 0], (2, 1, 0))


def _pconv(sd, key):
    # (Cout, Cin, 1, 1) -> (Cin, Cout)
    return np.transpose(sd[key][:, :, 0, 0], (1, 0))


def params_from_state_dict(
    sd: Dict[str, np.ndarray], cfg: GastNetConfig
) -> Tuple[Dict, Dict]:
    """Build gastx (params, state) pytrees from a reference state dict."""
    import jax.numpy as jnp

    def arr(x):
        return jnp.asarray(np.ascontiguousarray(x), dtype=jnp.float32)

    params: Dict = {}
    state: Dict = {}

    p, s = _bn_params(sd, "init_bn")
    params["init_bn"], state["init_bn"] = p, s
    params["expand_conv"] = {"w": _tconv(sd, "expand_conv.weight")}
    p, s = _bn_params(sd, "expand_bn")
    params["expand_bn"], state["expand_bn"] = p, s

    temporal_p, temporal_s = [], []
    for i in range(cfg.num_levels - 1):
        p_t, s_t = _bn_params(sd, f"layers_bn.{2 * i}")
        p_1, s_1 = _bn_params(sd, f"layers_bn.{2 * i + 1}")
        temporal_p.append({
            "conv_t": {"w": _tconv(sd, f"layers_conv.{2 * i}.weight")},
            "bn_t": p_t,
            "conv_1": {"w": _pconv(sd, f"layers_conv.{2 * i + 1}.weight")},
            "bn_1": p_1,
        })
        temporal_s.append({"bn_t": s_t, "bn_1": s_1})

    gabs_p, gabs_s = [], []
    for i in range(cfg.num_levels):
        g = f"layers_graph_conv.{i}"
        c = cfg.block_channels(i)
        inter = c // 4
        num_heads = c // inter

        w_sym = sd[f"{g}.local_graph_layer.gcn_sym.W"]
        w_con = sd[f"{g}.local_graph_layer.gcn_con.W"]
        p_bn1, s_bn1 = _bn_params(sd, f"{g}.local_graph_layer.bn_1")
        p_bn2, s_bn2 = _bn_params(sd, f"{g}.local_graph_layer.bn_2")
        p_lcbn, s_lcbn = _bn_params(sd, f"{g}.local_graph_layer.cat_bn")
        local_p = {
            "sym": {"W0": w_sym[0], "W1": w_sym[1],
                    "e": sd[f"{g}.local_graph_layer.gcn_sym.e"]},
            "con": {"W0": w_con[0], "W1": w_con[1],
                    "e": sd[f"{g}.local_graph_layer.gcn_con.e"]},
            "bn_sym": p_bn1,
            "bn_con": p_bn2,
            "cat_w": _pconv(sd, f"{g}.local_graph_layer.cat_conv.weight"),
            "cat_bn": p_lcbn,
        }
        local_s = {"bn_sym": s_bn1, "bn_con": s_bn2, "cat_bn": s_lcbn}

        def head_stack(name, idx=i, heads=num_heads, gg=g):
            return np.stack([
                sd[f"{gg}.global_graph_layer.attentions.{k}.{name}"]
                for k in range(heads)
            ])

        # Conv1d weights (Cout, Cin, 1) -> per-head (Cin, Cout)
        theta_w = np.transpose(head_stack("theta.weight")[..., 0], (0, 2, 1))
        phi_w = np.transpose(head_stack("phi.weight")[..., 0], (0, 2, 1))
        g_w = np.transpose(head_stack("g.weight")[..., 0], (0, 2, 1))
        proj = head_stack("concat_project.0.weight")[:, 0, :, 0, 0]  # (K, 2I)
        p_gcbn, s_gcbn = _bn_params(sd, f"{g}.global_graph_layer.cat_bn")
        glob_p = {
            "theta_w": theta_w, "theta_b": head_stack("theta.bias"),
            "phi_w": phi_w, "phi_b": head_stack("phi.bias"),
            "g_w": g_w, "g_b": head_stack("g.bias"),
            "proj_theta": proj[:, :inter], "proj_phi": proj[:, inter:],
            "C_k": head_stack("C_k"),
            "cat_w": _pconv(sd, f"{g}.global_graph_layer.cat_conv.weight"),
            "cat_bn": p_gcbn,
        }
        glob_s = {"cat_bn": s_gcbn}

        p_cbn, s_cbn = _bn_params(sd, f"{g}.cat_bn")
        gabs_p.append({
            "local": local_p,
            "global": glob_p,
            "cat_w": _pconv(sd, f"{g}.cat_conv.weight"),
            "cat_bn": p_cbn,
        })
        gabs_s.append({"local": local_s, "global": glob_s, "cat_bn": s_cbn})

    params["temporal"] = tuple(temporal_p)
    params["gabs"] = tuple(gabs_p)
    params["shrink"] = {"w": _pconv(sd, "shrink.weight")}
    state["temporal"] = tuple(temporal_s)
    state["gabs"] = tuple(gabs_s)

    import jax
    params = jax.tree_util.tree_map(arr, params)
    state = jax.tree_util.tree_map(arr, state)
    _validate_against_init(params, cfg)
    return params, state


def _validate_against_init(params, cfg: GastNetConfig) -> None:
    """Shape-check an imported tree against a freshly initialized one."""
    import jax

    ref_params, _ = init_gastnet(jax.random.PRNGKey(0), cfg)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_params)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    if ref_shapes != got_shapes:
        raise ValueError(
            "Imported checkpoint does not match model config "
            f"{cfg}:\nexpected {ref_shapes}\ngot {got_shapes}")


def state_dict_from_params(params, state, cfg: GastNetConfig
                           ) -> Dict[str, np.ndarray]:
    """Export gastx weights back to the reference's state_dict layout."""
    sd: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(s["var"])
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    def put_tconv(key, w):
        sd[key] = np.transpose(np.asarray(w), (2, 1, 0))[:, :, :, None]

    def put_pconv(key, w):
        sd[key] = np.transpose(np.asarray(w), (1, 0))[:, :, None, None]

    put_bn("init_bn", params["init_bn"], state["init_bn"])
    put_tconv("expand_conv.weight", params["expand_conv"]["w"])
    put_bn("expand_bn", params["expand_bn"], state["expand_bn"])

    for i, (blk_p, blk_s) in enumerate(zip(params["temporal"],
                                           state["temporal"])):
        put_tconv(f"layers_conv.{2 * i}.weight", blk_p["conv_t"]["w"])
        put_pconv(f"layers_conv.{2 * i + 1}.weight", blk_p["conv_1"]["w"])
        put_bn(f"layers_bn.{2 * i}", blk_p["bn_t"], blk_s["bn_t"])
        put_bn(f"layers_bn.{2 * i + 1}", blk_p["bn_1"], blk_s["bn_1"])

    for i, (gab_p, gab_s) in enumerate(zip(params["gabs"], state["gabs"])):
        g = f"layers_graph_conv.{i}"
        local_p, local_s = gab_p["local"], gab_s["local"]
        sd[f"{g}.local_graph_layer.gcn_sym.W"] = np.stack(
            [np.asarray(local_p["sym"]["W0"]), np.asarray(local_p["sym"]["W1"])])
        sd[f"{g}.local_graph_layer.gcn_sym.e"] = np.asarray(local_p["sym"]["e"])
        sd[f"{g}.local_graph_layer.gcn_con.W"] = np.stack(
            [np.asarray(local_p["con"]["W0"]), np.asarray(local_p["con"]["W1"])])
        sd[f"{g}.local_graph_layer.gcn_con.e"] = np.asarray(local_p["con"]["e"])
        put_bn(f"{g}.local_graph_layer.bn_1", local_p["bn_sym"],
               local_s["bn_sym"])
        put_bn(f"{g}.local_graph_layer.bn_2", local_p["bn_con"],
               local_s["bn_con"])
        put_pconv(f"{g}.local_graph_layer.cat_conv.weight", local_p["cat_w"])
        put_bn(f"{g}.local_graph_layer.cat_bn", local_p["cat_bn"],
               local_s["cat_bn"])

        glob_p, glob_s = gab_p["global"], gab_s["global"]
        num_heads = glob_p["theta_w"].shape[0]
        for k in range(num_heads):
            a = f"{g}.global_graph_layer.attentions.{k}"
            sd[f"{a}.theta.weight"] = np.transpose(
                np.asarray(glob_p["theta_w"][k]), (1, 0))[:, :, None]
            sd[f"{a}.theta.bias"] = np.asarray(glob_p["theta_b"][k])
            sd[f"{a}.phi.weight"] = np.transpose(
                np.asarray(glob_p["phi_w"][k]), (1, 0))[:, :, None]
            sd[f"{a}.phi.bias"] = np.asarray(glob_p["phi_b"][k])
            sd[f"{a}.g.weight"] = np.transpose(
                np.asarray(glob_p["g_w"][k]), (1, 0))[:, :, None]
            sd[f"{a}.g.bias"] = np.asarray(glob_p["g_b"][k])
            sd[f"{a}.C_k"] = np.asarray(glob_p["C_k"][k])
            proj = np.concatenate([np.asarray(glob_p["proj_theta"][k]),
                                   np.asarray(glob_p["proj_phi"][k])])
            sd[f"{a}.concat_project.0.weight"] = proj[None, :, None, None]
        put_pconv(f"{g}.global_graph_layer.cat_conv.weight", glob_p["cat_w"])
        put_bn(f"{g}.global_graph_layer.cat_bn", glob_p["cat_bn"],
               glob_s["cat_bn"])

        put_pconv(f"{g}.cat_conv.weight", gab_p["cat_w"])
        put_bn(f"{g}.cat_bn", gab_p["cat_bn"], gab_s["cat_bn"])

    put_pconv("shrink.weight", params["shrink"]["w"])
    return sd
