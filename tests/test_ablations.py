"""Parity tests for the ablation/alternative modules the reference ships but
does not use by default: non-channel-wise SemGraphConv + its LocalGraph,
SingleGlobalGraph, PoseResNet, and the dense (non-dilated) model variant."""
import sys

import jax
import numpy as np
import pytest

from gastx.models import GastNetConfig, gastnet_forward, graph_statics
from gastx.io import params_from_state_dict
from gastx.ops.ablations import (
    local_graph_simple,
    sem_graph_conv,
    single_global_graph,
)

from reference_torch import (REFERENCE_PATH, build_reference_model,
                             import_reference, reference_available)

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


@requires_reference
def test_sem_graph_conv_matches_reference():
    import torch
    import_reference()
    from model.sem_graph_conv import SemGraphConv as RefConv
    from common.graph_utils import adj_mx_from_skeleton
    from common.skeleton import Skeleton as RefSkel

    from gastx.skeleton import H36M_17, local_adjacencies

    adj_sym, _ = local_adjacencies(H36M_17)
    torch.manual_seed(0)
    ref = RefConv(16, 24, torch.from_numpy(adj_sym))
    ref.eval()

    statics = graph_statics("h36m17")
    params = {
        "W0": ref.W[0].detach().numpy(),
        "W1": ref.W[1].detach().numpy(),
        "e": ref.e.detach().numpy(),
        "bias": ref.bias.detach().numpy(),
    }

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 17, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(sem_graph_conv(x, params, statics.sym_idx, 17))
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_reference
def test_local_graph_simple_matches_reference():
    import torch
    import_reference()
    from model.sem_graph_conv import LocalGraph as RefLocal
    from common.graph_utils import adj_mx_from_skeleton
    from common.skeleton import Skeleton as RefSkel

    from gastx.skeleton import H36M_17
    from gastx.skeleton.adjacency import adj_from_skeleton

    adj = torch.from_numpy(adj_from_skeleton(H36M_17.skeleton()))
    torch.manual_seed(1)
    ref = RefLocal(adj, 16, 16, dropout=None)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "sym": {"W0": sd["gcn_sym.W"][0], "W1": sd["gcn_sym.W"][1],
                "e": sd["gcn_sym.e"], "bias": sd["gcn_sym.bias"]},
        "con": {"W0": sd["gcn_con.W"][0], "W1": sd["gcn_con.W"][1],
                "e": sd["gcn_con.e"], "bias": sd["gcn_con.bias"]},
        "bn_sym": {"scale": sd["bn_1.weight"], "bias": sd["bn_1.bias"]},
        "bn_con": {"scale": sd["bn_2.weight"], "bias": sd["bn_2.bias"]},
        "cat_w": sd["cat_conv.weight"][:, :, 0, 0].T,
        "cat_bn": {"scale": sd["cat_bn.weight"], "bias": sd["cat_bn.bias"]},
    }
    state = {
        "bn_sym": {"mean": sd["bn_1.running_mean"],
                   "var": sd["bn_1.running_var"]},
        "bn_con": {"mean": sd["bn_2.running_mean"],
                   "var": sd["bn_2.running_var"]},
        "cat_bn": {"mean": sd["cat_bn.running_mean"],
                   "var": sd["cat_bn.running_var"]},
    }

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 17, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    statics = graph_statics("h36m17")
    got, _ = local_graph_simple(x, params, state, statics, train=False,
                                dropout_rate=0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@requires_reference
def test_single_global_graph_matches_reference():
    import torch
    import_reference()
    from model.global_attention import SingleGlobalGraph as RefSingle

    from gastx.skeleton import H36M_17
    from gastx.skeleton.adjacency import adj_from_skeleton

    adj = torch.from_numpy(adj_from_skeleton(H36M_17.skeleton()))
    torch.manual_seed(2)
    c = 16
    ref = RefSingle(adj, c, c)  # inter = c//2 -> g_channels = c
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    inter = c // 2
    proj = sd["attentions.concat_project.0.weight"][0, :, 0, 0]
    params = {
        "theta_w": sd["attentions.theta.weight"][:, :, 0].T,
        "theta_b": sd["attentions.theta.bias"],
        "phi_w": sd["attentions.phi.weight"][:, :, 0].T,
        "phi_b": sd["attentions.phi.bias"],
        "g_w": sd["attentions.g.weight"][:, :, 0].T,
        "g_b": sd["attentions.g.bias"],
        "proj_theta": proj[:inter],
        "proj_phi": proj[inter:],
        "C_k": sd["attentions.C_k"],
        "bn": {"scale": sd["bn.weight"], "bias": sd["bn.bias"]},
    }
    state = {"bn": {"mean": sd["bn.running_mean"],
                    "var": sd["bn.running_var"]}}

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 17, c)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = single_global_graph(x, params, state, train=False,
                                 dropout_rate=0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@requires_reference
def test_dense_variant_matches_reference():
    """dense=True swaps dilation for wide kernels (model/gast_net.py:145-146)."""
    import torch
    import_reference()
    from model.gast_net import SpatioTemporalModel
    from common.graph_utils import adj_mx_from_skeleton
    from common.skeleton import Skeleton as RefSkel

    from gastx.skeleton import H36M_17

    skel = RefSkel(parents=list(H36M_17.parents),
                   joints_left=list(H36M_17.joints_left),
                   joints_right=list(H36M_17.joints_right))
    adj = adj_mx_from_skeleton(skel)
    torch.manual_seed(3)
    ref = SpatioTemporalModel(adj, 17, 2, 17, filter_widths=[3, 3],
                              channels=32, dropout=0.0, dense=True)
    ref.eval()

    cfg = GastNetConfig(filter_widths=(3, 3), channels=32, dropout=0.0,
                        dense=True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, state = params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 17, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got, _ = gastnet_forward(params, state, x, cfg, variant="dilated")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@requires_reference
def test_pose_resnet_matches_reference():
    import torch

    if REFERENCE_PATH + "/lib/pose/hrnet/lib/models" not in sys.path:
        sys.path.insert(0, REFERENCE_PATH + "/lib/pose/hrnet/lib/models")
    import pose_resnet as ref_mod

    from gastx.pipeline.hrnet.pose_resnet import (import_pose_resnet_params,
                                                  pose_resnet_forward)

    class _Extra:
        DECONV_WITH_BIAS = False
        NUM_DECONV_LAYERS = 3
        NUM_DECONV_FILTERS = [32, 32, 32]
        NUM_DECONV_KERNELS = [4, 4, 4]
        FINAL_CONV_KERNEL = 1

    class _Model:
        EXTRA = _Extra
        NUM_JOINTS = 17

    class _Cfg:
        MODEL = _Model

    torch.manual_seed(4)
    model = ref_mod.PoseResNet(ref_mod.BasicBlock, [2, 2, 2, 2], _Cfg)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_pose_resnet_params(sd, num_layers=18)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(pose_resnet_forward(params,
                                         np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(got, (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
