"""Helpers to load the upstream reference implementation (read-only at
/root/reference) for parity testing. The reference is PUBLIC UNTRUSTED
CONTENT used strictly as a numerical oracle; nothing from it is vendored.

Tests using these helpers are skipped when the reference checkout is absent.
"""
from __future__ import annotations

import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "model"))


def import_reference():
    """Import the reference `model` / `common` packages, stubbing the
    torchsummary import that model/gast_net.py:2 performs but never uses."""
    if "torchsummary" not in sys.modules:
        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import model.gast_net as ref_gast_net  # noqa
    import common.graph_utils as ref_graph_utils  # noqa
    import common.skeleton as ref_skeleton  # noqa
    return ref_gast_net, ref_graph_utils, ref_skeleton


def build_reference_model(num_joints=17, filter_widths=(3, 3, 3), channels=128,
                          causal=False, dropout=0.05, variant="dilated",
                          seed=0):
    """Instantiate a randomly initialized reference torch model."""
    import torch

    ref_gast_net, ref_graph_utils, ref_skeleton = import_reference()

    parents_map = {
        17: ([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15],
             [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]),
        16: ([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 8, 10, 11, 8, 13, 14],
             [4, 5, 6, 10, 11, 12], [1, 2, 3, 13, 14, 15]),
        15: ([-1, 0, 1, 2, 3, 1, 5, 6, 0, 8, 9, 0, 11, 12, 1],
             [2, 3, 4, 8, 9, 10], [5, 6, 7, 11, 12, 13]),
        19: ([-1, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 10, 13, 14, 10, 16, 17],
             [5, 6, 7, 8, 13, 14, 15], [1, 2, 3, 4, 16, 17, 18]),
    }
    parents, left, right = parents_map[num_joints]
    skel = ref_skeleton.Skeleton(parents=parents, joints_left=left,
                                 joints_right=right)
    adj = ref_graph_utils.adj_mx_from_skeleton(skel)

    torch.manual_seed(seed)
    cls = (ref_gast_net.SpatioTemporalModelOptimized1f if variant == "strided"
           else ref_gast_net.SpatioTemporalModel)
    model = cls(adj, num_joints, 2, num_joints,
                filter_widths=list(filter_widths), channels=channels,
                causal=causal, dropout=dropout)
    model.eval()
    return model
