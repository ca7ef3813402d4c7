"""Skeleton / layout / adjacency parity tests."""
import numpy as np
import pytest

from gastx.skeleton import (
    H36M_17,
    H36M_19,
    HUMANEVA_15,
    SH_16,
    Skeleton,
    adj_from_skeleton,
    get_layout,
    local_adjacencies,
)

from reference_torch import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")


H36M_NAMES = [""] * 32
for _i, _n in [(0, "Hip"), (1, "RHip"), (2, "RKnee"), (3, "RAnkle"),
               (6, "LHip"), (7, "LKnee"), (8, "LAnkle"), (12, "Spine"),
               (13, "Thorax"), (14, "Neck/Nose"), (15, "Head"),
               (17, "LShoulder"), (18, "LElbow"), (19, "LWrist"),
               (25, "RShoulder"), (26, "RElbow"), (27, "RWrist")]:
    H36M_NAMES[_i] = _n


def _full_h36m_skeleton():
    return Skeleton(
        parents=[-1, 0, 1, 2, 3, 4, 0, 6, 7, 8, 9, 0, 11, 12, 13, 14, 12,
                 16, 17, 18, 19, 20, 19, 22, 12, 24, 25, 26, 27, 28, 27, 30],
        joints_left=[6, 7, 8, 9, 10, 16, 17, 18, 19, 20, 21, 22, 23],
        joints_right=[1, 2, 3, 4, 5, 24, 25, 26, 27, 28, 29, 30, 31])


def test_h36m17_layout_derivation():
    """The registered 17-joint layout equals the dataset-derived skeleton
    (common/h36m_dataset.py:281-285)."""
    s = _full_h36m_skeleton()
    s.remove_joints([4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31])
    s._parents[11] = 8
    s._parents[14] = 8
    assert list(s.parents()) == list(H36M_17.parents)
    assert s.joints_left() == list(H36M_17.joints_left)
    assert s.joints_right() == list(H36M_17.joints_right)


def test_sh16_layout_derivation():
    s = _full_h36m_skeleton()
    s.remove_joints([i for i, x in enumerate(H36M_NAMES)
                     if x == "" or x == "Neck/Nose"])
    s._parents[10] = 8
    s._parents[13] = 8
    assert list(s.parents()) == list(SH_16.parents)
    assert s.joints_left() == list(SH_16.joints_left)
    assert s.joints_right() == list(SH_16.joints_right)


def test_get_layout_by_count():
    assert get_layout(17) is H36M_17
    assert get_layout(16) is SH_16
    assert get_layout(15) is HUMANEVA_15
    assert get_layout(19) is H36M_19
    assert get_layout("h36m17") is H36M_17


def test_adjacency_row_normalized():
    adj = adj_from_skeleton(H36M_17.skeleton())
    np.testing.assert_allclose(adj.sum(axis=1), np.ones(17), atol=1e-6)
    assert (np.diag(adj) > 0).all()
    # symmetric pattern
    assert ((adj > 0) == (adj > 0).T).all()


@pytest.mark.parametrize("layout", [H36M_17, SH_16, HUMANEVA_15, H36M_19])
def test_local_adjacency_patterns(layout):
    adj_sym, adj_con = local_adjacencies(layout)
    j = layout.num_joints
    # adj_sym: identity + mirror pairs only
    expected = np.eye(j, dtype=bool)
    for li, ri in zip(layout.joints_left, layout.joints_right):
        expected[li, ri] = True
        expected[ri, li] = True
    assert ((adj_sym > 0) == expected).all()
    # adj_con rows: distal rows carry 2nd-order, others 1st-order patterns
    adj = adj_from_skeleton(layout.skeleton())
    a2 = adj @ adj
    for i in range(j):
        if i in layout.distal_joints:
            assert ((adj_con[i] > 0) == (a2[i] > 0)).all()
        else:
            assert ((adj_con[i] > 0) == (adj[i] > 0)).all()


@requires_reference
def test_adjacency_matches_reference():
    from reference_torch import import_reference
    _, ref_graph_utils, ref_skeleton = import_reference()

    for layout in (H36M_17, SH_16, HUMANEVA_15, H36M_19):
        ref = ref_graph_utils.adj_mx_from_skeleton(
            ref_skeleton.Skeleton(parents=list(layout.parents),
                                  joints_left=list(layout.joints_left),
                                  joints_right=list(layout.joints_right)))
        got = adj_from_skeleton(layout.skeleton())
        np.testing.assert_allclose(got, ref.numpy(), atol=1e-6)


@requires_reference
def test_local_adjacency_masks_match_reference():
    """The sym/con sparsity patterns equal the ones LocalGraph builds
    internally (model/local_attention.py:92-114)."""
    import torch
    from reference_torch import import_reference
    _, ref_graph_utils, ref_skeleton = import_reference()
    from model.local_attention import LocalGraph as RefLocalGraph

    for layout in (H36M_17, SH_16, HUMANEVA_15, H36M_19):
        adj = ref_graph_utils.adj_mx_from_skeleton(
            ref_skeleton.Skeleton(parents=list(layout.parents),
                                  joints_left=list(layout.joints_left),
                                  joints_right=list(layout.joints_right)))
        torch.manual_seed(0)
        ref_local = RefLocalGraph(adj, 8, 8, dropout=None)
        ref_sym_mask = (ref_local.gcn_sym.adj[0] > 0).numpy()
        ref_con_mask = (ref_local.gcn_con.adj[0] > 0).numpy()

        adj_sym, adj_con = local_adjacencies(layout)
        assert ((adj_sym > 0) == ref_sym_mask).all(), layout.name
        assert ((adj_con > 0) == ref_con_mask).all(), layout.name
