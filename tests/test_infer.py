"""End-to-end inference parity: lift_sequences (bucketed, batched, fused TTA)
vs the reference UnchunkedGenerator + torch-model + un-flip/average path.
This is the gate certifying that imported checkpoints reproduce reference
predictions (BASELINE.md: <=0.1mm MPJPE delta)."""
import numpy as np
import pytest

from gastx.infer import lift_sequences
from gastx.io import params_from_state_dict
from gastx.models import GastNetConfig

from reference_torch import build_reference_model, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available")

JL = [4, 5, 6, 11, 12, 13]
JR = [1, 2, 3, 14, 15, 16]


def _reference_predict(model, seq, pad, tta, kps_lr=(JL, JR),
                       joints_lr=(JL, JR)):
    import torch
    from reference_torch import import_reference
    import_reference()
    from common.generators import UnchunkedGenerator

    kl, kr = list(kps_lr[0]), list(kps_lr[1])
    jl, jr = list(joints_lr[0]), list(joints_lr[1])
    gen = UnchunkedGenerator(None, None, [seq], pad=pad, causal_shift=0,
                             augment=tta, kps_left=kl, kps_right=kr,
                             joints_left=jl, joints_right=jr)
    for _, _, batch_2d in gen.next_epoch():
        with torch.no_grad():
            pred = model(torch.from_numpy(batch_2d.astype("float32")))
            if tta:
                pred[1, :, :, 0] *= -1
                pred[1, :, jl + jr] = pred[1, :, jr + jl]
                pred = torch.mean(pred, dim=0, keepdim=True)
        return pred.squeeze(0).numpy()


@requires_reference
@pytest.mark.parametrize("tta", [False, True])
def test_lift_sequences_matches_reference(tta):
    import jax

    model = build_reference_model(seed=31)
    cfg = GastNetConfig(dropout=0.05)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, state = params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(7)
    # Two different lengths exercise separate buckets + tail trimming.
    seqs = [rng.standard_normal((t, 17, 2)).astype(np.float32)
            for t in (53, 121)]

    pad = (cfg.receptive_field() - 1) // 2
    with jax.default_matmul_precision("highest"):
        got = lift_sequences(params, state, seqs, cfg, tta=tta)

    for seq, pred in zip(seqs, got):
        ref = _reference_predict(model, seq, pad, tta)
        assert pred.shape == ref.shape == (seq.shape[0], 17, 3)
        # mm-scale delta: worst-joint error far below the 0.1mm budget
        delta_mm = np.max(np.linalg.norm(pred - ref, axis=-1)) * 1000
        assert delta_mm < 0.1, f"max per-joint delta {delta_mm:.4f} mm"


@requires_reference
def test_lift_sequences_sh16_kps_symmetry_matches_reference():
    """TTA with detections whose joint order differs from the 3D layout:
    sh_ft_h36m keeps the 2D in MPII order (keypoints_symmetry
    [3,4,5,13,14,15]/[0,1,2,10,11,12], data/prepare_data_2d_h36m_sh.py:28)
    while the 16-joint 3D skeleton has joints_left (4,5,6,10,11,12). The
    reference flips inputs with the former and un-flips outputs with the
    latter (main.py:41-48); lift_sequences must honor ``kps_lr`` the same
    way — without it the mirrored TTA copy is anatomically scrambled."""
    import jax

    sh_kps_lr = ([3, 4, 5, 13, 14, 15], [0, 1, 2, 10, 11, 12])
    joints_lr = ([4, 5, 6, 10, 11, 12], [1, 2, 3, 13, 14, 15])

    model = build_reference_model(num_joints=16, seed=13)
    cfg = GastNetConfig(num_joints_in=16, num_joints_out=16, layout="sh16",
                        dropout=0.05)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, state = params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(11)
    seq = rng.standard_normal((49, 16, 2)).astype(np.float32)
    pad = (cfg.receptive_field() - 1) // 2

    with jax.default_matmul_precision("highest"):
        got = lift_sequences(params, state, [seq], cfg, tta=True,
                             kps_lr=sh_kps_lr)[0]
    ref = _reference_predict(model, seq, pad, True, kps_lr=sh_kps_lr,
                             joints_lr=joints_lr)
    delta_mm = np.max(np.linalg.norm(got - ref, axis=-1)) * 1000
    assert delta_mm < 0.1, f"max per-joint delta {delta_mm:.4f} mm"

    # And the old (buggy) behavior really is different: without kps_lr the
    # flip uses the 3D symmetry and must NOT match the reference.
    with jax.default_matmul_precision("highest"):
        wrong = lift_sequences(params, state, [seq], cfg, tta=True)[0]
    assert np.max(np.linalg.norm(wrong - ref, axis=-1)) * 1000 > 0.1


def test_lift_sequences_mesh_matches_single_device():
    """Serving-style DP inference: lift_sequences over an 8-device mesh
    (batch axis sharded, params replicated) returns the same poses as the
    single-device path — including TTA's in-jit batch doubling and the
    mesh-multiple batch padding."""
    import jax

    from gastx.models import init_gastnet
    from gastx.parallel import make_mesh

    cfg = GastNetConfig(filter_widths=(3, 3), channels=16, dropout=0.0)
    params, state = init_gastnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    # 3 sequences (pads to 8 = mesh size) of two different lengths.
    seqs = [rng.standard_normal((t, 17, 2)).astype(np.float32)
            for t in (21, 40, 21)]

    single = lift_sequences(params, state, seqs, cfg, tta=True)
    mesh = make_mesh(jax.devices()[:8])
    sharded = lift_sequences(params, state, seqs, cfg, tta=True, mesh=mesh)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, atol=1e-6)
