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


def _reference_predict(model, seq, pad, tta):
    import torch
    from reference_torch import import_reference
    import_reference()
    from common.generators import UnchunkedGenerator

    gen = UnchunkedGenerator(None, None, [seq], pad=pad, causal_shift=0,
                             augment=tta, kps_left=JL, kps_right=JR,
                             joints_left=JL, joints_right=JR)
    for _, _, batch_2d in gen.next_epoch():
        with torch.no_grad():
            pred = model(torch.from_numpy(batch_2d.astype("float32")))
            if tta:
                pred[1, :, :, 0] *= -1
                pred[1, :, JL + JR] = pred[1, :, JR + JL]
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
