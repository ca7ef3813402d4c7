"""Training-stack tests: amsgrad parity vs torch, train-step behavior,
data-parallel sharding equivalence, checkpoint roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gastx.models import GastNetConfig, gastnet_forward, init_gastnet
from gastx.parallel import make_mesh, replicate, shard_batch
from gastx.train import (
    TrainState,
    exponential_epoch_decay,
    init_train_state,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
    scale_by_amsgrad,
)

TINY = GastNetConfig(num_joints_in=15, num_joints_out=15,
                     filter_widths=(3, 3), channels=8, dropout=0.0,
                     layout="humaneva15")


def _tiny_batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    rf = TINY.receptive_field()
    x2d = rng.standard_normal((n, rf, 15, 2)).astype(np.float32)
    x3d = rng.standard_normal((n, 1, 15, 3)).astype(np.float32)
    return x2d, x3d


def test_amsgrad_matches_torch_adam():
    import torch

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(6)]
    lr = 1e-2

    # torch reference
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, amsgrad=True)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    # gastx
    tx = scale_by_amsgrad()
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params,
                                        updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), atol=1e-6)


def test_lr_decay_schedule():
    assert exponential_epoch_decay(1e-3, 0.95, 0) == pytest.approx(1e-3)
    assert exponential_epoch_decay(1e-3, 0.95, 10) == pytest.approx(
        1e-3 * 0.95**10)


def test_train_step_reduces_loss():
    params, bn_state = init_gastnet(jax.random.PRNGKey(0), TINY)
    ts = init_train_state(params, bn_state)
    step = make_train_step(TINY, variant="strided")
    x2d, x3d = _tiny_batch()

    w = jnp.ones((x2d.shape[0],), jnp.float32)
    losses = []
    for i in range(8):
        ts, loss = step(ts, x2d, x3d, w, jnp.float32(1e-3),
                        jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_data_parallel_equivalence():
    """Loss and gradients over an 8-device DP mesh equal the single-device
    result (global-batch BN stats + psum'd gradients).

    Gradients are compared instead of post-optimizer params: Adam's first
    step is ~sign(g), so fp32 cross-device reduction-order noise near g=0
    flips update signs without any distributed bug.
    """
    from gastx.models import gastnet_forward
    from gastx.eval.metrics import mpjpe

    params, bn_state = init_gastnet(jax.random.PRNGKey(0), TINY)
    x2d, x3d = _tiny_batch(n=8, seed=3)
    w = np.ones((8,), np.float32)

    def loss_fn(p, b2, b3, wts):
        pred, _ = gastnet_forward(p, bn_state, b2, TINY, variant="strided",
                                  train=True, rng=jax.random.PRNGKey(0))
        target = b3.at[:, :, 0].set(0.0)
        err = jnp.mean(jnp.linalg.norm(pred - target, axis=-1), axis=(1, 2))
        return jnp.sum(err * wts) / jnp.sum(wts)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss1, grads1 = grad_fn(params, jnp.asarray(x2d), jnp.asarray(x3d),
                            jnp.asarray(w))

    mesh = make_mesh(jax.devices()[:8])
    params8 = replicate(mesh, params)
    with mesh:
        (x2d_s, x3d_s, w_s), _ = shard_batch(mesh, x2d, x3d, w)
        loss8, grads8 = grad_fn(params8, x2d_s, x3d_s, w_s)

    assert float(loss8) == pytest.approx(float(loss1), abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads1),
                    jax.tree_util.tree_leaves(jax.device_get(grads8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    # And the full optimizer step executes under the mesh with sharded state.
    ts8 = replicate(mesh, init_train_state(params8, replicate(mesh,
                                                              bn_state)))
    with mesh:
        step = make_train_step(TINY, variant="strided")
        ts8, loss = step(ts8, x2d_s, x3d_s, w_s, jnp.float32(1e-3),
                         jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_dropout_rng_changes_output():
    cfg = GastNetConfig(num_joints_in=15, num_joints_out=15,
                        filter_widths=(3, 3), channels=8, dropout=0.5,
                        layout="humaneva15")
    params, bn_state = init_gastnet(jax.random.PRNGKey(0), cfg)
    x2d, _ = _tiny_batch()
    y1, _ = gastnet_forward(params, bn_state, x2d, cfg, variant="strided",
                            train=True, rng=jax.random.PRNGKey(1))
    y2, _ = gastnet_forward(params, bn_state, x2d, cfg, variant="strided",
                            train=True, rng=jax.random.PRNGKey(2))
    y1r, _ = gastnet_forward(params, bn_state, x2d, cfg, variant="strided",
                             train=True, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1r))


def test_checkpoint_roundtrip(tmp_path):
    params, bn_state = init_gastnet(jax.random.PRNGKey(0), TINY)
    ts = init_train_state(params, bn_state)
    rs = np.random.RandomState(1234)
    rs.permutation(10)  # advance

    path = str(tmp_path / "ckpt.bin")
    save_checkpoint(path, epoch=7, lr=4.2e-4, train_state=ts,
                    batcher_random_state=rs)
    blob = load_checkpoint(path)
    assert blob["epoch"] == 7
    assert blob["lr"] == pytest.approx(4.2e-4)

    restored = blob["train_state"]
    for a, b in zip(jax.tree_util.tree_leaves(ts),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from gastx.train import restore_batcher_random_state
    rs2 = restore_batcher_random_state(blob)
    np.testing.assert_array_equal(rs.permutation(100), rs2.permutation(100))


def test_endless_batcher_under_dp_mesh():
    """Endless-mode ChunkedBatcher feeding the sharded train step across an
    epoch boundary (VERDICT r1 item 5): fixed padded batch shape on the
    8-device mesh (no per-batch recompiles), zero-weight filler on ragged
    tails, reshuffled chunk order after the boundary, finite losses
    throughout."""
    from gastx.data.generators import ChunkedBatcher

    rng = np.random.default_rng(0)
    rf = TINY.receptive_field()
    pad = rf // 2
    poses_3d = [rng.standard_normal((20, 15, 3)).astype(np.float32)
                for _ in range(2)]
    poses_2d = [p[..., :2].copy() for p in poses_3d]
    batcher = ChunkedBatcher(6, None, poses_3d, poses_2d, chunk_length=1,
                             pad=pad, shuffle=True, endless=True)
    n_batches = batcher.num_batches
    assert n_batches >= 3

    mesh = make_mesh(jax.devices()[:8])
    params, bn_state = init_gastnet(jax.random.PRNGKey(0), TINY)
    ts = replicate(mesh, init_train_state(params, bn_state))
    step = make_train_step(TINY, variant="strided")
    n_dev = mesh.devices.size
    padded_batch = -(-6 // n_dev) * n_dev

    losses, seen_sizes = [], []
    gen = batcher.next_epoch()
    with mesh:
        for bi in range(2 * n_batches + 1):  # crosses the epoch boundary
            _, b3, b2 = next(gen)
            b = b2.shape[0]
            seen_sizes.append(b)
            w = np.zeros(padded_batch, np.float32)
            w[:b] = 1.0
            reps = padded_batch - b
            if reps:
                b2 = np.concatenate([b2, np.repeat(b2[-1:], reps, 0)])
                b3 = np.concatenate([b3, np.repeat(b3[-1:], reps, 0)])
            (b2s, b3s, ws), _ = shard_batch(mesh, b2.astype(np.float32),
                                            b3.astype(np.float32), w)
            ts, loss = step(ts, b2s, b3s, ws, jnp.float32(1e-3),
                            jax.random.PRNGKey(bi))
            losses.append(float(loss))

    assert np.isfinite(losses).all()
    # One epoch's batch-size pattern repeats identically after the boundary
    # (same chunk plan, fresh shuffle), so the generator really is endless.
    assert seen_sizes[:n_batches] == seen_sizes[n_batches:2 * n_batches]
    # Endless state checkpoints mid-epoch: (next batch index, this epoch's
    # shuffled pair order) — the resume contract for --resume under DP.
    start_idx, pairs = batcher.next_pairs()
    assert start_idx == 1 and len(pairs) > 0
