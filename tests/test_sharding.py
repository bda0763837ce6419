"""Data-parallel mesh tests on the 8-virtual-device CPU backend
(SURVEY.md §4 fake-device tests — replaces multi-node testing)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdrn_tpu.config import TINY_64
from tests.helpers import tiny_detector
from tdrn_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch_tree,
)
from tdrn_tpu.train import Targets, init_train_state, make_optimizer, make_train_step
from tests.test_loss import synth_batch


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_data_parallel_train_step():
    mesh = make_mesh()
    model = tiny_detector(temporal=False)
    opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
    ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=8)
    rng = np.random.RandomState(0)
    images, targets = synth_batch(rng, batch=8)

    ts = replicate_tree(ts, mesh)
    images = jax.device_put(images, batch_sharding(mesh))
    targets = shard_batch_tree(targets, mesh)

    step = make_train_step(model, opt)
    ts2, metrics = step(ts, images, targets)
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update (XLA inserted the grad psum)
    p0 = jax.tree.leaves(ts2.params)[0]
    assert p0.sharding.is_fully_replicated


def test_dp_matches_single_device():
    """Sharded and unsharded training must produce identical parameters."""
    model = tiny_detector(temporal=False)
    opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
    rng = np.random.RandomState(1)
    images, targets = synth_batch(rng, batch=8)
    step = make_train_step(model, opt)

    ts_a = init_train_state(model, jax.random.PRNGKey(0), opt, batch=8)
    ts_a, _ = step(ts_a, images, targets)

    mesh = make_mesh()
    ts_b = init_train_state(model, jax.random.PRNGKey(0), opt, batch=8)
    ts_b = replicate_tree(ts_b, mesh)
    imgs_s = jax.device_put(images, batch_sharding(mesh))
    tg_s = shard_batch_tree(targets, mesh)
    ts_b, _ = step(ts_b, imgs_s, tg_s)

    la, lb = jax.tree.leaves(ts_a.params), jax.tree.leaves(ts_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


import pytest


@pytest.mark.slow
def test_clip_mode_sharded_real_geometry():
    """Full sharded clip-mode train step at REAL vid_320 geometry (320 input,
    6375 priors, T=2, B=8 across the 8-device mesh; width_mult 0.25 keeps the
    CPU compile tractable). The TINY_64 dryrun proves the program structure;
    this proves the sharding at real spatial shapes and prior counts
    (VERDICT round-2 item 7)."""
    from tdrn_tpu.config import VID_320
    from tdrn_tpu.models import build_detector

    mesh = make_mesh()
    model = build_detector(
        VID_320, temporal=True, tcb_channels=64, width_mult=0.25
    )
    opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
    t, b, g = 2, 8, 8
    ts = replicate_tree(
        init_train_state(model, jax.random.PRNGKey(0), opt, batch=b), mesh
    )
    rng = np.random.RandomState(3)
    frames = jnp.asarray(rng.randn(t, b, 320, 320, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32), (t, b, g, 1))
    )
    labels = jnp.ones((t, b, g), jnp.int32)
    valid = jnp.asarray(
        np.tile(np.asarray([True] + [False] * (g - 1)), (t, b, 1))
    )
    frames = shard_batch_tree(frames, mesh, leading_time_axis=True)
    targets = shard_batch_tree(
        Targets(boxes, labels, valid), mesh, leading_time_axis=True
    )
    step = make_train_step(model, opt, clip_mode=True)
    ts, metrics = step(ts, frames, targets)
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree.leaves(ts.params)[0].sharding.is_fully_replicated


def test_clip_mode_sharded():
    mesh = make_mesh()
    model = tiny_detector(temporal=True)
    opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
    ts = replicate_tree(init_train_state(model, jax.random.PRNGKey(0), opt, batch=8), mesh)
    rng = np.random.RandomState(2)
    t, b = 2, 8
    frames = jnp.asarray(rng.randn(t, b, 64, 64, 3).astype(np.float32))
    _, tg = synth_batch(rng, batch=b)
    targets = Targets(
        jnp.broadcast_to(tg.boxes, (t,) + tg.boxes.shape),
        jnp.broadcast_to(tg.labels, (t,) + tg.labels.shape),
        jnp.broadcast_to(tg.valid, (t,) + tg.valid.shape),
    )
    frames = shard_batch_tree(frames, mesh, leading_time_axis=True)
    targets = shard_batch_tree(targets, mesh, leading_time_axis=True)
    step = make_train_step(model, opt, clip_mode=True)
    ts, metrics = step(ts, frames, targets)
    assert np.isfinite(float(metrics["loss"]))


def test_streaming_inference_sharded_matches_unsharded():
    """Multi-chip SERVING path (SURVEY §2 parallelism DP row): 8 stream lanes
    sharded across the 8-device mesh through the full streaming step
    (preprocess -> model+state -> detect). Params replicate; frames/state
    shard on the stream axis; XLA partitions the program with no collectives
    (every op is per-image). Raw prediction tensors must match the
    single-device run to float tolerance (bitwise is NOT guaranteed across
    partitionings - fusion/summation order differ, which can reorder
    near-tied top-k ranks of an untrained model - so detect output is
    checked for shape/finiteness, predictions for value parity)."""
    from tdrn_tpu.ops.detection import detect_topk
    from tdrn_tpu.ops.preprocess import preprocess_batch
    from tdrn_tpu.ops.priors import prior_boxes

    model = tiny_detector(temporal=True)
    cfg = model.cfg
    b = 8
    rng = np.random.RandomState(7)
    frames = jnp.asarray(rng.randint(0, 255, (b, 64, 64, 3), np.uint8))
    state0 = model.zero_state(b)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((b, 64, 64, 3)), state0
    )

    @jax.jit
    def step(params, state, frames_u8):
        x = preprocess_batch(frames_u8, cfg, model.dtype)
        preds, new_state = model.apply(params, x, state)
        return new_state, preds, detect_topk(preds, prior_boxes(cfg), cfg)

    # Two steps so the temporal carry crosses the shard boundary too.
    st, _, _ = step(params, state0, frames)
    _, preds_ref, det_ref = step(params, st, frames)

    mesh = make_mesh()
    params_s = replicate_tree(params, mesh)
    state_s = shard_batch_tree(model.zero_state(b), mesh)
    frames_s = jax.device_put(frames, batch_sharding(mesh))
    st_s, _, _ = step(params_s, state_s, frames_s)
    _, preds_s, det_s = step(params_s, st_s, frames_s)

    for a, bb in zip(preds_ref, preds_s):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(a, bb, atol=1e-5 * scale, rtol=1e-5)
    assert det_s.boxes.shape == det_ref.boxes.shape
    assert np.isfinite(np.asarray(det_s.scores)).all()
    # Per-image score SETS agree (rank order may differ at float epsilon).
    np.testing.assert_allclose(
        np.sort(np.asarray(det_s.scores), axis=-1),
        np.sort(np.asarray(det_ref.scores), axis=-1),
        atol=1e-4,
    )


@pytest.mark.slow
def test_full_width_production_program_partitions():
    """VERDICT r3 item 6: the PRODUCTION-geometry (width 1.0, tcb 256)
    sharded clip-training step must compile + execute over the 8-device
    mesh — not just the width-0.25 dryrun variant. Multi-minute CPU compile;
    slow-marked."""
    import __graft_entry__ as g

    g.dryrun_multichip(8, "vid_320_full")
