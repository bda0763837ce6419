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
