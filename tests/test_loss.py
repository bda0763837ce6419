"""Loss + train-step tests: finiteness, gradient flow, single-batch overfit
(SURVEY.md §4 end-to-end fidelity strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models import build_detector
from tests.helpers import tiny_detector
from tdrn_tpu.ops.priors import prior_boxes
from tdrn_tpu.train import (
    Targets,
    init_train_state,
    make_optimizer,
    make_train_step,
    refine_multibox_loss,
)


def synth_batch(rng, batch=2, max_gt=5, num_classes=4, size=64):
    images = rng.randn(batch, size, size, 3).astype(np.float32) * 10
    boxes = np.zeros((batch, max_gt, 4), np.float32)
    labels = np.zeros((batch, max_gt), np.int32)
    valid = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        n = rng.randint(1, max_gt + 1)
        for i in range(n):
            # sizes spanning all 4 anchor scales so every head sees positives
            w, h = rng.uniform(0.08, 0.9, 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            boxes[b, i] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            labels[b, i] = rng.randint(0, num_classes - 1)
            valid[b, i] = True
    return (
        jnp.asarray(images),
        Targets(jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)),
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_detector(temporal=False)
    rng = np.random.RandomState(0)
    images, targets = synth_batch(rng, batch=4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, None)
    return model, params, images, targets


class TestLoss:
    def test_finite_and_positive(self, setup):
        model, params, images, targets = setup
        preds, _ = model.apply(params, images, None)
        loss, metrics = refine_multibox_loss(preds, prior_boxes(TINY_64), targets, TINY_64)
        assert np.isfinite(float(loss)) and float(loss) > 0
        for k in ("arm_loc", "arm_conf", "odm_loc", "odm_conf"):
            assert np.isfinite(float(metrics[k])), k

    def test_gradients_flow_everywhere(self, setup):
        model, params, images, targets = setup
        priors = prior_boxes(TINY_64)

        def loss_fn(p):
            preds, _ = model.apply(p, images, None)
            return refine_multibox_loss(preds, priors, targets, TINY_64)[0]

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # Most parameter groups receive signal. (Head convs at scales with no
        # positives/mined negatives in this batch legitimately get zero grad.)
        nonzero = [float(jnp.abs(g).max()) > 0 for g in flat]
        assert np.mean(nonzero) > 0.75, np.mean(nonzero)
        # Backbone + TCB always receive signal.
        for grp in ("backbone", "tcb"):
            leaves = jax.tree.leaves(grads["params"][grp])
            assert all(float(jnp.abs(g).max()) > 0 for g in leaves), grp

    def test_empty_image_no_nan(self, setup):
        model, params, images, _ = setup
        b = images.shape[0]
        empty = Targets(
            jnp.zeros((b, 5, 4)), jnp.zeros((b, 5), jnp.int32), jnp.zeros((b, 5), bool)
        )
        preds, _ = model.apply(params, images, None)
        loss, _ = refine_multibox_loss(preds, prior_boxes(TINY_64), empty, TINY_64)
        assert np.isfinite(float(loss))


class TestTrainStep:
    def test_loss_decreases_overfit(self, setup):
        model, _, images, targets = setup
        opt = make_optimizer(base_lr=5e-3, warmup_steps=1, milestones=(10**9,))
        ts = init_train_state(model, jax.random.PRNGKey(1), opt, batch=4)
        step = make_train_step(model, opt, clip_mode=False)
        losses = []
        for _ in range(12):
            ts, metrics = step(ts, images, targets)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses

    def test_bf16_training_converges(self, setup):
        """Mixed-precision training (train.py --bf16): fp32 master params, a
        single hoisted bf16 cast of the feature pyramid per step, fp32
        heads/loss. Finite grads and decreasing loss, so the --bf16 training
        flag is evidence-backed (VERDICT round-1 weak #6)."""
        from tdrn_tpu.config import TINY_64

        _, _, images, targets = setup
        model = build_detector(
            TINY_64, temporal=False, tcb_channels=32, width_mult=0.125,
        )
        opt = make_optimizer(base_lr=5e-3, warmup_steps=1, milestones=(10**9,))
        ts = init_train_state(model, jax.random.PRNGKey(1), opt, batch=4)
        # Params must stay fp32 (mixed precision: bf16 compute, fp32 master).
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(ts.params))
        step = make_train_step(model, opt, clip_mode=False,
                               compute_dtype=jnp.bfloat16)
        losses = []
        for _ in range(12):
            ts, metrics = step(ts, images, targets)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all(), losses
        # Masters stay fp32 through the update (grads cast back by autodiff).
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(ts.params))
        assert all(np.isfinite(x).all() for x in jax.tree.leaves(ts.params))
        assert losses[-1] < losses[0] * 0.9, losses

    def test_bf16_clip_training_step(self):
        """Mixed precision composes with clip-mode TBPTT: the param cast is
        hoisted outside the lax.scan (one cast per step, not per frame) and
        the bf16 temporal carry trains to a decreasing loss."""
        model = tiny_detector(temporal=True)
        rng = np.random.RandomState(5)
        t, b = 3, 2
        frames = jnp.asarray(rng.rand(t, b, 64, 64, 3).astype(np.float32))
        img, tg = synth_batch(rng, batch=b)
        targets = Targets(
            jnp.tile(tg.boxes[None], (t, 1, 1, 1)),
            jnp.tile(tg.labels[None], (t, 1, 1)),
            jnp.tile(tg.valid[None], (t, 1, 1)),
        )
        opt = make_optimizer(base_lr=5e-3, warmup_steps=1, milestones=(10**9,))
        ts = init_train_state(model, jax.random.PRNGKey(2), opt, batch=b)
        step = make_train_step(model, opt, clip_mode=True,
                               compute_dtype=jnp.bfloat16)
        losses = []
        for _ in range(10):
            ts, metrics = step(ts, frames, targets)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all(), losses
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(ts.params))
        assert losses[-1] < losses[0], losses

    @pytest.mark.parametrize("remat", [False, True])
    def test_clip_mode_scan(self, remat):
        model = tiny_detector(temporal=True)
        rng = np.random.RandomState(3)
        t, b = 3, 2
        frames = jnp.asarray(rng.randn(t, b, 64, 64, 3).astype(np.float32))
        img, tg = synth_batch(rng, batch=b)
        targets = Targets(
            jnp.broadcast_to(tg.boxes, (t,) + tg.boxes.shape),
            jnp.broadcast_to(tg.labels, (t,) + tg.labels.shape),
            jnp.broadcast_to(tg.valid, (t,) + tg.valid.shape),
        )
        opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
        ts = init_train_state(model, jax.random.PRNGKey(2), opt, batch=b)
        step = make_train_step(model, opt, clip_mode=True, remat=remat)
        ts, metrics = step(ts, frames, targets)
        assert np.isfinite(float(metrics["loss"]))
        assert int(ts.step) == 1
