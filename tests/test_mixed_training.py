"""Mixed frame+clip training (train.py --mixed_frames).

Round-3 diagnosis (NOTES.md): cold-start clip training collapses because a
clip step sees batch_size correlated scenes while frame training sees
batch_size independent ones. The mixed mode interleaves a frame-objective
optimizer step — independent frames run as T=1 clips through the SAME jitted
clip-mode train step — restoring scene diversity without a separate program
builder. This test pins the mechanism: both shape variants run through one
step_fn, parameters are shared (the frame step moves the clip step's loss),
and the step counter advances once per optimizer step.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.helpers import tiny_detector
from tests.test_loss import synth_batch
from tdrn_tpu.train import Targets, init_train_state, make_optimizer, make_train_step


def test_mixed_frame_and_clip_steps_share_one_program_builder():
    model = tiny_detector(temporal=True)
    opt = make_optimizer(base_lr=1e-2, warmup_steps=1)
    ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=2)
    step = make_train_step(model, opt, clip_mode=True)
    rng = np.random.RandomState(3)

    # Clip batch: T=2, B=2 (correlated frames of the same scenes).
    t, b = 2, 2
    frames = jnp.asarray(rng.rand(t, b, 64, 64, 3).astype(np.float32))
    _, tg = synth_batch(rng, batch=b)
    clip_targets = Targets(
        jnp.broadcast_to(tg.boxes, (t,) + tg.boxes.shape),
        jnp.broadcast_to(tg.labels, (t,) + tg.labels.shape),
        jnp.broadcast_to(tg.valid, (t,) + tg.valid.shape),
    )

    # Frame batch: 4 independent frames as a T=1 clip (train.py --mixed_frames).
    fb = 4
    fimages = jnp.asarray(rng.rand(1, fb, 64, 64, 3).astype(np.float32))
    _, ftg = synth_batch(rng, batch=fb)
    frame_targets = Targets(
        ftg.boxes[None], ftg.labels[None], ftg.valid[None]
    )

    ts, m1 = step(ts, frames, clip_targets)
    loss_clip_1 = float(m1["loss"])
    ts, fm = step(ts, fimages, frame_targets)  # second shape variant, same fn
    assert np.isfinite(float(fm["loss"]))
    assert int(ts.step) == 2  # every optimizer step counts

    # The frame step's update moved the shared parameters: the SAME clip
    # batch gives a different loss afterwards.
    frames2 = frames  # identical inputs
    ts, m2 = step(ts, frames2, clip_targets)
    assert int(ts.step) == 3
    assert abs(float(m2["loss"]) - loss_clip_1) > 1e-6
