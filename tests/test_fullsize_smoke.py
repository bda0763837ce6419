"""Full-geometry CPU smoke (VERDICT round-1, weak #3 / next-round #7).

Every other model test runs TINY_64 at width_mult=0.125; shape/dtype bugs
that only exist at the real 320 geometry (6375 priors, 4-scale 40/20/10/5
maps, full-width VGG) would slip through. Two bounded probes, each marked
slow (full-width CPU compiles on this 1-core host):

  * one NON-temporal train step at batch 1 (forward+backward+update at full
    geometry; the temporal scan variant doubles the compile and is covered
    structurally by TINY_64 tests),
  * one TEMPORAL streaming detect at batch 1 (full uint8->detections graph
    incl. ConvGRU state carry, decode, NMS).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import VOC_320
from tdrn_tpu.inference import StreamingDetector
from tdrn_tpu.models import build_detector
from tdrn_tpu.train import Targets, init_train_state, make_optimizer, make_train_step


@pytest.mark.slow
def test_voc320_full_geometry_train_step():
    model = build_detector(VOC_320, temporal=False)
    rng = np.random.RandomState(0)
    b, g = 1, 3
    images = jnp.asarray(rng.randn(b, 320, 320, 3).astype(np.float32))
    boxes = np.tile([[0.1, 0.2, 0.5, 0.6], [0.3, 0.3, 0.9, 0.8], [0.0, 0.0, 0.2, 0.2]],
                    (b, 1, 1)).astype(np.float32)
    labels = np.tile([3, 7, 11], (b, 1)).astype(np.int32)
    targets = Targets(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(np.ones((b, g), bool))
    )
    opt = make_optimizer(base_lr=1e-4, warmup_steps=1)
    ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=b)
    step = make_train_step(model, opt, clip_mode=False)
    ts, metrics = step(ts, images, targets)
    assert np.isfinite(float(metrics["loss"])), metrics
    assert int(ts.step) == 1


@pytest.mark.slow
def test_voc320_full_geometry_streaming_detect():
    model = build_detector(VOC_320, temporal=True)
    rng = np.random.RandomState(1)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 320, 320, 3), jnp.float32),
        model.zero_state(1),
    )
    det = StreamingDetector(model, params, num_streams=1)
    frame = rng.randint(0, 256, (1, 240, 352, 3), dtype=np.uint8)
    out = det.detect(frame)
    boxes, scores, classes = np.asarray(out.boxes), np.asarray(out.scores), np.asarray(out.classes)
    assert boxes.shape == (1, VOC_320.top_k, 4)
    assert np.isfinite(boxes).all() and np.isfinite(scores).all()
    assert (scores <= 1.0 + 1e-6).all() and (scores >= 0.0).all()
    assert (classes >= 0).all() and (classes < VOC_320.num_classes).all()
