"""Spatial (H-axis) partitioning of the single-frame forward
(tdrn_tpu/parallel/spatial.py): GSPMD-sharded == single-device, exactly the
same program the user wrote — XLA inserts the conv halo exchanges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models import build_detector
from tdrn_tpu.parallel.spatial import make_spatial_mesh, spatial_forward


@pytest.mark.parametrize("temporal", [False, True])
def test_spatial_forward_matches_single_device(temporal):
    model = build_detector(TINY_64, temporal=temporal, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 30)
    state = model.zero_state(2) if temporal else None
    params = jax.jit(model.init)(jax.random.PRNGKey(9), x, state)

    ref_preds, ref_state = jax.jit(model.apply)(params, x, state)

    mesh = make_spatial_mesh(jax.devices()[:4])  # 64 rows / 4 shards
    fwd = spatial_forward(model, mesh)
    sp_preds, sp_state = fwd(params, x, state)

    for a, b in zip(ref_preds, sp_preds):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
    if temporal:
        for a, b in zip(ref_state, sp_state):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )


def test_spatial_forward_with_detect():
    """Detect composes inside the partitioned program (decode/NMS once,
    post re-gather)."""
    from tdrn_tpu.ops.detection import detect_topk
    from tdrn_tpu.ops.priors import prior_boxes

    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(32)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 30)
    params = jax.jit(model.init)(jax.random.PRNGKey(10), x, None)
    priors = prior_boxes(TINY_64)

    det_fn = lambda preds: detect_topk(preds, priors, TINY_64)
    ref = jax.jit(lambda p, f: det_fn(model.apply(p, f, None)[0]))(params, x)

    mesh = make_spatial_mesh(jax.devices()[:4])
    fwd = spatial_forward(model, mesh, detect_fn=det_fn)
    out, _ = fwd(params, x, None)
    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(out.scores),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ref.boxes), np.asarray(out.boxes),
                               rtol=2e-4, atol=2e-4)
