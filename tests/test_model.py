"""Model forward / jit / temporal-state tests (SURVEY.md §4 shape+jit tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models import build_detector
from tests.helpers import tiny_detector
from tdrn_tpu.ops.detection import detect, detect_topk
from tdrn_tpu.ops.priors import prior_boxes


@pytest.fixture(scope="module")
def tiny_model():
    model = tiny_detector(temporal=True)
    x = jnp.zeros((2, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, model.zero_state(2))
    return model, params


class TestForward:
    def test_shapes(self, tiny_model):
        model, params = tiny_model
        x = jnp.zeros((2, 64, 64, 3))
        preds, state = model.apply(params, x, model.zero_state(2))
        p = TINY_64.num_priors
        assert preds.arm_loc.shape == (2, p, 4)
        assert preds.arm_conf.shape == (2, p, 2)
        assert preds.odm_loc.shape == (2, p, 4)
        assert preds.odm_conf.shape == (2, p, TINY_64.num_classes)
        c = model.tcb_channels
        assert [s.shape for s in state] == [
            (2, 8, 8, c),
            (2, 4, 4, c),
            (2, 2, 2, c),
            (2, 1, 1, c),
        ]

    def test_temporal_state_matters(self, tiny_model):
        """Carried state must condition the next frame's predictions."""
        model, params = tiny_model
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        zero = model.zero_state(1)
        preds0, state1 = model.apply(params, x, zero)
        preds1, _ = model.apply(params, x, state1)
        # same frame, different state -> different ODM predictions
        assert not np.allclose(np.asarray(preds0.odm_conf), np.asarray(preds1.odm_conf))
        # ARM branch is pre-temporal and must be identical
        np.testing.assert_allclose(
            np.asarray(preds0.arm_conf), np.asarray(preds1.arm_conf), atol=1e-6
        )

    def test_non_temporal_variant(self):
        model = tiny_detector(temporal=False)
        x = jnp.zeros((1, 64, 64, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(1), x, None)
        preds, state = model.apply(params, x, None)
        assert state is None
        assert preds.odm_loc.shape == (1, TINY_64.num_priors, 4)


class TestDetect:
    def test_detect_shapes(self, tiny_model):
        model, params = tiny_model
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        preds, _ = model.apply(params, x, model.zero_state(2))
        priors = prior_boxes(TINY_64)
        det = detect(preds, priors, TINY_64)
        assert det.shape == (2, TINY_64.num_classes, TINY_64.top_k, 5)
        top = detect_topk(preds, priors, TINY_64, top_k=50)
        assert top.boxes.shape == (2, 50, 4)
        assert top.scores.shape == (2, 50)
        assert top.classes.shape == (2, 50)

    def test_detect_jits_once(self, tiny_model):
        model, params = tiny_model
        priors = prior_boxes(TINY_64)

        traces = []

        @jax.jit
        def full(params, x, state):
            traces.append(1)
            preds, new_state = model.apply(params, x, state)
            return detect_topk(preds, priors, TINY_64, 20), new_state

        rng = np.random.RandomState(2)
        state = model.zero_state(1)
        for _ in range(3):
            x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
            det, state = full(params, x, state)
        assert len(traces) == 1  # no recompilation across frames


class TestBf16Numerics:
    def test_bf16_detections_close_to_fp32(self):
        """bfloat16 activations must not meaningfully perturb detections
        (fp32 params, bf16 compute — the serving configuration)."""
        from tests.helpers import TCB_TEST_CHANNELS
        from tdrn_tpu.models import build_detector
        from tdrn_tpu.ops.priors import prior_boxes

        m32 = build_detector(TINY_64, temporal=True, tcb_channels=TCB_TEST_CHANNELS,
                             width_mult=0.125, dtype=jnp.float32)
        m16 = build_detector(TINY_64, temporal=True, tcb_channels=TCB_TEST_CHANNELS,
                             width_mult=0.125, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 64, 64, 3))
        params = jax.jit(m32.init)(jax.random.PRNGKey(0), x, m32.zero_state(1))

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 30)
        p32, _ = m32.apply(params, img, m32.zero_state(1))
        p16, _ = m16.apply(params, img.astype(jnp.bfloat16), m16.zero_state(1))

        s32 = np.asarray(jax.nn.softmax(p32.odm_conf, -1))
        s16 = np.asarray(jax.nn.softmax(p16.odm_conf, -1))
        # class scores agree to bf16 tolerance; argmax classes mostly agree
        assert np.abs(s32 - s16).max() < 0.15
        agree = (s32.argmax(-1) == s16.argmax(-1)).mean()
        assert agree > 0.95, agree


@pytest.mark.parametrize("stem", ["poly", "poly2"])
def test_poly_stem_exact(stem):
    """stem="poly" (W-polyphase stage 1, models/vgg.py) must reproduce the
    stem="conv" forward with the SAME parameter tree: entry/exit are pure
    reshapes, the kernel rearrangement covers every tap exactly once, the
    asymmetric W paddings reproduce SAME-conv borders, and phase/row max
    equals pool1. Tolerance-level (conv decomposition reassociates sums)."""
    model = tiny_detector(temporal=True)
    poly = model.clone(stem=stem)
    rng = np.random.RandomState(11)
    frames = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), x0, model.zero_state(2))
    params_poly = poly.init(jax.random.PRNGKey(4), x0, poly.zero_state(2))
    # Identical param trees (poly is a pure serving/training flag).
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_poly
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(params_poly)[0],
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)
    preds_ref, _ = model.apply(params, frames, model.zero_state(2))
    preds_poly, _ = poly.apply(params, frames, poly.zero_state(2))
    for a, b in zip(preds_ref, preds_poly):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, rtol=1e-5)


def test_poly_stem_trains_and_runs_bf16():
    """The poly kernel rearrangement is in-graph and differentiable: a train
    step must produce nonzero conv1_1/conv1_2 grads; and the resident-bf16
    serving transform must compose (kernels cast at load, rearranged per
    step in bf16)."""
    from tdrn_tpu.ops.priors import prior_boxes
    from tdrn_tpu.train import Targets, refine_multibox_loss
    from tdrn_tpu.utils.precision import apply_inference_precision

    model = tiny_detector(temporal=True).clone(stem="poly")
    cfg = model.cfg
    rng = np.random.RandomState(12)
    frames = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(5), x0, model.zero_state(2))
    targets = Targets(
        jnp.asarray(np.tile([[0.2, 0.2, 0.7, 0.7]], (2, 4, 1)).astype(np.float32)),
        jnp.ones((2, 4), jnp.int32),
        jnp.asarray(np.tile([True, False, False, False], (2, 1))),
    )
    priors = prior_boxes(cfg)

    def loss_fn(p):
        preds, _ = model.apply(p, frames, model.zero_state(2))
        loss, _ = refine_multibox_loss(preds, priors, targets, cfg)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g11 = grads["params"]["backbone"]["conv1_1"]["kernel"]
    g12 = grads["params"]["backbone"]["conv1_2"]["kernel"]
    assert float(jnp.abs(g11).max()) > 0
    assert float(jnp.abs(g12).max()) > 0

    m16, p16 = apply_inference_precision(model, params, "bf16")
    preds16, _ = m16.apply(p16, frames, m16.zero_state(2))
    assert preds16.odm_conf.dtype == jnp.float32
    assert np.isfinite(np.asarray(preds16.odm_conf)).all()


def test_hybrid_cell_param_tree_and_forward():
    """cell="hybrid": LightGRUCell on scale 0 (where the ConvGRU FLOPs
    concentrate), full ConvGRUCell on the deeper scales — param tree must
    show light keys at gru0 and convgru keys at gru1+, and the carry must
    still condition the next frame."""
    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.125, temporal_cell="hybrid")
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(3), x, model.zero_state(1))
    t = params["params"]["temporal"]
    assert set(t["gru0"]) == {"gate", "dw", "cand"}   # light cell
    for k in range(1, 4):
        assert set(t[f"gru{k}"]) == {"gates", "cand"}  # full convgru
    rng = np.random.RandomState(4)
    xr = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    preds0, state1 = model.apply(params, xr, model.zero_state(1))
    preds1, _ = model.apply(params, xr, state1)
    assert not np.allclose(np.asarray(preds0.odm_conf),
                           np.asarray(preds1.odm_conf))
