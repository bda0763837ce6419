"""Resident-bf16 inference profile (utils/precision.py).

Round 2 measured that flax dtype=bf16 with fp32-resident params is SLOWER
than fp32 (per-step weight casts); round 3's profile casts the feature-pyramid
weights to bf16 once at load with fp32 ARM/ODM heads (VERDICT round-2 item 1).
These tests pin the contract: which subtrees are cast, fp32 prediction/detect
outputs, bf16 temporal carry, end-to-end StreamingDetector compatibility, and
closeness to the fp32 model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.inference import StreamingDetector
from tdrn_tpu.ops.preprocess import preprocess_batch
from tdrn_tpu.utils.precision import (
    FP32_SUBTREES,
    apply_inference_precision,
    cast_params_bf16,
)
from tests.helpers import tiny_detector


@pytest.fixture(scope="module")
def fp32_model_params():
    model = tiny_detector(temporal=True)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, model.zero_state(2))
    return model, params


def _leaf_dtypes(tree):
    return {leaf.dtype for leaf in jax.tree.leaves(tree)}


def test_cast_selectivity(fp32_model_params):
    _, params = fp32_model_params
    p16 = cast_params_bf16(params)
    for name, subtree in p16["params"].items():
        dts = _leaf_dtypes(subtree)
        if name in FP32_SUBTREES:
            assert dts == {jnp.dtype(jnp.float32)}, (name, dts)
        else:
            assert dts == {jnp.dtype(jnp.bfloat16)}, (name, dts)
    # Original untouched.
    assert _leaf_dtypes(params["params"]) == {jnp.dtype(jnp.float32)}


def test_fp32_precision_is_identity(fp32_model_params):
    model, params = fp32_model_params
    m, p = apply_inference_precision(model, params, "fp32")
    assert m is model and p is params


def test_bf16_outputs_close_and_fp32_typed(fp32_model_params):
    model, params = fp32_model_params
    m16, p16 = apply_inference_precision(model, params, "bf16")
    assert m16.dtype == jnp.bfloat16 and m16.head_dtype == jnp.float32
    frames = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (2, 64, 64, 3), np.uint8)
    )
    x32 = preprocess_batch(frames, TINY_64, model.dtype)
    x16 = preprocess_batch(frames, TINY_64, m16.dtype)
    preds32, st32 = model.apply(params, x32, model.zero_state(2))
    preds16, st16 = m16.apply(p16, x16, m16.zero_state(2))
    # Prediction tensors are fp32 regardless of feature dtype.
    for t in preds16:
        assert t.dtype == jnp.float32
    # Carry is bf16 (half the donated-state HBM traffic).
    assert all(s.dtype == jnp.bfloat16 for s in st16)
    assert all(s.dtype == jnp.float32 for s in st32)
    # bf16 features perturb logits only at the ~1% relative level.
    for t32, t16 in zip(preds32, preds16):
        scale = float(jnp.max(jnp.abs(t32))) + 1e-9
        rel = float(jnp.max(jnp.abs(t32 - t16))) / scale
        assert rel < 0.05, rel


def test_streaming_detector_bf16(fp32_model_params):
    model, params = fp32_model_params
    m16, p16 = apply_inference_precision(model, params, "bf16")
    det = StreamingDetector(m16, p16, num_streams=2)
    frames = np.random.RandomState(2).randint(0, 255, (2, 64, 64, 3), np.uint8)
    out1 = det.detect(frames)
    det.reset([0])
    out2 = det.detect(frames)
    assert out2.boxes.shape == out1.boxes.shape
    assert out1.scores.dtype == jnp.float32
    assert det._state[0].dtype == jnp.bfloat16


def test_fold_mean_exact(fp32_model_params):
    """Mean-fold (utils/precision.apply_fold_mean): raw rgb+ones input with
    the folded conv1_1 kernel reproduces the mean-subtracted path exactly
    (incl. zero-pad borders), for both conv and s2d stems."""
    from tdrn_tpu.utils.precision import apply_fold_mean

    model, params = fp32_model_params
    frames = jnp.asarray(
        np.random.RandomState(4).randint(0, 255, (2, 64, 64, 3), np.uint8)
    )
    for stem in ("conv", "s2d"):
        m = model.clone(stem=stem)
        x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
        p = m.init(jax.random.PRNGKey(1), x0, m.zero_state(2))
        mf, pf = apply_fold_mean(m, p)
        assert mf.fold_mean
        x_ref = preprocess_batch(frames, TINY_64, m.dtype)
        x_fold = preprocess_batch(frames, TINY_64, mf.dtype, fold_mean=True)
        assert x_fold.shape[-1] == 4
        preds_ref, _ = m.apply(p, x_ref, m.zero_state(2))
        preds_fold, _ = mf.apply(pf, x_fold, mf.zero_state(2))
        for a, b in zip(preds_ref, preds_fold):
            scale = float(jnp.max(jnp.abs(a))) + 1e-9
            rel = float(jnp.max(jnp.abs(a - b))) / scale
            assert rel < 1e-5, (stem, rel)


def test_fold_mean_composes_with_bf16(fp32_model_params):
    from tdrn_tpu.utils.precision import apply_fold_mean, apply_inference_precision

    model, params = fp32_model_params
    m, p = apply_fold_mean(model, params)
    m, p = apply_inference_precision(m, p, "bf16")
    frames = np.random.RandomState(5).randint(0, 255, (2, 64, 64, 3), np.uint8)
    x = preprocess_batch(jnp.asarray(frames), TINY_64, m.dtype, fold_mean=True)
    preds, _ = m.apply(p, x, m.zero_state(2))
    assert preds.odm_conf.dtype == jnp.float32
    assert np.isfinite(np.asarray(preds.odm_conf)).all()


def test_bf16_detections_match_fp32_top1(fp32_model_params):
    """The top-scoring detection per stream should agree with fp32 on class
    and overlap heavily on the box (random-init logits are near-uniform, so
    scores sit in a narrow band — exact score equality is not expected)."""
    model, params = fp32_model_params
    m16, p16 = apply_inference_precision(model, params, "bf16")
    frames = np.random.RandomState(3).randint(0, 255, (2, 64, 64, 3), np.uint8)
    d32 = StreamingDetector(model, params, num_streams=2).detect(frames)
    d16 = StreamingDetector(m16, p16, num_streams=2).detect(frames)
    b32, b16 = np.asarray(d32.boxes), np.asarray(d16.boxes)
    for s in range(2):
        iou_num = (
            np.maximum(
                0,
                np.minimum(b32[s, 0, 2:], b16[s, 0, 2:])
                - np.maximum(b32[s, 0, :2], b16[s, 0, :2]),
            ).prod()
        )
        a32 = np.maximum(0, b32[s, 0, 2:] - b32[s, 0, :2]).prod()
        a16 = np.maximum(0, b16[s, 0, 2:] - b16[s, 0, :2]).prod()
        iou = iou_num / (a32 + a16 - iou_num + 1e-9)
        assert iou > 0.5, (s, iou, b32[s, 0], b16[s, 0])


def test_pad_stem_exact(fp32_model_params):
    """Channel-padded stem (utils/precision.apply_pad_stem): zero-padded
    input channels + zero-padded conv1_1 kernel reproduce the 3-channel
    model bitwise (zeros contribute nothing to the conv)."""
    from tdrn_tpu.utils.precision import apply_pad_stem

    model, params = fp32_model_params
    mp, pp = apply_pad_stem(model, params, pad_to=8)
    assert mp.pad_stem == 8
    k = pp["params"]["backbone"]["conv1_1"]["kernel"]
    assert k.shape[2] == 8
    frames = jnp.asarray(
        np.random.RandomState(6).randint(0, 255, (2, 64, 64, 3), np.uint8)
    )
    x = preprocess_batch(frames, TINY_64, model.dtype)
    preds_ref, _ = model.apply(params, x, model.zero_state(2))
    preds_pad, _ = mp.apply(pp, x, mp.zero_state(2))
    for a, b in zip(preds_ref, preds_pad):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
