"""Image-wide anchor prefilter (cfg.prefilter_anchors, ops/detection.py).

Exactness property: when fewer than M anchors clear conf_thresh, prefiltered
detect() output is IDENTICAL to the exact path (every above-threshold anchor
survives the top-M cut; below-threshold anchors are zeroed by the NMS either
way). Also a smoke that dense (pathological) score fields stay well-formed.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from tdrn_tpu.config import TINY_64
from tdrn_tpu.ops.detection import RawPredictions, detect
from tdrn_tpu.ops.priors import prior_boxes


def _sparse_preds(rng, b, p, c, hot=40):
    """odm_conf logits such that only `hot` anchors clear conf_thresh."""
    arm_loc = rng.normal(size=(b, p, 4)).astype("f4") * 0.3
    arm_conf = np.zeros((b, p, 2), "f4")
    arm_conf[..., 1] = 5.0  # ARM says "object" everywhere (no ARM filtering)
    odm_loc = rng.normal(size=(b, p, 4)).astype("f4") * 0.3
    # background-dominant logits -> class scores ~ 3e-5, below conf_thresh 0.01
    odm_conf = np.zeros((b, p, c), "f4")
    odm_conf[..., 0] = 10.0
    for bi in range(b):
        idx = rng.choice(p, size=hot, replace=False)
        for i in idx:
            odm_conf[bi, i, int(rng.integers(1, c))] = 12.0
    return RawPredictions(
        jnp.asarray(arm_loc), jnp.asarray(arm_conf),
        jnp.asarray(odm_loc), jnp.asarray(odm_conf),
    )


def test_prefilter_exact_when_sparse():
    priors = prior_boxes(TINY_64)
    p = priors.shape[0]
    preds = _sparse_preds(np.random.default_rng(0), 2, p, TINY_64.num_classes)
    exact = detect(preds, priors, TINY_64)
    m = 128
    fast = detect(
        preds, priors, dataclasses.replace(TINY_64, prefilter_anchors=m)
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(exact))


def test_prefilter_exact_when_sparse_fused_cascade():
    """Class-major prefilter (fused-cascade path) matches the exact path."""
    priors = prior_boxes(TINY_64)
    p = priors.shape[0]
    preds = _sparse_preds(np.random.default_rng(2), 2, p, TINY_64.num_classes)
    exact = detect(preds, priors, TINY_64)
    fast = detect(
        preds, priors,
        dataclasses.replace(TINY_64, prefilter_anchors=128, fused_cascade=True),
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(exact), atol=1e-5, rtol=1e-4
    )


def test_prefilter_overflow_flag():
    """Dense-field safety (VERDICT round-2 item 6): detect_topk flags frames
    where >= M anchors clear conf_thresh (exactness precondition failed),
    stays False on sparse frames, and is absent on the exact path."""
    from tdrn_tpu.ops.detection import detect_topk

    priors = prior_boxes(TINY_64)
    p = priors.shape[0]
    m = 128
    cfg = dataclasses.replace(TINY_64, prefilter_anchors=m)

    sparse = _sparse_preds(np.random.default_rng(3), 1, p, TINY_64.num_classes)
    out = detect_topk(sparse, priors, cfg)
    assert out.prefilter_overflow is not None
    assert not bool(np.asarray(out.prefilter_overflow)[0])

    # Dense: EVERY anchor confidently some foreground class.
    odm_conf = np.zeros((1, p, TINY_64.num_classes), "f4")
    odm_conf[..., 1] = 8.0
    dense = RawPredictions(
        sparse.arm_loc, sparse.arm_conf, sparse.odm_loc, jnp.asarray(odm_conf)
    )
    out_d = detect_topk(dense, priors, cfg)
    assert bool(np.asarray(out_d.prefilter_overflow)[0])

    exact = detect_topk(sparse, priors, TINY_64)
    assert exact.prefilter_overflow is None


def test_prefilter_dense_well_formed():
    priors = prior_boxes(TINY_64)
    p = priors.shape[0]
    rng = np.random.default_rng(1)
    preds = RawPredictions(
        jnp.asarray(rng.normal(size=(1, p, 4)).astype("f4") * 0.3),
        jnp.asarray(rng.normal(size=(1, p, 2)).astype("f4")),
        jnp.asarray(rng.normal(size=(1, p, 4)).astype("f4") * 0.3),
        jnp.asarray(rng.normal(size=(1, p, TINY_64.num_classes)).astype("f4") * 3),
    )
    out = detect(
        preds, priors, dataclasses.replace(TINY_64, prefilter_anchors=64)
    )
    out = np.asarray(out)
    assert out.shape == (1, TINY_64.num_classes, TINY_64.top_k, 5)
    assert np.isfinite(out).all()
    assert (out[..., 0] >= 0).all() and (out[..., 0] <= 1).all()
    # background row empty
    assert (out[:, 0] == 0).all()


def test_prefilter_recall_knob():
    """config.prefilter_recall: 1.0 is bit-identical to the default exact
    selection; < 1.0 compiles the approximate lax.approx_max_k path and
    yields well-formed detections (its recall/mAP is gated on-device via
    the fidelity harnesses, not here — the CPU lowering may fall back to
    an exact sort)."""
    priors = prior_boxes(TINY_64)
    p = priors.shape[0]
    rng = np.random.default_rng(7)
    preds = RawPredictions(
        jnp.asarray(rng.normal(size=(2, p, 4)).astype("f4") * 0.3),
        jnp.asarray(rng.normal(size=(2, p, 2)).astype("f4")),
        jnp.asarray(rng.normal(size=(2, p, 4)).astype("f4") * 0.3),
        jnp.asarray(rng.normal(size=(2, p, TINY_64.num_classes)).astype("f4") * 3),
    )
    base = dataclasses.replace(TINY_64, prefilter_anchors=64)
    exact = np.asarray(detect(preds, priors, base))
    same = np.asarray(
        detect(preds, priors, dataclasses.replace(base, prefilter_recall=1.0))
    )
    np.testing.assert_array_equal(exact, same)

    approx = np.asarray(
        detect(preds, priors, dataclasses.replace(base, prefilter_recall=0.9))
    )
    assert approx.shape == exact.shape
    assert np.isfinite(approx).all()
    assert (approx[:, 0] == 0).all()  # background row stays empty
