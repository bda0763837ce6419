"""Golden test: the on-device two-stage Detect (decode -> ARM filter ->
per-class threshold + NMS -> top-k) must match an independent numpy
composition of the reference semantics (SURVEY.md §2 #20, §3.4)."""

import numpy as np
import jax.numpy as jnp

import oracle
from tdrn_tpu.config import TINY_64
from tdrn_tpu.ops import detection as D
from tdrn_tpu.ops.priors import prior_boxes_np


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def numpy_detect(arm_loc, arm_conf, odm_loc, odm_conf, priors, cfg):
    """Dynamic-shape reference composition for one image."""
    refined = oracle.decode(arm_loc, priors, cfg.variance)
    boxes = oracle.decode(odm_loc, oracle.center_size(refined), cfg.variance)
    scores = _softmax(odm_conf)
    arm_bg = _softmax(arm_conf)[:, 0]
    scores[arm_bg > cfg.arm_filter_thresh] = 0.0
    out = {}
    for c in range(1, cfg.num_classes):
        s = scores[:, c].copy()
        s[s < cfg.conf_thresh] = 0.0
        keep = oracle.greedy_nms(boxes, s, cfg.nms_thresh, cfg.top_k)
        out[c] = (boxes[keep], s[keep])
    return out


def test_detect_matches_numpy_reference():
    cfg = TINY_64
    rng = np.random.RandomState(0)
    p = cfg.num_priors
    arm_loc = (rng.randn(1, p, 4) * 0.5).astype(np.float32)
    arm_conf = (rng.randn(1, p, 2) * 2).astype(np.float32)
    odm_loc = (rng.randn(1, p, 4) * 0.5).astype(np.float32)
    odm_conf = (rng.randn(1, p, cfg.num_classes) * 2).astype(np.float32)
    priors = prior_boxes_np(cfg)

    preds = D.RawPredictions(
        jnp.asarray(arm_loc), jnp.asarray(arm_conf),
        jnp.asarray(odm_loc), jnp.asarray(odm_conf),
    )
    det = np.asarray(D.detect(preds, jnp.asarray(priors), cfg))[0]  # (C, K, 5)

    want = numpy_detect(arm_loc[0], arm_conf[0], odm_loc[0], odm_conf[0], priors, cfg)
    for c in range(1, cfg.num_classes):
        got_scores = det[c, :, 0]
        got_boxes = det[c, :, 1:]
        live = got_scores > 0
        wb, ws = want[c]
        assert live.sum() == len(ws), f"class {c}: {live.sum()} vs {len(ws)}"
        order = np.argsort(-ws, kind="stable")
        np.testing.assert_allclose(got_scores[live], ws[order], atol=1e-5)
        np.testing.assert_allclose(got_boxes[live], wb[order], atol=1e-4)


def test_arm_filter_silences_anchors():
    cfg = TINY_64
    rng = np.random.RandomState(1)
    p = cfg.num_priors
    # ARM extremely confident background everywhere -> zero detections.
    arm_conf = np.zeros((1, p, 2), np.float32)
    arm_conf[..., 0] = 20.0
    preds = D.RawPredictions(
        jnp.zeros((1, p, 4)), jnp.asarray(arm_conf),
        jnp.zeros((1, p, 4)),
        jnp.asarray(rng.randn(1, p, cfg.num_classes).astype(np.float32) * 3),
    )
    det = np.asarray(D.detect(preds, jnp.asarray(prior_boxes_np(cfg)), cfg))
    assert (det[..., 0] == 0).all()
