"""Two-stage (ARM -> ODM) detection post-processing.

TPU-native re-design of the reference's ``Detect`` function
(``layers/functions/detection.py``, SURVEY.md §2 #20, §3.4): softmax confidences,
two-stage box decode (ARM offsets against the priors produce refined anchors; ODM
offsets decode against those refined anchors), ARM negative-anchor filtering
(anchors whose ARM background score exceeds 0.99 are silenced), then per-class
threshold + NMS + top-k. Everything here is pure jnp + the fixed-shape NMS, so the
whole post-processing stage compiles into the same XLA program as the network
forward (BASELINE.json north-star: "prior-box generation, box decode, and
class-aware NMS run on-device").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tdrn_tpu.config import DetectorConfig
from tdrn_tpu.ops import boxes as B
from tdrn_tpu.ops import nms as N

Array = jnp.ndarray


class RawPredictions(NamedTuple):
    """Network outputs for one batch (train-phase forward contract, SURVEY.md L4)."""

    arm_loc: Array  # (B, P, 4)
    arm_conf: Array  # (B, P, 2) objectness logits
    odm_loc: Array  # (B, P, 4)
    odm_conf: Array  # (B, P, C) class logits


def decode_two_stage(preds: RawPredictions, priors: Array, cfg: DetectorConfig):
    """Decode ODM boxes against ARM-refined anchors.

    Returns (boxes (B,P,4) xyxy, class_scores (B,P,C) softmax with ARM-filtered
    anchors zeroed).
    """
    var = cfg.variance
    refined = B.decode(preds.arm_loc, priors, var)  # (B, P, 4) xyxy
    boxes = B.decode(preds.odm_loc, B.center_size(refined), var)
    scores = jax.nn.softmax(preds.odm_conf, axis=-1)
    arm_bg = jax.nn.softmax(preds.arm_conf, axis=-1)[..., 0]
    # ARM negative-anchor filter: silence anchors the ARM is confident are bg.
    scores = jnp.where((arm_bg > cfg.arm_filter_thresh)[..., None], 0.0, scores)
    return boxes, scores


def _prefilter(boxes: Array, scores: Array, cfg: DetectorConfig):
    """Keep the top-M anchors image-wide by max non-background class score
    (cfg.prefilter_anchors). Per-class NMS then sorts (C, M) instead of
    (C, P). Exact vs the unfiltered path whenever < M anchors exceed
    conf_thresh (dropped anchors all score below a kept anchor's max, and at
    most M-1 anchors outrank any kept one in its class)."""
    m = cfg.prefilter_anchors
    if not m or m >= boxes.shape[1]:
        return boxes, scores
    per_anchor = jnp.max(scores[..., 1:], axis=-1)  # (B, P), bg excluded
    idx = _prefilter_select(per_anchor, cfg)  # (B, M)
    take = lambda x: jnp.take_along_axis(x, idx[..., None], axis=1)
    return take(boxes), take(scores)


def _prefilter_select(per_anchor: Array, cfg: DetectorConfig) -> Array:
    """Indices of the prefilter's top-M anchors. recall < 1.0 uses the
    genuinely approximate lax.approx_max_k reduction (see
    config.prefilter_recall); otherwise the exact selection."""
    m = cfg.prefilter_anchors
    if cfg.prefilter_recall < 1.0:
        _, idx = jax.lax.approx_max_k(
            per_anchor, m, recall_target=cfg.prefilter_recall
        )
        return idx
    _, idx = N._top_k(per_anchor, m, cfg.approx_topk)
    return idx


def detect(preds: RawPredictions, priors: Array, cfg: DetectorConfig) -> Array:
    """Full reference-style Detect: (B, C, top_k, 5) rows [score, x1, y1, x2, y2]."""
    if cfg.fused_cascade:
        from tdrn_tpu.ops.cascade_pallas import fused_refine_cascade

        # Mosaic kernels compile only for TPU; every other backend (cpu test
        # mesh, hypothetical gpu) runs interpret mode (ADVICE round 2).
        boxes, scores_cm = fused_refine_cascade(
            preds, priors, cfg, interpret=jax.default_backend() != "tpu"
        )
        if cfg.prefilter_anchors and cfg.prefilter_anchors < boxes.shape[1]:
            # Class-major variant: max over class rows (bg row pre-zeroed by
            # the kernel), gather anchors on the last axis — no transpose.
            per_anchor = jnp.max(scores_cm, axis=1)  # (B, P)
            idx = _prefilter_select(per_anchor, cfg)
            boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
            scores_cm = jnp.take_along_axis(
                scores_cm, idx[:, None, :], axis=2
            )
        fn = lambda b, s: N.class_aware_nms_cm(
            b, s, cfg.nms_thresh, cfg.top_k, cfg.conf_thresh, cfg.approx_topk
        )
        return jax.vmap(fn)(boxes, scores_cm)
    boxes, scores = decode_two_stage(preds, priors, cfg)
    boxes, scores = _prefilter(boxes, scores, cfg)
    fn = lambda b, s: N.class_aware_nms(
        b, s, cfg.nms_thresh, cfg.top_k, cfg.conf_thresh, cfg.approx_topk
    )
    return jax.vmap(fn)(boxes, scores)


def prefilter_overflow(
    preds: RawPredictions, priors: Array, cfg: DetectorConfig
) -> Array:
    """(B,) bool dense-field safety flag: True where >= cfg.prefilter_anchors
    anchors clear conf_thresh — the prefilter's exactness-under-sparsity
    precondition failed for that frame (VERDICT round-2 item 6). Reuses the
    decode/softmax subgraph of the main path (folded by XLA CSE inside the
    same jitted program), so the check costs one compare + reduce."""
    _, scores = decode_two_stage(preds, priors, cfg)
    per_anchor = jnp.max(scores[..., 1:], axis=-1)  # (B, P)
    return jnp.sum(per_anchor > cfg.conf_thresh, axis=-1) >= cfg.prefilter_anchors


def detect_topk(
    preds: RawPredictions, priors: Array, cfg: DetectorConfig, top_k: Optional[int] = None
) -> N.TopDetections:
    """Public per-frame detect API: overall top-k (boxes, scores, classes) per image.

    When the prefilter fast path is active (cfg.prefilter_anchors > 0) the
    result additionally carries ``prefilter_overflow`` — the per-frame
    exactness flag (see :func:`prefilter_overflow`)."""
    k = top_k or cfg.top_k
    det = detect(preds, priors, cfg)  # (B, C, K, 5)
    out = jax.vmap(lambda d: N.flatten_detections(d, k, cfg.approx_topk))(det)
    if cfg.prefilter_anchors and cfg.prefilter_anchors < preds.arm_loc.shape[1]:
        out = out._replace(
            prefilter_overflow=prefilter_overflow(preds, priors, cfg)
        )
    return out
