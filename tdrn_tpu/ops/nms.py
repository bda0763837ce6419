"""Fixed-shape, on-device non-maximum suppression.

TPU-native re-design of the reference's ``nms`` (``layers/box_utils.py``) and the
per-class loop in ``Detect`` (``layers/functions/detection.py``, SURVEY.md §2 #6,
#20). The reference's NMS is a dynamic-shape host-side loop (sort scores, pop the
best, drop overlaps, repeat). That shape-dynamic pattern cannot compile to one XLA
program, so we reformulate it:

  1. ``lax.top_k`` selects the K highest-scoring candidates (K = ``top_k``,
     static) — everything below rank K could never be kept by greedy NMS with
     keep-budget K, so this is exact, not an approximation.
  2. A K×K IoU matrix is computed once (VPU-friendly batched geometry).
  3. A K-step ``fori_loop`` walks candidates in score order and masks out any
     lower-ranked candidate with IoU > threshold w.r.t. a surviving candidate —
     exactly the reference's greedy suppression (keep when IoU <= thresh).

The result has static shape (K,) / (K, 4) with zero padding, so it vmaps over
classes and batch and stays resident on device. A Pallas kernel with the same
contract lives in ``nms_pallas.py``; this module is the reference implementation
and the fallback path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tdrn_tpu.ops import boxes as B

Array = jnp.ndarray


class NMSResult(NamedTuple):
    scores: Array  # (K,) kept scores, 0 where suppressed/padded
    boxes: Array  # (K, 4) kept boxes (xyxy), 0 where suppressed/padded
    keep: Array  # (K,) bool keep mask over the top-K candidates


def nms_fixed(
    boxes: Array,
    scores: Array,
    iou_thresh: float = 0.45,
    top_k: int = 200,
    score_thresh: float = 0.0,
) -> NMSResult:
    """Greedy NMS over (P, 4) boxes / (P,) scores with static output shape (K,)."""
    if score_thresh > 0.0:
        scores = jnp.where(scores >= score_thresh, scores, 0.0)
    k = min(top_k, scores.shape[0])
    vals, idx = jax.lax.top_k(scores, k)  # sorted descending
    cand = boxes[idx]  # (K, 4)
    ious = B.iou(cand, cand)  # (K, K)
    ranks = jnp.arange(k)

    def body(i, keep):
        alive = keep[i]
        suppress = alive & (ious[i] > iou_thresh) & (ranks > i)
        return keep & ~suppress

    # unroll=16: the per-iteration work is a tiny vector op, so loop overhead
    # dominates; measured ~10% faster at batch 8 on v5e (BENCH.md).
    keep = jax.lax.fori_loop(0, k, body, vals > 0.0, unroll=16)
    out_scores = jnp.where(keep, vals, 0.0)
    out_boxes = jnp.where(keep[:, None], cand, 0.0)
    if k < top_k:  # pad to the static contract
        pad = top_k - k
        out_scores = jnp.pad(out_scores, (0, pad))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        keep = jnp.pad(keep, (0, pad))
    return NMSResult(out_scores, out_boxes, keep)


def class_aware_nms(
    boxes: Array,
    class_scores: Array,
    iou_thresh: float = 0.45,
    top_k: int = 200,
    score_thresh: float = 0.01,
) -> Array:
    """Per-class NMS matching the reference ``Detect`` output contract.

    boxes: (P, 4) decoded boxes shared across classes.
    class_scores: (P, C) softmax scores (class 0 = background, skipped by
        zeroing — its output row stays empty like the reference's).
    Returns (C, K, 5) rows of [score, x1, y1, x2, y2], zero-padded.
    """
    num_classes = class_scores.shape[1]
    # Zero the background column so its NMS output is empty.
    cls_mask = (jnp.arange(num_classes) > 0)[None, :]
    scores = jnp.where(cls_mask, class_scores, 0.0)

    def per_class(s):
        r = nms_fixed(boxes, s, iou_thresh, top_k, score_thresh)
        return jnp.concatenate([r.scores[:, None], r.boxes], axis=-1)

    return jax.vmap(per_class, in_axes=1)(scores)  # (C, K, 5)


class TopDetections(NamedTuple):
    boxes: Array  # (K, 4)
    scores: Array  # (K,)
    classes: Array  # (K,) int32; 0 where padded


def flatten_detections(det: Array, top_k: int = 200) -> TopDetections:
    """(C, K, 5) per-class detections -> overall top-K (boxes, scores, classes).

    This is the public per-frame detect API shape required by BASELINE.json
    ("per-frame boxes/scores/classes").
    """
    c, k, _ = det.shape
    scores = det[..., 0].reshape(-1)  # (C*K,)
    boxes = det[..., 1:].reshape(-1, 4)
    classes = jnp.repeat(jnp.arange(c, dtype=jnp.int32), k)
    vals, idx = jax.lax.top_k(scores, top_k)
    return TopDetections(boxes[idx], vals, jnp.where(vals > 0, classes[idx], 0))
