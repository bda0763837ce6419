"""Fixed-shape, on-device non-maximum suppression.

TPU-native re-design of the reference's ``nms`` (``layers/box_utils.py``) and the
per-class loop in ``Detect`` (``layers/functions/detection.py``, SURVEY.md §2 #6,
#20). The reference's NMS is a dynamic-shape host-side loop (sort scores, pop the
best, drop overlaps, repeat). That shape-dynamic pattern cannot compile to one XLA
program, so we reformulate it:

  1. ``lax.top_k`` selects the K highest-scoring candidates (K = ``top_k``,
     static) — everything below rank K could never be kept by greedy NMS with
     keep-budget K, so this is exact, not an approximation. Optionally
     ``lax.approx_max_k`` (the TPU-native partial-reduction top-k) replaces the
     full sort XLA otherwise emits — profiling showed the (C, P) per-class sort
     was ~11% of the whole batch-1 streaming step.
  2. A K×K IoU matrix is computed once (VPU-friendly batched geometry).
  3. Greedy suppression runs as a Jacobi FIXPOINT iteration instead of a
     K-step sequential walk: with S[i, j] = "candidate i (higher score) would
     suppress j", iterate keep <- init & ~(keepᵀ S) until unchanged. Any
     fixpoint of that map equals greedy NMS (induction over score rank), and
     the loop converges in (longest suppression-chain depth + 1) iterations —
     single digits in practice vs K=200 sequential steps. Each iteration is one
     (K,)x(K,K) mat-vec, which the MXU eats. Exactness is proven against the
     sequential oracle in tests/test_geometry.py.

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


def _top_k(scores: Array, k: int, approx: bool):
    """Top-k over the last axis; approx=True uses the TPU-native partial-
    reduction kernel (lax.approx_max_k) instead of the full sort XLA emits
    for lax.top_k. recall_target=1.0 keeps the selection exact while still
    avoiding the sort lowering."""
    if approx and k < scores.shape[-1]:
        return jax.lax.approx_max_k(scores, k, recall_target=1.0)
    return jax.lax.top_k(scores, k)


def _greedy_keep_fixpoint(ious: Array, init: Array, iou_thresh: float) -> Array:
    """Exact greedy-NMS keep mask via Jacobi fixpoint iteration.

    ious: (K, K) IoUs of score-sorted candidates; init: (K,) candidate mask.
    Any fixpoint of ``keep -> init & ~(keep @ S)`` (S = "row suppresses
    column") equals the sequential greedy result (strong induction over score
    rank: the lowest rank has no suppressors; every other entry is determined
    by already-correct higher ranks). Entries whose suppression-chain depth is
    <= n are final after n iterations, so the loop ends at depth+1 changes —
    single digits on real detections vs K sequential steps.
    """
    k = ious.shape[0]
    ranks = jnp.arange(k)
    sup = ((ious > iou_thresh) & (ranks[:, None] < ranks[None, :])).astype(
        jnp.float32
    )

    def cond(carry):
        return carry[1]

    def body(carry):
        keep, _ = carry
        suppressed = (keep.astype(jnp.float32) @ sup) > 0.5
        new = init & ~suppressed
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(cond, body, (init, jnp.asarray(True)))
    return keep


def nms_fixed(
    boxes: Array,
    scores: Array,
    iou_thresh: float = 0.45,
    top_k: int = 200,
    score_thresh: float = 0.0,
    approx_topk: bool = False,
) -> NMSResult:
    """Greedy NMS over (P, 4) boxes / (P,) scores with static output shape (K,)."""
    if score_thresh > 0.0:
        scores = jnp.where(scores >= score_thresh, scores, 0.0)
    k = min(top_k, scores.shape[0])
    vals, idx = _top_k(scores, k, approx_topk)  # sorted descending
    cand = boxes[idx]  # (K, 4)
    ious = B.iou(cand, cand)  # (K, K)
    keep = _greedy_keep_fixpoint(ious, vals > 0.0, iou_thresh)
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
    approx_topk: bool = False,
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
    return class_aware_nms_cm(
        boxes, jnp.swapaxes(scores, 0, 1), iou_thresh, top_k, score_thresh,
        approx_topk,
    )


def class_aware_nms_cm(
    boxes: Array,
    scores_cm: Array,
    iou_thresh: float = 0.45,
    top_k: int = 200,
    score_thresh: float = 0.01,
    approx_topk: bool = False,
) -> Array:
    """`class_aware_nms` for CLASS-MAJOR scores (C, P) — the layout the fused
    ARM->ODM cascade kernel emits (ops/cascade_pallas.py), which is also what
    the per-class top-k consumes, so no transpose materializes in between.
    The background row is expected to be pre-zeroed (the kernel does)."""

    def per_class(s):
        r = nms_fixed(boxes, s, iou_thresh, top_k, score_thresh, approx_topk)
        return jnp.concatenate([r.scores[:, None], r.boxes], axis=-1)

    return jax.vmap(per_class)(scores_cm)  # (C, K, 5)


class TopDetections(NamedTuple):
    boxes: Array  # (K, 4)
    scores: Array  # (K,)
    classes: Array  # (K,) int32; 0 where padded
    # (B,) bool, only set on batched results when cfg.prefilter_anchors > 0:
    # True where >= prefilter_anchors anchors cleared conf_thresh this frame,
    # i.e. the prefilter's exactness-under-sparsity precondition FAILED and
    # this frame's detections may deviate from the exact path (dense-field
    # safety flag, VERDICT round-2 item 6). None on exact paths.
    prefilter_overflow: Array = None


def flatten_detections(
    det: Array, top_k: int = 200, approx_topk: bool = False
) -> TopDetections:
    """(C, K, 5) per-class detections -> overall top-K (boxes, scores, classes).

    This is the public per-frame detect API shape required by BASELINE.json
    ("per-frame boxes/scores/classes").
    """
    c, k, _ = det.shape
    scores = det[..., 0].reshape(-1)  # (C*K,)
    boxes = det[..., 1:].reshape(-1, 4)
    classes = jnp.repeat(jnp.arange(c, dtype=jnp.int32), k)
    vals, idx = _top_k(scores, top_k, approx_topk)
    return TopDetections(boxes[idx], vals, jnp.where(vals > 0, classes[idx], 0))
