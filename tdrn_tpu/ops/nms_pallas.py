"""Pallas TPU kernel for greedy NMS suppression.

The class-aware NMS (ops/nms.py) splits into two stages:
  1. top-K candidate selection per class — ``lax.top_k`` (XLA's native sort is
     already optimal for this);
  2. the O(K^2) greedy suppression sweep — a K-step sequential loop of small
     vector ops. As plain XLA this compiles to K tiny fused loops with
     per-iteration dispatch overhead; as a Pallas kernel the whole sweep runs
     in VMEM per (image*class) grid cell: one (K, K) IoU matrix build (VPU)
     followed by a K-step VMEM-resident fori_loop.

Layout: box coordinates arrive as four separate (N, K) planes so the lane
dimension (K, padded to a multiple of 128) is hardware-aligned — a (K, 4)
layout would waste 124/128 lanes of every tile.

Contract matches ``nms.nms_fixed`` exactly: candidates arrive score-sorted
descending; a candidate is suppressed when IoU > thresh with a higher-ranked
surviving candidate (reference greedy ``nms`` keep-when-<= semantics,
SURVEY.md §2 #6). On non-TPU backends the kernel runs in interpreter mode
(tests), so the same code path is exercised everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _suppress_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, out_ref, *, k, iou_thresh):
    """One grid cell = one (image, class) row of K sorted candidates.

    The sequential sweep is expressed without any dynamic indexing (Mosaic's
    lane dimension only allows 128-aligned dynamic slices): iteration i
    selects its suppression row with a one-hot matvec on the MXU and its
    alive-bit with a masked reduction — all shapes static.
    """
    x1, y1 = x1_ref[0, 0, :], y1_ref[0, 0, :]
    x2, y2 = x2_ref[0, 0, :], y2_ref[0, 0, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    # Pairwise IoU (K, K) on the VPU.
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)

    rank_r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)  # row rank
    rank_c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)  # col rank
    sup = jnp.where((iou > iou_thresh) & (rank_c > rank_r), 1.0, 0.0)  # (K, K)

    scores = scores_ref[0, 0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # (1, K)

    def body(i, keep):  # keep: (1, K) in {0, 1}
        e = (lane == i).astype(jnp.float32)  # one-hot row selector
        alive = jnp.sum(keep * e)  # scalar: is candidate i still alive?
        row = jnp.dot(e, sup, preferred_element_type=jnp.float32)  # (1, K)
        return keep * (1.0 - alive * row)

    keep0 = jnp.where(scores > 0.0, 1.0, 0.0)[None, :]
    keep = jax.lax.fori_loop(0, k, body, keep0)
    out_ref[0, 0, :] = scores * keep[0]


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def suppress_sorted(
    boxes: Array, scores: Array, iou_thresh: float = 0.45, interpret: bool = False
) -> Array:
    """Greedy-suppress score-sorted candidates.

    boxes: (N, K, 4) xyxy candidates, sorted by descending score per row.
    scores: (N, K) with 0 marking empty slots.
    Returns (N, K) scores with suppressed entries zeroed.
    """
    n, k, _ = boxes.shape
    kp = _round_up(k, 128)
    if kp != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, kp - k), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, kp - k)))
    # (N, 1, Kp) layout: the unit middle dim lets the (1, 1, Kp) block match
    # the array's trailing dims exactly (Mosaic requires (8,128)-divisible or
    # dim-equal blocks); Kp is lane-aligned.
    planes = [boxes[:, None, :, i] for i in range(4)]
    scores3 = scores[:, None, :]

    kernel = functools.partial(_suppress_kernel, k=kp, iou_thresh=float(iou_thresh))
    row_spec = pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[row_spec] * 5,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1, kp), scores.dtype),
        interpret=interpret,
    )(*planes, scores3)
    return out[:, 0, :k]


def nms_fixed_pallas(
    boxes: Array,
    scores: Array,
    iou_thresh: float = 0.45,
    top_k: int = 200,
    score_thresh: float = 0.0,
    interpret: bool = False,
):
    """Drop-in for ``nms.nms_fixed`` using the Pallas suppression kernel."""
    from tdrn_tpu.ops.nms import NMSResult

    if score_thresh > 0.0:
        scores = jnp.where(scores >= score_thresh, scores, 0.0)
    k = min(top_k, scores.shape[-1])
    vals, idx = jax.lax.top_k(scores, k)
    cand = boxes[idx]
    kept = suppress_sorted(cand[None], vals[None], iou_thresh=iou_thresh, interpret=interpret)[0]
    keep = kept > 0.0
    out_boxes = jnp.where(keep[:, None], cand, 0.0)
    if k < top_k:
        kept = jnp.pad(kept, (0, top_k - k))
        out_boxes = jnp.pad(out_boxes, ((0, top_k - k), (0, 0)))
        keep = jnp.pad(keep, (0, top_k - k))
    return NMSResult(kept, out_boxes, keep)


def class_aware_nms_pallas(
    boxes: Array,
    class_scores: Array,
    iou_thresh: float = 0.45,
    top_k: int = 200,
    score_thresh: float = 0.01,
    interpret: bool = False,
) -> Array:
    """Pallas-backed drop-in for ``nms.class_aware_nms``: (C, K, 5) output.

    boxes: (P, 4), class_scores: (P, C) softmax. One kernel launch covers all
    classes (grid = C).
    """
    num_classes = class_scores.shape[1]
    cls_mask = (jnp.arange(num_classes) > 0)[None, :]
    scores = jnp.where(cls_mask & (class_scores >= score_thresh), class_scores, 0.0)

    k = min(top_k, scores.shape[0])
    vals, idx = jax.lax.top_k(scores.T, k)  # (C, K)
    cand = boxes[idx]  # (C, K, 4)
    kept = suppress_sorted(cand, vals, iou_thresh=iou_thresh, interpret=interpret)  # (C, K)
    out_boxes = jnp.where((kept > 0)[..., None], cand, 0.0)
    out = jnp.concatenate([kept[..., None], out_boxes], axis=-1)  # (C, K, 5)
    if k < top_k:
        out = jnp.pad(out, ((0, 0), (0, top_k - k), (0, 0)))
    return out
