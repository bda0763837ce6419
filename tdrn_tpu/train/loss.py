"""Dual-refinement multibox loss.

TPU-native re-design of the reference's ``MultiBoxLoss`` /
``RefineMultiBoxLoss`` (SURVEY.md §2 #18, #19):

  * ARM branch: binary objectness targets from matching GT to the static
    priors; SmoothL1 on positives; cross-entropy with 3:1 sort-based
    hard-negative mining.
  * ODM branch: anchors are first refined by the (gradient-stopped) ARM
    regression, GT is re-matched against the refined anchors
    (``refine_match`` semantics), and anchors whose ARM background score
    exceeds ``arm_filter_thresh`` are excluded from the ODM loss entirely
    (negative-anchor filtering).

Unlike the reference's per-image host loops, matching and mining are pure
fixed-shape ops ``vmap``-ed over the batch, so the whole loss lives inside the
jitted train step. Losses are normalized by the total positive count across
the batch, like the reference.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tdrn_tpu.config import DetectorConfig
from tdrn_tpu.ops import boxes as B
from tdrn_tpu.ops.detection import RawPredictions
from tdrn_tpu.ops.matching import match_batch

Array = jnp.ndarray


class Targets(NamedTuple):
    """Padded per-image ground truth (static shapes for jit)."""

    boxes: Array  # (B, G, 4) xyxy in [0, 1]
    labels: Array  # (B, G) int32 0-based class ids
    valid: Array  # (B, G) bool


def smooth_l1(x: Array) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _cross_entropy(logits: Array, labels: Array) -> Array:
    """Per-element CE; logits (..., C), labels (...) int."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - gold


def _mine_negatives(
    ce_bg: Array, pos: Array, eligible: Array, neg_pos_ratio: float
) -> Array:
    """Sort-based hard-negative mining per image (vmapped).

    ce_bg: (B, P) background-CE ranking metric.
    pos: (B, P) positive mask. eligible: (B, P) anchors allowed as negatives.
    Returns (B, P) negative mask with ~ratio*num_pos entries per image.
    """
    p = ce_bg.shape[-1]
    num_pos = jnp.sum(pos, axis=-1)  # (B,)
    num_neg = jnp.clip(neg_pos_ratio * num_pos, 0, p - 1)  # (B,)
    candidate = eligible & ~pos
    metric = jnp.where(candidate, ce_bg, -jnp.inf)
    # rank of each anchor in descending metric order
    order = jnp.argsort(-metric, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return candidate & (ranks < num_neg[..., None])


def multibox_loss(
    loc_pred: Array,
    conf_pred: Array,
    priors: Array,
    targets: Targets,
    cfg: DetectorConfig,
    neg_pos_ratio: float = 3.0,
    overlap_thresh: float = 0.5,
) -> Tuple[Array, Dict[str, Array]]:
    """Single-stage MultiBox loss (reference ``MultiBoxLoss``, SURVEY.md §2 #18)
    for the plain SSD model: match -> SmoothL1 on positives + CE with 3:1
    sort-based hard-negative mining, normalized by the batch positive count."""
    m = match_batch(targets.boxes, targets.labels, targets.valid, priors,
                    overlap_thresh, cfg.variance)
    pos = m.conf_targets > 0
    n = jnp.maximum(jnp.sum(pos), 1).astype(jnp.float32)
    loc_l = jnp.sum(jnp.where(pos[..., None], smooth_l1(loc_pred - m.loc_targets), 0.0))
    ce = _cross_entropy(conf_pred, m.conf_targets)
    bg_ce = _cross_entropy(conf_pred, jnp.zeros_like(m.conf_targets))
    neg = _mine_negatives(bg_ce, pos, jnp.ones_like(pos), neg_pos_ratio)
    conf_l = jnp.sum(jnp.where(pos | neg, ce, 0.0))
    metrics = {"loc": loc_l / n, "conf": conf_l / n, "num_pos": n}
    return metrics["loc"] + metrics["conf"], metrics


def refine_multibox_loss(
    preds: RawPredictions,
    priors: Array,
    targets: Targets,
    cfg: DetectorConfig,
    neg_pos_ratio: float = 3.0,
    overlap_thresh: float = 0.5,
) -> Tuple[Array, Dict[str, Array]]:
    """Returns (total_loss, metrics dict with arm/odm loc & conf parts)."""
    var = cfg.variance

    # ---------------- ARM: binary objectness against static priors ----------
    arm_m = match_batch(
        targets.boxes,
        jnp.zeros_like(targets.labels),  # all objects -> class 1 (binary)
        targets.valid,
        priors,
        overlap_thresh,
        var,
    )
    arm_pos = arm_m.conf_targets > 0  # (B, P)
    n_arm = jnp.maximum(jnp.sum(arm_pos), 1).astype(jnp.float32)

    arm_loc_l = jnp.sum(
        jnp.where(
            arm_pos[..., None], smooth_l1(preds.arm_loc - arm_m.loc_targets), 0.0
        )
    )
    arm_ce = _cross_entropy(preds.arm_conf, arm_pos.astype(jnp.int32))
    arm_bg_ce = _cross_entropy(preds.arm_conf, jnp.zeros_like(arm_m.conf_targets))
    arm_neg = _mine_negatives(
        arm_bg_ce, arm_pos, jnp.ones_like(arm_pos), neg_pos_ratio
    )
    arm_conf_l = jnp.sum(jnp.where(arm_pos | arm_neg, arm_ce, 0.0))

    # ---------------- ODM: classes against ARM-refined anchors --------------
    refined = B.decode(jax.lax.stop_gradient(preds.arm_loc), priors, var)  # (B,P,4)
    refined_cs = B.center_size(refined)
    odm_m = match_batch(
        targets.boxes, targets.labels, targets.valid, refined_cs, overlap_thresh, var
    )
    odm_pos = odm_m.conf_targets > 0
    # Negative-anchor filtering: ARM-confident background anchors are excluded.
    arm_bg = jax.nn.softmax(jax.lax.stop_gradient(preds.arm_conf), axis=-1)[..., 0]
    keep = arm_bg <= cfg.arm_filter_thresh
    odm_pos = odm_pos & keep
    n_odm = jnp.maximum(jnp.sum(odm_pos), 1).astype(jnp.float32)

    odm_loc_l = jnp.sum(
        jnp.where(
            odm_pos[..., None], smooth_l1(preds.odm_loc - odm_m.loc_targets), 0.0
        )
    )
    odm_ce = _cross_entropy(preds.odm_conf, odm_m.conf_targets)
    odm_bg_ce = _cross_entropy(preds.odm_conf, jnp.zeros_like(odm_m.conf_targets))
    odm_neg = _mine_negatives(odm_bg_ce, odm_pos, keep, neg_pos_ratio)
    odm_conf_l = jnp.sum(jnp.where(odm_pos | odm_neg, odm_ce, 0.0))

    metrics = {
        "arm_loc": arm_loc_l / n_arm,
        "arm_conf": arm_conf_l / n_arm,
        "odm_loc": odm_loc_l / n_odm,
        "odm_conf": odm_conf_l / n_odm,
        "num_pos_arm": n_arm,
        "num_pos_odm": n_odm,
    }
    total = metrics["arm_loc"] + metrics["arm_conf"] + metrics["odm_loc"] + metrics["odm_conf"]
    return total, metrics
