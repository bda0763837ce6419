"""Target assignment (matching) for training.

TPU-native re-design of the reference's ``match`` / ``refine_match``
(``layers/box_utils.py``, SURVEY.md §2 #6). The reference loops per image on the
host; here matching is a pure fixed-shape function over *padded* ground truth
(``max_gt`` boxes + validity mask) that is ``vmap``-ed over the batch inside the
jitted train step, so assignment runs on-device with no host round-trip.

Semantics preserved from the reference:
  * bipartite "best prior per GT" force-assignment (loop order = GT order,
    later GTs win ties, overlap forced to 2.0);
  * "best GT per prior" argmax matching with IoU threshold -> background;
  * labels are 0-based object classes; the emitted conf target is shifted by +1
    (0 = background).

``refine_match`` is the same assignment against ARM-refined anchors: pass the
decoded ARM boxes (converted to center form) as ``priors``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tdrn_tpu.ops import boxes as B

Array = jnp.ndarray


class MatchResult(NamedTuple):
    loc_targets: Array  # (P, 4) encoded regression targets
    conf_targets: Array  # (P,) int32; 0 = background, c+1 = object class c
    matched_ious: Array  # (P,) best IoU per prior (2.0 where force-assigned)


def match(
    truths: Array,
    labels: Array,
    valid: Array,
    priors_cxcywh: Array,
    threshold: float = 0.5,
    variances: Tuple[float, float] = (0.1, 0.2),
) -> MatchResult:
    """Assign padded GT boxes to priors for one image.

    truths: (G, 4) xyxy in [0,1], zero-padded rows allowed.
    labels: (G,) int32 0-based class ids (padding rows arbitrary).
    valid:  (G,) bool mask of real GT rows.
    priors_cxcywh: (P, 4).
    """
    g = truths.shape[0]
    p = priors_cxcywh.shape[0]
    overlaps = B.iou(truths, B.point_form(priors_cxcywh))  # (G, P)
    # Invalid GT rows must never win an argmax.
    overlaps = jnp.where(valid[:, None], overlaps, -1.0)

    best_prior_idx = jnp.argmax(overlaps, axis=1)  # (G,)
    best_truth_overlap = jnp.max(overlaps, axis=0)  # (P,)
    best_truth_idx = jnp.argmax(overlaps, axis=0)  # (P,)

    # Force-assign each GT's best prior to that GT. The reference loops over
    # GTs so a later GT overwrites an earlier one sharing the same best prior;
    # the vectorized last-wins equivalent (no scatter, XLA-friendly):
    # for each prior, pick the largest valid GT index that claims it.
    claims = valid[:, None] & (
        best_prior_idx[:, None] == jnp.arange(p)[None, :]
    )  # (G, P)
    gt_rank = jnp.arange(1, g + 1)[:, None]  # 1-based so 0 = "unclaimed"
    last_claim = jnp.max(claims * gt_rank, axis=0)  # (P,) 0 or j+1
    forced = last_claim > 0
    best_truth_idx = jnp.where(forced, last_claim - 1, best_truth_idx)
    best_truth_overlap = jnp.where(forced, 2.0, best_truth_overlap)

    matched = truths[best_truth_idx]  # (P, 4)
    conf = labels[best_truth_idx].astype(jnp.int32) + 1
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    loc = B.encode(matched, priors_cxcywh, variances)
    # Zero out loc targets for background priors (they are masked in the loss
    # anyway, but keeping them finite avoids inf/nan from degenerate padding).
    loc = jnp.where((conf > 0)[:, None], loc, 0.0)
    return MatchResult(loc, conf, best_truth_overlap)


def match_batch(
    truths: Array,
    labels: Array,
    valid: Array,
    priors_cxcywh: Array,
    threshold: float = 0.5,
    variances: Tuple[float, float] = (0.1, 0.2),
) -> MatchResult:
    """vmap of :func:`match` over a leading batch axis of the GT arrays.

    priors may be (P, 4) (shared) or (B, P, 4) (per-image refined anchors,
    the ``refine_match`` case).
    """
    if priors_cxcywh.ndim == 2:
        fn = jax.vmap(lambda t, l, v: match(t, l, v, priors_cxcywh, threshold, variances))
        return fn(truths, labels, valid)
    fn = jax.vmap(lambda t, l, v, pr: match(t, l, v, pr, threshold, variances))
    return fn(truths, labels, valid, priors_cxcywh)
