"""Box geometry primitives.

TPU-native re-design of the reference's ``layers/box_utils.py`` (SURVEY.md §2 #6,
L0 layer). All functions are pure, shape-polymorphic jnp ops that vmap/jit cleanly;
none of them contain data-dependent control flow, so they trace into a single XLA
program and fuse with their consumers.

Conventions:
  * ``xyxy``  — corner form  [x1, y1, x2, y2], normalized to [0, 1].
  * ``cxcywh`` — center form [cx, cy, w, h].
  * The encode/decode transform uses the SSD variances (0.1, 0.2).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def point_form(boxes: Array) -> Array:
    """cxcywh -> xyxy."""
    cxy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)


def center_size(boxes: Array) -> Array:
    """xyxy -> cxcywh."""
    tl, br = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(tl + br) / 2, br - tl], axis=-1)


def intersect(a: Array, b: Array) -> Array:
    """Pairwise intersection area. a: (..., N, 4) xyxy, b: (..., M, 4) -> (..., N, M)."""
    max_xy = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    min_xy = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    return inter[..., 0] * inter[..., 1]


def area(boxes: Array) -> Array:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def iou(a: Array, b: Array, eps: float = 0.0) -> Array:
    """Pairwise IoU (a.k.a. jaccard). a: (..., N, 4), b: (..., M, 4) -> (..., N, M)."""
    inter = intersect(a, b)
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, eps if eps > 0 else 1e-12)


# Reference-compatible alias.
jaccard = iou


def encode(matched: Array, priors: Array, variances=(0.1, 0.2)) -> Array:
    """Encode GT boxes w.r.t. priors.

    matched: (..., P, 4) xyxy ground-truth box matched to each prior.
    priors:  (..., P, 4) cxcywh.
    Returns (..., P, 4) regression targets [dcx, dcy, dw, dh].
    """
    g = center_size(matched)
    g_cxy = (g[..., :2] - priors[..., :2]) / (variances[0] * priors[..., 2:])
    g_wh = jnp.log(jnp.maximum(g[..., 2:] / priors[..., 2:], 1e-12)) / variances[1]
    return jnp.concatenate([g_cxy, g_wh], axis=-1)


def decode(loc: Array, priors: Array, variances=(0.1, 0.2)) -> Array:
    """Decode regression offsets against priors.

    loc:    (..., P, 4) predicted offsets.
    priors: (..., P, 4) cxcywh.
    Returns (..., P, 4) xyxy boxes.
    """
    cxy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    return jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
