"""Anchor-offset -> feature-offset coupling (the DRN "dual" in dual refinement).

TPU-native re-design of the reference's dual-refinement extras (SURVEY.md §2
#15): the ARM's box regression does not just refine the anchors — it also
guides where the ODM *looks*: each cell's feature vector is re-sampled at the
position its refined anchor moved to (a deformable-convolution-style coupling,
specialised to one offset per cell).

Design here: per scale, the predicted ARM center shift (averaged over the
cell's anchors, converted from normalized image units to feature-map cells) is
applied as a bilinear re-sampling of the TCB feature map. Pure gather/lerp jnp
ops — static shapes, vmap over batch, fuses into the surrounding program (no
custom scatter/deform kernels needed on TPU).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def bilinear_shift(feat: Array, dy: Array, dx: Array) -> Array:
    """Re-sample feat at per-cell shifted positions.

    feat: (B, H, W, C); dy, dx: (B, H, W) offsets in cell units.
    Out-of-bounds samples clamp to the border (like zero-gradient padding).
    """
    b, h, w, c = feat.shape
    ys = jnp.arange(h, dtype=feat.dtype)[None, :, None] + dy  # (B, H, W)
    xs = jnp.arange(w, dtype=feat.dtype)[None, None, :] + dx
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    flat = feat.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, h * w)  # (B, H*W)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(b, h, w, c)

    f00 = gather(y0, x0)
    f01 = gather(y0, x1)
    f10 = gather(y1, x0)
    f11 = gather(y1, x1)
    top = f00 + (f01 - f00) * wx
    bot = f10 + (f11 - f10) * wx
    return top + (bot - top) * wy


def arm_guided_offsets(
    arm_loc_scale: Array,
    feature_map: int,
    anchors_per_cell: int,
    variance0: float,
    size_ratio: float,
) -> tuple[Array, Array]:
    """ARM center regression -> per-cell feature offsets (dy, dx) in cell units.

    arm_loc_scale: (B, H*W*A, 4) slice of the ARM loc output for one scale.
    The center shift of anchor a is loc_xy * var0 * prior_wh (normalized image
    units); averaged over the cell's anchors and converted to cell units via
    size_ratio = min_size / step (= prior extent measured in cells; 4 for the
    reference geometry, SURVEY.md §2 #4):
    offset_cells ~= mean(loc_xy) * var0 * size_ratio.
    """
    b = arm_loc_scale.shape[0]
    f, a = feature_map, anchors_per_cell
    loc = arm_loc_scale.reshape(b, f, f, a, 4)
    cell_shift = jnp.mean(loc[..., :2], axis=3) * variance0 * size_ratio  # (B,H,W,2)
    dx, dy = cell_shift[..., 0], cell_shift[..., 1]
    return dy, dx


def apply_arm_guided_sampling(
    feats: List[Array],
    arm_loc: Array,
    cfg,
) -> List[Array]:
    """Shift each TCB scale by its ARM-predicted offsets (gradient flows to ARM)."""
    outs = []
    start = 0
    for k, feat in enumerate(feats):
        f, a = cfg.feature_maps[k], cfg.anchors_per_cell[k]
        n = f * f * a
        ratio = cfg.min_sizes[k] / cfg.steps[k]
        dy, dx = arm_guided_offsets(
            arm_loc[:, start : start + n], f, a, cfg.variance[0], ratio
        )
        outs.append(bilinear_shift(feat, dy.astype(feat.dtype), dx.astype(feat.dtype)))
        start += n
    return outs
