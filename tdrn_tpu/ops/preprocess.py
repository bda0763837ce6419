"""In-graph frame preprocessing.

TPU-native re-design of the reference's ``BaseTransform`` (SURVEY.md §2 #8): the
reference resizes + mean-subtracts every frame on the CPU with cv2 and copies the
result to the device each step. Per BASELINE.json, preprocessing here *fuses into
the jitted graph*: frames enter as uint8 HWC tensors (any static source
resolution), and resize / dtype-cast / mean-subtract / transpose all compile into
the same XLA program as the backbone, so a streaming step is one device dispatch
with no host round-trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tdrn_tpu.config import DetectorConfig

Array = jnp.ndarray


def preprocess_frame(
    frame_u8: Array,
    cfg: DetectorConfig,
    dtype: jnp.dtype = jnp.float32,
    fold_mean: bool = False,
) -> Array:
    """uint8 (H, W, 3) RGB frame -> (size, size, 3) mean-subtracted float (NHWC).

    Bilinear resize matches cv2.resize's default interpolation used by the
    reference's BaseTransform.

    fold_mean=True (serving profile, utils/precision.apply_fold_mean): skip
    the mean-subtract HBM pass and emit (size, size, 4) raw pixels + a
    constant ones channel — conv1_1's folded kernel performs the subtraction
    exactly (incl. zero-pad borders).
    """
    x = frame_u8.astype(jnp.float32)
    if frame_u8.shape[0] != cfg.size or frame_u8.shape[1] != cfg.size:
        x = jax.image.resize(x, (cfg.size, cfg.size, 3), method="linear")
    if fold_mean:
        ones = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
        return jnp.concatenate([x, ones], axis=-1).astype(dtype)
    mean = jnp.asarray(cfg.pixel_means, dtype=jnp.float32)
    return ((x - mean)).astype(dtype)


def preprocess_batch(
    frames_u8: Array,
    cfg: DetectorConfig,
    dtype: jnp.dtype = jnp.float32,
    fold_mean: bool = False,
) -> Array:
    """uint8 (B, H, W, 3) -> (B, size, size, 3) (4 channels when fold_mean)."""
    return jax.vmap(lambda f: preprocess_frame(f, cfg, dtype, fold_mean))(frames_u8)


def scale_boxes_to_pixels(boxes01: Array, hw: Tuple[int, int]) -> Array:
    """Normalized xyxy -> pixel xyxy for a (height, width) source frame."""
    h, w = hw
    scale = jnp.asarray([w, h, w, h], dtype=boxes01.dtype)
    return boxes01 * scale
