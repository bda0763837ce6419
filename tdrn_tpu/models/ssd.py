"""Plain single-stage SSD detector (no refinement cascade).

The ancestor model of the reference lineage (SURVEY.md §0; BASELINE.json
config 1: "SSD320 VGG-16 single-image VOC inference"): multibox heads applied
directly to the backbone feature maps, one-stage decode + NMS. Shares the
backbone, L2Norm, heads, priors, and post-processing machinery with the
dual-refinement TDRN model.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdrn_tpu.config import DetectorConfig
from tdrn_tpu.models.detector import _build_backbone
from tdrn_tpu.models.heads import MultiBoxHead
from tdrn_tpu.models.layers import L2Norm
from tdrn_tpu.ops import boxes as B
from tdrn_tpu.ops import nms as N

Dtype = Any


class SSD(nn.Module):
    """Single-stage multibox detector; forward returns (loc, conf) logits."""

    cfg: DetectorConfig
    backbone: str = "vgg16"
    width_mult: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        sources = _build_backbone(self.backbone, self.dtype, self.width_mult)(x)
        sources[0] = L2Norm(10.0, dtype=self.dtype, name="l2norm0")(sources[0])
        sources[1] = L2Norm(8.0, dtype=self.dtype, name="l2norm1")(sources[1])
        loc, conf = MultiBoxHead(
            cfg.num_classes, cfg.anchors_per_cell, dtype=self.dtype, name="multibox"
        )(sources)
        return loc.astype(jnp.float32), conf.astype(jnp.float32)


def ssd_detect(
    loc: jnp.ndarray, conf: jnp.ndarray, priors: jnp.ndarray, cfg: DetectorConfig
) -> jnp.ndarray:
    """Single-stage Detect: softmax + decode + per-class NMS -> (B, C, K, 5)."""
    boxes = B.decode(loc, priors, cfg.variance)
    scores = jax.nn.softmax(conf, axis=-1)
    fn = lambda b, s: N.class_aware_nms(
        b, s, cfg.nms_thresh, cfg.top_k, cfg.conf_thresh, cfg.approx_topk
    )
    return jax.vmap(fn)(boxes, scores)


def ssd_detect_topk(loc, conf, priors, cfg: DetectorConfig, top_k: Optional[int] = None):
    det = ssd_detect(loc, conf, priors, cfg)
    k = top_k or cfg.top_k
    return jax.vmap(lambda d: N.flatten_detections(d, k, cfg.approx_topk))(det)


def build_ssd(cfg: DetectorConfig, backbone: str = "vgg16", dtype=jnp.float32,
              width_mult: float = 1.0) -> SSD:
    return SSD(cfg=cfg, backbone=backbone, dtype=dtype, width_mult=width_mult)
