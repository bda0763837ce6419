"""The dual-refinement (video) detector.

TPU-native re-design of the reference's ``build_net`` model (SURVEY.md §2 #9–#16,
§3.4): VGG-16 (or ResNet-101) backbone -> L2Norm on the two shallow scales ->
ARM heads on the backbone sources -> TCB top-down fusion -> optional temporal
propagation (TDRN) -> ODM heads. The forward is phase-free: it always returns
the raw prediction tuple (SURVEY.md L4 contract) plus the new temporal state;
post-processing (``ops.detection``) is composed functionally by callers so the
same parameters serve training, evaluation, and streaming.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdrn_tpu.config import DetectorConfig
from tdrn_tpu.models.heads import MultiBoxHead
from tdrn_tpu.models.layers import L2Norm
from tdrn_tpu.models.tcb import TopDownPyramid
from tdrn_tpu.models.temporal import State, TemporalPropagation, init_state
from tdrn_tpu.ops.detection import RawPredictions

Dtype = Any


def _build_backbone(
    name: str, dtype, width_mult: float = 1.0, stem: str = "conv",
    norm: str = "frozen",
):
    if name == "vgg16":
        from tdrn_tpu.models.vgg import VGG16Reduced

        return VGG16Reduced(
            dtype=dtype, width_mult=width_mult, stem=stem, name="backbone"
        )
    if name == "resnet101":
        from tdrn_tpu.models.resnet import ResNetBackbone

        return ResNetBackbone(
            depth=101, dtype=dtype, width_mult=width_mult, norm=norm,
            name="backbone",
        )
    raise ValueError(f"unknown backbone {name}")


class TDRN(nn.Module):
    """Dual-refinement detector with optional temporal propagation."""

    cfg: DetectorConfig
    backbone: str = "vgg16"
    temporal: bool = True
    # DRN dual coupling: ARM regression guides ODM feature sampling
    # (SURVEY.md §2 #15, models/offset.py).
    arm_guided_sampling: bool = True
    tcb_channels: int = 256
    width_mult: float = 1.0
    stem: str = "conv"  # "s2d" = space-to-depth stem (models/vgg.py)
    temporal_cell: str = "convgru"  # or "light" (models/temporal.py)
    backbone_norm: str = "frozen"  # resnet only: "frozen" | "group"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Optional[State] = None
    ) -> Tuple[RawPredictions, Optional[State]]:
        """x: (B, size, size, 3) preprocessed frames (NHWC, mean-subtracted)."""
        cfg = self.cfg
        sources = _build_backbone(
            self.backbone, self.dtype, self.width_mult, self.stem,
            self.backbone_norm,
        )(x)
        assert len(sources) == len(cfg.feature_maps)
        # L2Norm the two shallow scales (reference inits: 10 and 8).
        sources[0] = L2Norm(10.0, dtype=self.dtype, name="l2norm0")(sources[0])
        sources[1] = L2Norm(8.0, dtype=self.dtype, name="l2norm1")(sources[1])

        arm_loc, arm_conf = MultiBoxHead(
            2, cfg.anchors_per_cell, dtype=self.dtype, name="arm"
        )(sources)

        feats = TopDownPyramid(
            len(sources), self.tcb_channels, dtype=self.dtype, name="tcb"
        )(sources)

        if self.arm_guided_sampling:
            from tdrn_tpu.models.offset import apply_arm_guided_sampling

            feats = apply_arm_guided_sampling(feats, arm_loc, cfg)

        new_state: Optional[State] = None
        if self.temporal:
            feats, new_state = TemporalPropagation(
                len(feats), self.tcb_channels, cell=self.temporal_cell,
                dtype=self.dtype, name="temporal",
            )(feats, state)

        odm_loc, odm_conf = MultiBoxHead(
            cfg.num_classes, cfg.anchors_per_cell, dtype=self.dtype, name="odm"
        )(feats)

        preds = RawPredictions(
            arm_loc.astype(jnp.float32),
            arm_conf.astype(jnp.float32),
            odm_loc.astype(jnp.float32),
            odm_conf.astype(jnp.float32),
        )
        return preds, new_state

    def zero_state(self, batch: int) -> State:
        return init_state(
            batch, self.cfg.size, self.cfg.feature_maps, self.tcb_channels, self.dtype
        )


def build_detector(
    cfg: DetectorConfig,
    backbone: str = "vgg16",
    temporal: bool = True,
    dtype=jnp.float32,
    tcb_channels: int = 256,
    width_mult: float = 1.0,
    arm_guided_sampling: bool = True,
    stem: str = "conv",
    temporal_cell: str = "convgru",
    backbone_norm: str = "frozen",
) -> TDRN:
    """Equivalent of the reference's ``build_net`` (SURVEY.md L4)."""
    return TDRN(
        cfg=cfg,
        backbone=backbone,
        temporal=temporal,
        arm_guided_sampling=arm_guided_sampling,
        tcb_channels=tcb_channels,
        width_mult=width_mult,
        stem=stem,
        temporal_cell=temporal_cell,
        backbone_norm=backbone_norm,
        dtype=dtype,
    )
