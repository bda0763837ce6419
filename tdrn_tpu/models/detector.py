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
    norm: str = "frozen", quant: bool = False, qat_scales=None,
):
    if name == "vgg16":
        from tdrn_tpu.models.vgg import VGG16Reduced

        return VGG16Reduced(
            dtype=dtype, width_mult=width_mult, stem=stem, quant=quant,
            qat_scales=qat_scales, name="backbone",
        )
    if name == "resnet101":
        from tdrn_tpu.models.resnet import ResNetBackbone

        return ResNetBackbone(
            depth=101, dtype=dtype, width_mult=width_mult, norm=norm,
            quant=quant, qat_scales=qat_scales, name="backbone",
        )
    raise ValueError(f"unknown backbone {name}")


def split_qat_scales(qat_scales):
    """Split ((key, xscale), ...) into (backbone, tcb, gru) groups by the
    utils/quantize.py key convention ("tcb{k}/..." / "gru{k}/..." prefixes;
    everything else is a backbone conv)."""
    backbone, tcb, gru = [], [], []
    for k, v in qat_scales:
        blk = k.split("/", 1)[0]
        if blk.startswith("tcb") and blk[3:].isdigit():
            tcb.append((k, v))
        elif blk.startswith("gru") and blk[3:].isdigit():
            gru.append((k, v))
        else:
            backbone.append((k, v))
    return tuple(backbone), tuple(tcb), tuple(gru)


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
    temporal_cell: str = "convgru"  # "light" / "hybrid" (models/temporal.py)
    backbone_norm: str = "frozen"  # resnet only: "frozen" | "group"
    dtype: Dtype = jnp.float32
    # Compute dtype for the ARM/ODM heads; None = same as `dtype`. The
    # resident-bf16 inference profile (utils/precision.py) sets dtype=bf16
    # with head_dtype=fp32 so the prediction logits (which feed detect
    # directly) stay full precision while the feature pyramid runs bf16.
    head_dtype: Optional[Dtype] = None
    # Streaming micro-batch depth (inference): process `chunk` consecutive
    # frames per stream in ONE forward. x is (chunk*B, H, W, 3) FRAME-MAJOR
    # (frame 0's B streams, then frame 1's, ...), state stays (B, ...). The
    # state-independent ~85% of the model (backbone/ARM/TCB/ODM + detect)
    # batches across chunk*B samples — reclaiming the batch-efficiency a
    # serial-depth-bound batch-1 stream forfeits (BENCH.md: b1 costs ~3.4x
    # the per-frame b8 cost) — while the cheap temporal cell steps the chunk
    # sequentially, keeping recurrence exact. Latency grows by (chunk-1)
    # frames; throughput approaches the batched roofline. Training always
    # uses chunk=1 (the clip scan already batches via lax.scan + B).
    chunk: int = 1
    # Inference-only: the preprocess mean-subtract is folded into conv1_1
    # (utils/precision.apply_fold_mean) and the model expects raw-pixel
    # (B, H, W, 4) input — rgb + a constant ones channel. The inference
    # wrappers read this flag to select the preprocess mode.
    fold_mean: bool = False
    # Serving-only int8 backbone (models/layers.QConv): params produced by
    # utils/quantize.quantize_backbone from any fp32/bf16 checkpoint.
    quant: bool = False
    # Extend int8 to the TCB pyramid convs (quantize with tcb=True).
    quant_tcb: bool = False
    # Extend int8 to the temporal-cell convs (quantize with gru=True; safe
    # statically because |h| <= 1 — see models/temporal.ConvGRUCell).
    quant_gru: bool = False
    # QAT fine-tuning (train-only): ((conv_key, xscale), ...) — the convs the
    # int8 serving profile quantizes run fake-quantized (models/layers.FQConv,
    # straight-through gradients) on the SAME calibrated grids, so a QAT
    # checkpoint serves int8 with minimal PTQ delta. Keys follow
    # utils/quantize.py (backbone names, "tcb{k}/conv{i}", "gru{k}/<conv>");
    # which subsystems fake-quantize is determined by which keys are present.
    # Param tree is UNCHANGED (fp32 masters) — mutually exclusive with quant.
    qat_scales: Any = None
    # Zero-pad the input to this many channels before conv1_1 (0 = off).
    # Perf experiment (exact — the matching kernel channels are zero, see
    # utils/precision.apply_pad_stem): a C=3 stem conv triggers XLA's
    # small-channel spatial rewrite, whose surrounding layout copies were
    # ~0.2 ms of the round-3 b1 trace; padding to 4/8 channels changes which
    # rewrite path the compiler picks. Measured via device_bench --pad_stem.
    pad_stem: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Optional[State] = None
    ) -> Tuple[RawPredictions, Optional[State]]:
        """x: (B, size, size, 3) preprocessed frames (NHWC, mean-subtracted)."""
        cfg = self.cfg
        if self.pad_stem and x.shape[-1] < self.pad_stem:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, self.pad_stem - x.shape[-1])])
        qat_backbone = qat_tcb = qat_gru = None
        if self.qat_scales:
            assert not self.quant, "qat_scales and quant are mutually exclusive"
            qat_backbone, qat_tcb, qat_gru = split_qat_scales(self.qat_scales)
        sources = _build_backbone(
            self.backbone, self.dtype, self.width_mult, self.stem,
            self.backbone_norm, self.quant, qat_backbone,
        )(x)
        assert len(sources) == len(cfg.feature_maps)
        # L2Norm the two shallow scales (reference inits: 10 and 8).
        sources[0] = L2Norm(10.0, dtype=self.dtype, name="l2norm0")(sources[0])
        sources[1] = L2Norm(8.0, dtype=self.dtype, name="l2norm1")(sources[1])

        head_dtype = self.head_dtype if self.head_dtype is not None else self.dtype
        arm_loc, arm_conf = MultiBoxHead(
            2, cfg.anchors_per_cell, dtype=head_dtype, name="arm"
        )(sources)

        feats = TopDownPyramid(
            len(sources), self.tcb_channels, dtype=self.dtype,
            quant=self.quant_tcb, qat_scales=qat_tcb, name="tcb",
        )(sources)

        if self.arm_guided_sampling:
            from tdrn_tpu.models.offset import apply_arm_guided_sampling

            feats = apply_arm_guided_sampling(feats, arm_loc, cfg)

        new_state: Optional[State] = None
        if self.temporal:
            tp = TemporalPropagation(
                len(feats), self.tcb_channels, cell=self.temporal_cell,
                dtype=self.dtype, quant=self.quant_gru, qat_scales=qat_gru,
                name="temporal",
            )
            if self.chunk > 1:
                # Frame-major micro-batch: split (chunk*B) back into per-frame
                # feature lists, step the recurrent cell chunk times (python
                # unroll — chunk is small and static), re-stack frame-major.
                f = self.chunk
                bb = feats[0].shape[0] // f
                per_frame = [
                    [ft.reshape(f, bb, *ft.shape[1:])[i] for ft in feats]
                    for i in range(f)
                ]
                st = state
                outs = []
                for i in range(f):
                    out_i, st = tp(per_frame[i], st)
                    outs.append(out_i)
                feats = [
                    jnp.stack([outs[i][k] for i in range(f)]).reshape(
                        f * bb, *outs[0][k].shape[1:]
                    )
                    for k in range(len(feats))
                ]
                new_state = st
            else:
                feats, new_state = tp(feats, state)

        odm_loc, odm_conf = MultiBoxHead(
            cfg.num_classes, cfg.anchors_per_cell, dtype=head_dtype, name="odm"
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
    head_dtype=None,
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
        head_dtype=head_dtype,
    )
