"""Typed detector configurations.

TPU-native re-design of the reference's ``data/config.py`` dicts (SURVEY.md §2 #4,
reference lineage [R] data/config.py — reference mount unreadable this round, see
SURVEY.md banner). The reference keeps per-resolution dicts (``voc_320``,
``voc_512``, ``vid_*``) holding the prior-box geometry; we mirror that geometry 1:1
in frozen dataclasses so it is provably identical and hashable (usable as a static
argument to ``jax.jit``).

Geometry notes (RefineDet-style, the reference's ARM→ODM lineage):
  * 4 detection scales; feature maps [40,20,10,5] @320 and [64,32,16,8] @512.
  * 3 anchors per cell: aspect ratios {1, 2, 1/2} at scale ``min_size`` — no
    sqrt(s_k*s_{k+1}) anchor (that is SSD-style; RefineDet drops ``max_sizes``).
  * variances (0.1, 0.2) for the center/size encoding.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

ScaleTuple = Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static geometry + post-processing configuration for one detector variant."""

    name: str
    num_classes: int  # including background class 0
    size: int  # square input resolution
    feature_maps: ScaleTuple
    steps: ScaleTuple
    min_sizes: ScaleTuple
    aspect_ratios: Tuple[Tuple[float, ...], ...]  # extra ratios per scale (r and 1/r added)
    variance: Tuple[float, float] = (0.1, 0.2)
    clip: bool = True
    # Post-processing (reference Detect defaults, SURVEY.md §2 #20).
    conf_thresh: float = 0.01
    nms_thresh: float = 0.45
    top_k: int = 200
    # Candidate selection via lax.approx_max_k(recall_target=1.0) instead of
    # the full sort XLA emits for lax.top_k. Default OFF: tools/tpu_checks.py
    # measured (round 3, real v5e backend) that approx_max_k returns lax.top_k's
    # VALUES but a different index order under score ties — and detect's score
    # fields are tie-heavy (zeroed sub-threshold/filtered anchors), so tie order
    # is part of the exact-parity contract. Re-enable only behind a fresh
    # tpu_checks pass on the deployment backend.
    approx_topk: bool = False
    # ARM->ODM two-stage decode + softmax + negative-anchor filter as one
    # Pallas kernel emitting class-major scores (ops/cascade_pallas.py);
    # False = the plain XLA-fusion path (ops/detection.decode_two_stage).
    fused_cascade: bool = False
    # Streaming-profile candidate cap: keep only the top-M anchors image-wide
    # (by max non-background class score) before the per-class sort+NMS, so
    # the (C, P) sort becomes (P,)+(C, M). 0 = off (exact reference-parity
    # Detect). Exact whenever fewer than M anchors pass conf_thresh — the
    # overwhelmingly common case; see ops/detection.detect.
    prefilter_anchors: int = 0
    # Recall target for the image-wide prefilter's (P,) anchor selection.
    # 1.0 (default) = exact top-M (sort or tie-exact approx_max_k per
    # ``approx_topk``). < 1.0 switches the selection to the REAL TPU-native
    # approximate top-k (lax.approx_max_k partial reduction — fast because it
    # skips the full sort): each of the true top-M anchors is kept with at
    # least this probability. Bounded blast radius: only which candidates
    # enter per-class NMS changes (missing anchors score near the 512th-best
    # anchor's max-class score, far below real detections); the per-class
    # NMS/sort stays exact. Quality-gate on the fidelity harnesses before
    # serving (tools/synth_fidelity.py --hard).
    prefilter_recall: float = 1.0
    # ARM negative-anchor filter threshold (SURVEY.md §2 #19/#20).
    arm_filter_thresh: float = 0.99
    # Pixel means (BGR order in the reference; we store RGB for our RGB pipeline).
    pixel_means: Tuple[float, float, float] = (123.0, 117.0, 104.0)
    # Temporal settings (TDRN, SURVEY.md §2 #16).
    seq_len: int = 8

    @property
    def anchors_per_cell(self) -> Tuple[int, ...]:
        return tuple(1 + 2 * len(ars) for ars in self.aspect_ratios)

    @property
    def num_priors(self) -> int:
        return sum(
            f * f * a for f, a in zip(self.feature_maps, self.anchors_per_cell)
        )


def _cfg(name: str, num_classes: int, size: int, **kw) -> DetectorConfig:
    if size == 320:
        geom = dict(
            feature_maps=(40, 20, 10, 5),
            steps=(8, 16, 32, 64),
            min_sizes=(32, 64, 128, 256),
            aspect_ratios=((2.0,), (2.0,), (2.0,), (2.0,)),
        )
    elif size == 512:
        geom = dict(
            feature_maps=(64, 32, 16, 8),
            steps=(8, 16, 32, 64),
            min_sizes=(32, 64, 128, 256),
            aspect_ratios=((2.0,), (2.0,), (2.0,), (2.0,)),
        )
    else:
        raise ValueError(f"unsupported size {size}")
    geom.update(kw)
    return DetectorConfig(name=name, num_classes=num_classes, size=size, **geom)


# Tiny config for tests / sharding dry-runs: same 4-scale topology at 64×64.
TINY_64 = DetectorConfig(
    name="tiny_64",
    num_classes=4,
    size=64,
    feature_maps=(8, 4, 2, 1),
    steps=(8, 16, 32, 64),
    min_sizes=(8, 16, 32, 48),
    aspect_ratios=((2.0,), (2.0,), (2.0,), (2.0,)),
)

# Pascal VOC: 20 classes + background (SURVEY.md §2 #1).
VOC_320 = _cfg("voc_320", num_classes=21, size=320)
VOC_512 = _cfg("voc_512", num_classes=21, size=512)

# ImageNet VID: 30 classes + background (SURVEY.md §2 #2, BASELINE.json).
VID_320 = _cfg("vid_320", num_classes=31, size=320)
VID_512 = _cfg("vid_512", num_classes=31, size=512)

CONFIGS = {c.name: c for c in (VOC_320, VOC_512, VID_320, VID_512, TINY_64)}


def get_config(name: str) -> DetectorConfig:
    return CONFIGS[name]
