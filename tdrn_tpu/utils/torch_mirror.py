"""Torch-CPU mirror of the full TDRN forward — the fidelity oracle.

The reference implementation (SURVEY.md §3.4 dataflow; mount unreadable, see
SURVEY.md banner) is a PyTorch NCHW model. With no reference code and no
pretrained checkpoints on this machine, the strongest buildable fidelity
evidence is a *torch* re-implementation of the same equations, NCHW and eager
like the reference lineage, grafted weight-for-weight against our flax model
and checked for end-to-end numerical parity (tests/test_torch_parity.py).

This module therefore implements VGG16-reduced -> L2Norm -> ARM -> TCB ->
ARM-guided sampling -> ConvGRU -> ODM in plain torch, with module attribute
names chosen so ``state_dict()`` keys correspond 1:1 to our flax param tree
paths (utils/torch_weights.py does the mechanical kernel-layout conversion):

    flax params['params']['backbone']['conv1_1']['kernel']  (HWIO)
    <->  torch ``backbone.conv1_1.weight``                  (OIHW)

Scope: the weight-compatible reference-shaped configuration only — ``conv``
stem, ``convgru`` temporal cell, VGG-16 backbone (the s2d stem and light cell
are our own train-from-scratch TPU variants with no torch counterpart).

Torch is imported lazily at module import; this file is only imported by
tests and conversion tooling, never by the jax compute path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


def _conv3x3(cin: int, cout: int, stride: int = 1, dilation: int = 1) -> nn.Conv2d:
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation, dilation=dilation)


class TorchL2Norm(nn.Module):
    """Channelwise L2 norm + learned scale (same equation as models/layers.py)."""

    def __init__(self, channels: int, scale_init: float = 10.0, eps: float = 1e-10):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), float(scale_init)))
        self.eps = eps

    def forward(self, x):
        norm = torch.sqrt((x * x).sum(dim=1, keepdim=True) + self.eps)
        return x / norm * self.scale[None, :, None, None]


class TorchVGG16Reduced(nn.Module):
    """VGG-16 reduced-fc emitting the 4 ARM sources (mirror of models/vgg.py)."""

    def __init__(self):
        super().__init__()
        stages = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
        cin = 3
        for si, (n, ch) in enumerate(stages):
            for ci in range(n):
                setattr(self, f"conv{si + 1}_{ci + 1}", _conv3x3(cin, ch))
                cin = ch
        self.conv6 = _conv3x3(512, 1024, dilation=3)
        self.conv7 = nn.Conv2d(1024, 1024, 1)
        self.conv6_1 = nn.Conv2d(1024, 256, 1)
        self.conv6_2 = _conv3x3(256, 512, stride=2)

    def forward(self, x) -> List[torch.Tensor]:
        sources = []
        stages = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
        for si, (n, _) in enumerate(stages):
            for ci in range(n):
                x = F.relu(getattr(self, f"conv{si + 1}_{ci + 1}")(x))
            if si == 3:
                sources.append(x)  # conv4_3 (pre-pool4)
            if si == 4:
                sources.append(x)  # conv5_3 (pre-pool5)
            if si < 4:
                x = F.max_pool2d(x, 2, 2)
        x = F.max_pool2d(x, 2, 2)  # pool5 stride-2 (RefineDet geometry)
        x = F.relu(self.conv6(x))
        x = F.relu(self.conv7(x))
        sources.append(x)
        x = F.relu(self.conv6_1(x))
        x = F.relu(self.conv6_2(x))
        sources.append(x)
        return sources


class TorchMultiBoxHead(nn.Module):
    """Per-scale loc/conf heads; flattens NCHW -> (B, H*W*A, D) in the same
    row-major (cell, anchor) order as the NHWC flax head (models/heads.py)."""

    def __init__(self, num_outputs: int, anchors_per_cell, in_channels):
        super().__init__()
        self.num_outputs = num_outputs
        self.anchors = tuple(anchors_per_cell)
        for k, (a, c) in enumerate(zip(self.anchors, in_channels)):
            setattr(self, f"loc{k}", _conv3x3(c, a * 4))
            setattr(self, f"conf{k}", _conv3x3(c, a * num_outputs))

    def forward(self, feats: List[torch.Tensor]):
        locs, confs = [], []
        for k, x in enumerate(feats):
            b = x.shape[0]
            loc = getattr(self, f"loc{k}")(x)
            conf = getattr(self, f"conf{k}")(x)
            # NCHW -> NHWC -> flat: matches the flax reshape(b, -1, D).
            locs.append(loc.permute(0, 2, 3, 1).reshape(b, -1, 4))
            confs.append(conf.permute(0, 2, 3, 1).reshape(b, -1, self.num_outputs))
        return torch.cat(locs, dim=1), torch.cat(confs, dim=1)


class TorchTCB(nn.Module):
    """One transfer-connection block (mirror of models/tcb.py TCB)."""

    def __init__(self, cin: int, channels: int = 256, has_deconv: bool = True):
        super().__init__()
        c = channels
        self.conv1 = _conv3x3(cin, c)
        self.conv2 = _conv3x3(c, c)
        self.conv3 = _conv3x3(c, c)
        # The deepest block receives no deeper input, hence no deconv —
        # matching the flax TCB, where the deconv submodule is only created
        # when ``deeper`` is passed (lazy @nn.compact param creation).
        if has_deconv:
            self.deconv = nn.ConvTranspose2d(c, c, 2, stride=2)

    def forward(self, x, deeper: Optional[torch.Tensor] = None):
        x = F.relu(self.conv1(x))
        x = self.conv2(x)
        if deeper is not None:
            x = x + self.deconv(deeper)
        x = F.relu(x)
        return F.relu(self.conv3(x))


class TorchTopDownPyramid(nn.Module):
    def __init__(self, in_channels, channels: int = 256):
        super().__init__()
        self.num_scales = len(in_channels)
        for k, c in enumerate(in_channels):
            has_deconv = k < self.num_scales - 1
            setattr(self, f"tcb{k}", TorchTCB(c, channels, has_deconv=has_deconv))

    def forward(self, sources: List[torch.Tensor]) -> List[torch.Tensor]:
        outs: List[Optional[torch.Tensor]] = [None] * self.num_scales
        deeper = None
        for k in reversed(range(self.num_scales)):
            deeper = getattr(self, f"tcb{k}")(sources[k], deeper)
            outs[k] = deeper
        return outs  # type: ignore


class TorchConvGRUCell(nn.Module):
    """Mirror of models/temporal.py ConvGRUCell (z = first half of gates)."""

    def __init__(self, channels: int = 256):
        super().__init__()
        self.channels = channels
        self.gates = _conv3x3(2 * channels, 2 * channels)
        self.cand = _conv3x3(2 * channels, channels)

    def forward(self, x, h):
        c = self.channels
        gates = torch.sigmoid(self.gates(torch.cat([x, h], dim=1)))
        z, r = gates[:, :c], gates[:, c:]
        cand = torch.tanh(self.cand(torch.cat([x, r * h], dim=1)))
        return (1.0 - z) * h + z * cand


class TorchTemporalPropagation(nn.Module):
    def __init__(self, num_scales: int, channels: int = 256):
        super().__init__()
        self.num_scales = num_scales
        for k in range(num_scales):
            setattr(self, f"gru{k}", TorchConvGRUCell(channels))

    def forward(self, feats, state):
        outs, new_state = [], []
        for k, x in enumerate(feats):
            h = state[k] if state is not None else torch.zeros_like(x)
            h_new = getattr(self, f"gru{k}")(x, h)
            outs.append(h_new)
            new_state.append(h_new)
        return outs, new_state


def bilinear_shift_torch(feat: torch.Tensor, dy: torch.Tensor, dx: torch.Tensor):
    """NCHW mirror of models/offset.py bilinear_shift (border clamp)."""
    b, c, h, w = feat.shape
    ys = torch.arange(h, dtype=feat.dtype)[None, :, None] + dy  # (B, H, W)
    xs = torch.arange(w, dtype=feat.dtype)[None, None, :] + dx
    ys = ys.clamp(0.0, h - 1.0)
    xs = xs.clamp(0.0, w - 1.0)
    y0 = torch.floor(ys)
    x0 = torch.floor(xs)
    wy = (ys - y0)[:, None]  # (B, 1, H, W)
    wx = (xs - x0)[:, None]
    y0 = y0.long()
    x0 = x0.long()
    y1 = (y0 + 1).clamp(max=h - 1)
    x1 = (x0 + 1).clamp(max=w - 1)
    flat = feat.reshape(b, c, h * w)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, 1, h * w).expand(b, c, h * w)
        return torch.gather(flat, 2, idx).reshape(b, c, h, w)

    f00, f01, f10, f11 = gather(y0, x0), gather(y0, x1), gather(y1, x0), gather(y1, x1)
    top = f00 + (f01 - f00) * wx
    bot = f10 + (f11 - f10) * wx
    return top + (bot - top) * wy


def apply_arm_guided_sampling_torch(feats, arm_loc, cfg):
    """NCHW mirror of models/offset.py apply_arm_guided_sampling."""
    outs = []
    start = 0
    for k, feat in enumerate(feats):
        f, a = cfg.feature_maps[k], cfg.anchors_per_cell[k]
        n = f * f * a
        ratio = cfg.min_sizes[k] / cfg.steps[k]
        b = arm_loc.shape[0]
        loc = arm_loc[:, start : start + n].reshape(b, f, f, a, 4)
        cell_shift = loc[..., :2].mean(dim=3) * cfg.variance[0] * ratio  # (B,H,W,2)
        dx, dy = cell_shift[..., 0], cell_shift[..., 1]
        outs.append(bilinear_shift_torch(feat, dy.to(feat.dtype), dx.to(feat.dtype)))
        start += n
    return outs


class TorchTDRN(nn.Module):
    """Full torch mirror of models/detector.py TDRN (VGG16, conv stem, convgru).

    forward(x NCHW, state) -> ((arm_loc, arm_conf, odm_loc, odm_conf), state)
    with the exact tensor contract of the flax model's RawPredictions.
    """

    def __init__(self, cfg, temporal: bool = True, arm_guided_sampling: bool = True,
                 tcb_channels: int = 256):
        super().__init__()
        self.cfg = cfg
        self.temporal_enabled = temporal
        self.arm_guided_sampling = arm_guided_sampling
        self.tcb_channels = tcb_channels
        src_channels = (512, 512, 1024, 512)
        self.backbone = TorchVGG16Reduced()
        self.l2norm0 = TorchL2Norm(512, 10.0)
        self.l2norm1 = TorchL2Norm(512, 8.0)
        self.arm = TorchMultiBoxHead(2, cfg.anchors_per_cell, src_channels)
        self.tcb = TorchTopDownPyramid(src_channels, tcb_channels)
        if temporal:
            self.temporal = TorchTemporalPropagation(len(src_channels), tcb_channels)
        self.odm = TorchMultiBoxHead(
            cfg.num_classes, cfg.anchors_per_cell, (tcb_channels,) * len(src_channels)
        )

    def zero_state(self, batch: int):
        return [
            torch.zeros(batch, self.tcb_channels, f, f) for f in self.cfg.feature_maps
        ]

    def forward(self, x, state=None):
        sources = self.backbone(x)
        sources[0] = self.l2norm0(sources[0])
        sources[1] = self.l2norm1(sources[1])
        arm_loc, arm_conf = self.arm(sources)
        feats = self.tcb(sources)
        if self.arm_guided_sampling:
            feats = apply_arm_guided_sampling_torch(feats, arm_loc, self.cfg)
        new_state = None
        if self.temporal_enabled:
            feats, new_state = self.temporal(feats, state)
        odm_loc, odm_conf = self.odm(feats)
        return (arm_loc, arm_conf, odm_loc, odm_conf), new_state
