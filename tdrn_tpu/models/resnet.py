"""ResNet backbone variant (ResNet-101 for the 512-input model).

TPU-native re-design of the reference's ResNet-101 backbone option
(SURVEY.md §2 #17, BASELINE.json config 5). Standard ResNet-v1 bottleneck
stacks in NHWC; the detector consumes four scales:

    C3 (size/8,  512 ch), C4 (size/16, 1024 ch), C5 (size/32, 2048 ch),
    extra (size/64, 512 ch)  — RefineDet-style extra stage.

Normalization is selectable (``norm``):
  * ``"frozen"`` (default): BatchNorm folded to a per-channel affine
    (inference-style) — detection fine-tuning at batch<=32 traditionally
    freezes BN stats; this keeps the forward purely functional (no mutable
    batch stats threading) and XLA-fusible. Pretrained torchvision BN stats
    fold exactly into these scale/bias params (utils/torch_weights.py
    ``load_resnet_backbone``).
  * ``"group"``: GroupNorm — normalizes activations at init, making the
    backbone trainable from random init (frozen affine at scale=1 cannot
    control activation growth through 100+ layers).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tdrn_tpu.models.layers import FQConv, QConv, conv1x1, conv3x3

Dtype = Any

_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def resnet_conv_chain(depth: int) -> List[str]:
    """Quantizable-conv keys in dataflow order (utils/quantize.py).

    Paths are relative to ``params["backbone"]``; every stage-0 block carries a
    ``proj`` shortcut conv (channel expansion and/or stride).
    """
    keys = ["stem"]
    for si, n in enumerate(_DEPTHS[depth], start=1):
        for bi in range(n):
            blk = f"stage{si}_{bi}"
            keys += [f"{blk}/conv1", f"{blk}/conv2", f"{blk}/conv3"]
            if bi == 0:
                keys.append(f"{blk}/proj")
    keys += ["extra1", "extra2"]
    return keys


class FrozenBN(nn.Module):
    """Per-channel affine (frozen batch-norm): y = x * scale + bias."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x * scale + bias).astype(self.dtype)


def _make_norm(norm: str, dtype, name: str):
    if norm == "frozen":
        return FrozenBN(dtype=dtype, name=name)
    if norm == "group":
        # num_groups must divide the channel count; gcd(32, c) always does and
        # equals the standard 32 groups for real (mult-of-32) widths.
        return lambda x: nn.GroupNorm(
            num_groups=math.gcd(32, x.shape[-1]), dtype=dtype, name=name
        )(x)
    raise ValueError(f"unknown resnet norm {norm!r}")


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    norm: str = "frozen"
    dtype: Dtype = jnp.float32
    # Serving-only int8 convs (models/layers.QConv; utils/quantize.py). The
    # norms stay in the compute dtype — XLA fuses them into the conv epilogue,
    # and keeping them separate lets the same calibration serve both norms.
    quant: bool = False
    # QAT fine-tuning: ((local_name, xscale), ...) for conv1/2/3[/proj]
    # (models/layers.FQConv; fp32 masters, straight-through gradients).
    qat_scales: Any = None

    def _conv(self, f, ks, name, stride=1):
        if self.quant:
            return QConv(f, (ks, ks), stride=stride, dtype=self.dtype,
                         name=name)
        if self.qat_scales:
            return FQConv(f, (ks, ks), stride=stride,
                          xscale=dict(self.qat_scales)[name],
                          dtype=self.dtype, name=name)
        mk = conv3x3 if ks == 3 else conv1x1
        kw = {"stride": stride} if ks == 3 else {}
        return mk(f, dtype=self.dtype, name=name, **kw)

    @nn.compact
    def __call__(self, x):
        f = self.features
        out_ch = 4 * f
        nrm = lambda name: _make_norm(self.norm, self.dtype, name)
        shortcut = x
        if x.shape[-1] != out_ch or self.stride != 1:
            if self.quant:
                shortcut = QConv(out_ch, (1, 1), stride=self.stride,
                                 dtype=self.dtype, name="proj")(x)
            elif self.qat_scales:
                shortcut = FQConv(out_ch, (1, 1), stride=self.stride,
                                  xscale=dict(self.qat_scales)["proj"],
                                  dtype=self.dtype, name="proj")(x)
            else:
                shortcut = nn.Conv(
                    out_ch, (1, 1), strides=(self.stride, self.stride),
                    dtype=self.dtype, name="proj",
                )(x)
            shortcut = nrm("proj_bn")(shortcut)
        y = self._conv(f, 1, "conv1")(x)
        y = nn.relu(nrm("bn1")(y))
        y = self._conv(f, 3, "conv2", stride=self.stride)(y)
        y = nn.relu(nrm("bn2")(y))
        y = self._conv(out_ch, 1, "conv3")(y)
        y = nrm("bn3")(y)
        return nn.relu(y + shortcut)


class ResNetBackbone(nn.Module):
    """ResNet-50/101/152 emitting the 4 detection scales."""

    depth: int = 101
    dtype: Dtype = jnp.float32
    width_mult: float = 1.0
    norm: str = "frozen"
    quant: bool = False  # serving-only int8 convs (utils/quantize.py)
    # QAT fine-tuning: ((key, xscale), ...) with utils/quantize.py key names
    # ("stem", "stage{s}_{b}/conv{i}|proj", "extra{1,2}").
    qat_scales: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        blocks = _DEPTHS[self.depth]
        w = lambda c: max(8, int(c * self.width_mult))
        qs = dict(self.qat_scales) if self.qat_scales else None
        # Stem: 7x7/2 conv + 3x3/2 maxpool -> stride 4.
        if self.quant:
            x = QConv(w(64), (7, 7), stride=2, dtype=self.dtype,
                      name="stem")(x)
        elif qs:
            x = FQConv(w(64), (7, 7), stride=2, xscale=qs["stem"],
                       dtype=self.dtype, name="stem")(x)
        else:
            x = nn.Conv(
                w(64), (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                dtype=self.dtype, name="stem",
            )(x)
        x = nn.relu(_make_norm(self.norm, self.dtype, "stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        sources = []
        widths = (w(64), w(128), w(256), w(512))
        for si, (n, f) in enumerate(zip(blocks, widths)):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blk = f"stage{si + 1}_{bi}"
                blk_qs = None
                if qs:
                    pre = blk + "/"
                    blk_qs = tuple(
                        (k[len(pre):], v) for k, v in qs.items()
                        if k.startswith(pre)
                    )
                x = Bottleneck(
                    f, stride=stride, norm=self.norm, dtype=self.dtype,
                    quant=self.quant, qat_scales=blk_qs, name=blk,
                )(x)
            if si >= 1:  # C3 (stride 8), C4 (16), C5 (32)
                sources.append(x)
        # Extra stage -> stride 64 (RefineDet-style).
        if self.quant:
            y = nn.relu(QConv(w(256), (1, 1), dtype=self.dtype,
                              name="extra1")(x))
            y = nn.relu(QConv(w(512), (3, 3), stride=2, dtype=self.dtype,
                              name="extra2")(y))
        elif qs:
            y = nn.relu(FQConv(w(256), (1, 1), xscale=qs["extra1"],
                               dtype=self.dtype, name="extra1")(x))
            y = nn.relu(FQConv(w(512), (3, 3), stride=2, xscale=qs["extra2"],
                               dtype=self.dtype, name="extra2")(y))
        else:
            y = nn.relu(conv1x1(w(256), dtype=self.dtype, name="extra1")(x))
            y = nn.relu(
                conv3x3(w(512), stride=2, dtype=self.dtype, name="extra2")(y)
            )
        sources.append(y)
        return sources
