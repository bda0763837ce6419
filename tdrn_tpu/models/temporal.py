"""Temporal feature propagation (the TDRN core).

TPU-native re-design of the reference's temporal module (SURVEY.md §2 #16):
the reference carries the previous frame's refined (TCB) features into the
current frame's detection path, TSSD-style. Here each pyramid scale owns a
convolutional GRU cell over its 256-channel ODM features:

    z = sigmoid(conv([x, h]));  r = sigmoid(conv([x, h]))
    h~ = tanh(conv([x, r*h]));  h' = (1-z)*h + z*h~

The carried state is a list of (B, H_k, W_k, C) arrays — one per scale — that
(a) threads through ``lax.scan`` over a training clip (SURVEY.md §5.7) and
(b) lives donated in HBM across a streaming inference session so video never
round-trips to host (BASELINE.json north-star). State is zero-initialized at
clip start, matching the reference's state reset.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdrn_tpu.models.layers import conv3x3

Dtype = Any
State = List[jnp.ndarray]


# --- Pass-through ("identity") initialization -------------------------------
#
# A xavier-initialized gated cell starts as a feature DESTROYER: z ~
# sigmoid(0) = 0.5, cand ~ tanh(random mix), so h' is half stale state, half
# noise — round 2 measured cold-start clip training collapsing to temporal
# mAP 0.28 vs the 0.59 frame model (NOTES.md; VERDICT round-2 weak #3),
# rescued only by staged frame-then-clip training. These initializers start
# each cell NEAR THE IDENTITY on its input instead: the update gate biases
# open (sigmoid(+2) ~ 0.88 "use candidate") and the candidate conv starts as
# the center-tap identity on the x half of its input (plus 0.1-scaled xavier
# noise to break symmetry), so frame 0 of an untrained clip model computes
# h' ~ tanh(x) — a monotone squash of the TCB features the ODM heads can
# learn against immediately. Temporal behavior (closing z, mixing h) is then
# *learned* where it pays, rather than un-learned where it hurts.

_PASSTHROUGH_Z_BIAS = 2.0


def _gru_gate_bias(channels: int):
    """(z, r) gate bias: z opens toward the candidate, r neutral."""

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (2 * channels,), shape
        return jnp.concatenate(
            [
                jnp.full((channels,), _PASSTHROUGH_Z_BIAS, dtype),
                jnp.zeros((channels,), dtype),
            ]
        )

    return init


def _identity_on_x_init(channels: int, center: Tuple[int, int], noise: float = 0.1):
    """Kernel init = noise*xavier + identity center tap on the first
    ``channels`` input channels (the x half of a [x, h]-concat input)."""
    xavier = nn.initializers.xavier_uniform()

    def init(key, shape, dtype=jnp.float32):
        k = xavier(key, shape, dtype) * noise
        eye = jnp.eye(channels, shape[-1], dtype=dtype)
        return k.at[center[0], center[1], :channels, :].add(eye)

    return init


def _identity_depthwise_init(noise: float = 0.1):
    """Depthwise kernel init = noise*xavier + center-tap 1 per channel."""
    xavier = nn.initializers.xavier_uniform()

    def init(key, shape, dtype=jnp.float32):
        k = xavier(key, shape, dtype) * noise
        return k.at[shape[0] // 2, shape[1] // 2, 0, :].add(1.0)

    return init


class ConvGRUCell(nn.Module):
    """Single-scale convolutional GRU over NHWC features.

    quant=True (serving-only) runs the two 3x3 convs as int8 QConvs — at the
    40x40 scale they are the model's two largest convolutions (~1/4 of total
    FLOPs). Static activation scales are SAFE for the recurrence: h' is a
    convex combination of tanh outputs, so |h| <= 1 always; the conv inputs
    concat bounded h with the non-negative TCB features whose calibrated max
    dominates (utils/quantize.py floors the scale at 1.0). The concat inputs
    are ``sow``-ed for calibration (no submodule emits them).
    """

    channels: int = 256
    dtype: Dtype = jnp.float32
    # Pass-through init (see module comment); False = plain xavier/zeros.
    passthrough_init: bool = True
    quant: bool = False
    # QAT: (("gates", s), ("cand", s)) — fake-quant the cell convs (FQConv)
    # with the pass-through inits preserved (fp32 masters).
    qat_scales: Any = None

    @nn.compact
    def __call__(self, x, h):
        c = self.channels
        gate_bias = (
            _gru_gate_bias(c) if self.passthrough_init else nn.initializers.zeros
        )
        cand_kernel = (
            _identity_on_x_init(c, (1, 1))
            if self.passthrough_init
            else nn.initializers.xavier_uniform()
        )
        if self.quant:
            from tdrn_tpu.models.layers import QConv

            conv = lambda f, name: QConv(f, (3, 3), dtype=self.dtype, name=name)
        elif self.qat_scales:
            from tdrn_tpu.models.layers import FQConv

            qs = dict(self.qat_scales)
            conv = lambda f, name, **kw: FQConv(
                f, (3, 3), xscale=qs[name], dtype=self.dtype, name=name, **kw
            )
        else:
            conv = lambda f, name, **kw: conv3x3(
                f, dtype=self.dtype, name=name, **kw
            )
        xh = jnp.concatenate([x, h], axis=-1)
        self.sow("intermediates", "xh", xh)
        if self.quant:
            gates = conv(2 * c, "gates")(xh)
        else:
            gates = conv(2 * c, "gates", bias_init=gate_bias)(xh)
        z, r = jnp.split(nn.sigmoid(gates), 2, axis=-1)
        xrh = jnp.concatenate([x, r * h], axis=-1)
        self.sow("intermediates", "xrh", xrh)
        if self.quant:
            cand = nn.tanh(conv(c, "cand")(xrh))
        else:
            cand = nn.tanh(conv(c, "cand", kernel_init=cand_kernel)(xrh))
        h_new = (1.0 - z) * h + z * cand
        return h_new


class LightGRUCell(nn.Module):
    """Bandwidth-lean gated carry: 1x1 gate + depthwise-3x3/1x1 candidate.

    ~13x fewer FLOPs than the full ConvGRU at the 40x40 scale (the ConvGRU's
    3x3 512->512 gate convs are a quarter of the whole model's FLOPs); spatial
    context comes from the depthwise 3x3, channel mixing from the 1x1s.
    """

    channels: int = 256
    dtype: Dtype = jnp.float32
    passthrough_init: bool = True  # see module comment above
    # int8 serving: the two channel-mixing 1x1s quantize; the depthwise 3x3
    # stays in the compute dtype (negligible FLOPs, and QConv has no
    # feature_group_count).
    quant: bool = False
    # QAT twin of `quant`: (("gate", s), ("cand", s)) fake-quant scales.
    qat_scales: Any = None

    @nn.compact
    def __call__(self, x, h):
        from tdrn_tpu.models.layers import _KERNEL_INIT, FQConv, QConv, conv1x1

        c = self.channels
        qs = dict(self.qat_scales) if self.qat_scales else None
        if self.passthrough_init:
            gate_bias = lambda key, shape, dtype=jnp.float32: jnp.full(
                shape, _PASSTHROUGH_Z_BIAS, dtype
            )
            dw_kernel = _identity_depthwise_init()
            cand_kernel = _identity_on_x_init(c, (0, 0))
        else:
            gate_bias = nn.initializers.zeros
            dw_kernel = _KERNEL_INIT
            cand_kernel = _KERNEL_INIT
        xh = jnp.concatenate([x, h], axis=-1)
        self.sow("intermediates", "xh", xh)
        if self.quant:
            z = nn.sigmoid(QConv(c, (1, 1), dtype=self.dtype, name="gate")(xh))
        elif qs:
            z = nn.sigmoid(FQConv(c, (1, 1), xscale=qs["gate"],
                                  bias_init=gate_bias, dtype=self.dtype,
                                  name="gate")(xh))
        else:
            z = nn.sigmoid(
                conv1x1(c, dtype=self.dtype, bias_init=gate_bias, name="gate")(xh)
            )
        dw = nn.Conv(
            2 * c, (3, 3),
            feature_group_count=2 * c,
            kernel_init=dw_kernel, dtype=self.dtype, name="dw",
        )(xh)
        if self.quant:
            cand = nn.tanh(QConv(c, (1, 1), dtype=self.dtype, name="cand")(dw))
        elif qs:
            cand = nn.tanh(FQConv(c, (1, 1), xscale=qs["cand"],
                                  kernel_init=cand_kernel, dtype=self.dtype,
                                  name="cand")(dw))
        else:
            cand = nn.tanh(
                conv1x1(c, dtype=self.dtype, kernel_init=cand_kernel, name="cand")(dw)
            )
        return (1.0 - z) * h + z * cand


def cell_kind(cell: str, scale: int) -> str:
    """Which cell class ("convgru"/"light") runs at a given pyramid scale.

    Shared with utils/quantize.py so the int8 calibration keys ("gates" vs
    "gate"/"cand") always match the module actually instantiated.
    """
    if cell == "hybrid":
        return "light" if scale == 0 else "convgru"
    return cell


class TemporalPropagation(nn.Module):
    """Per-scale gated carry over the ODM feature pyramid.

    cell="convgru" (full 3x3 ConvGRU), "light" (LightGRUCell), or "hybrid":
    LightGRUCell on scale 0 only — the 40x40 scale is where the ConvGRU's
    FLOPs concentrate (its two 3x3 512-in convs are ~1/4 of the whole model,
    BENCH.md round-3 composition), so the hybrid keeps the full cell's
    modeling capacity on the 3 cheap scales while cutting the dominant cost.
    """

    num_scales: int = 4
    channels: int = 256
    cell: str = "convgru"
    dtype: Dtype = jnp.float32
    quant: bool = False  # serving-only int8 cell convs (utils/quantize.py)
    # QAT: ((key, xscale), ...) with utils/quantize.py keys "gru{k}/<conv>".
    qat_scales: Any = None

    @nn.compact
    def __call__(
        self, feats: List[jnp.ndarray], state: Optional[State]
    ) -> Tuple[List[jnp.ndarray], State]:
        if self.cell not in ("convgru", "light", "hybrid"):
            raise ValueError(f"unknown temporal cell {self.cell!r}")
        qs = dict(self.qat_scales) if self.qat_scales else None
        outs, new_state = [], []
        for k, x in enumerate(feats):
            cell_cls = (
                LightGRUCell
                if cell_kind(self.cell, k) == "light"
                else ConvGRUCell
            )
            h = state[k] if state is not None else jnp.zeros_like(x)
            cell_qs = None
            if qs:
                pre = f"gru{k}/"
                cell_qs = tuple(
                    (key[len(pre):], v) for key, v in qs.items()
                    if key.startswith(pre)
                )
            h_new = cell_cls(
                self.channels, dtype=self.dtype, quant=self.quant,
                qat_scales=cell_qs, name=f"gru{k}",
            )(x, h)
            outs.append(h_new)
            new_state.append(h_new)
        return outs, new_state


def init_state(
    batch: int, size: int, feature_maps, channels: int = 256, dtype=jnp.float32
) -> State:
    """Zero temporal state for a clip/stream start."""
    return [jnp.zeros((batch, f, f, channels), dtype) for f in feature_maps]
