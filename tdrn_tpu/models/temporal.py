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


class ConvGRUCell(nn.Module):
    """Single-scale convolutional GRU over NHWC features."""

    channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        xh = jnp.concatenate([x, h], axis=-1)
        gates = conv3x3(2 * self.channels, dtype=self.dtype, name="gates")(xh)
        z, r = jnp.split(nn.sigmoid(gates), 2, axis=-1)
        cand = nn.tanh(
            conv3x3(self.channels, dtype=self.dtype, name="cand")(
                jnp.concatenate([x, r * h], axis=-1)
            )
        )
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

    @nn.compact
    def __call__(self, x, h):
        from tdrn_tpu.models.layers import _KERNEL_INIT, conv1x1

        xh = jnp.concatenate([x, h], axis=-1)
        z = nn.sigmoid(conv1x1(self.channels, dtype=self.dtype, name="gate")(xh))
        dw = nn.Conv(
            2 * self.channels, (3, 3),
            feature_group_count=2 * self.channels,
            kernel_init=_KERNEL_INIT, dtype=self.dtype, name="dw",
        )(xh)
        cand = nn.tanh(conv1x1(self.channels, dtype=self.dtype, name="cand")(dw))
        return (1.0 - z) * h + z * cand


class TemporalPropagation(nn.Module):
    """Per-scale gated carry over the ODM feature pyramid.

    cell="convgru" (full 3x3 ConvGRU) or "light" (LightGRUCell).
    """

    num_scales: int = 4
    channels: int = 256
    cell: str = "convgru"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: List[jnp.ndarray], state: Optional[State]
    ) -> Tuple[List[jnp.ndarray], State]:
        cell_cls = ConvGRUCell if self.cell == "convgru" else LightGRUCell
        outs, new_state = [], []
        for k, x in enumerate(feats):
            h = state[k] if state is not None else jnp.zeros_like(x)
            h_new = cell_cls(self.channels, dtype=self.dtype, name=f"gru{k}")(x, h)
            outs.append(h_new)
            new_state.append(h_new)
        return outs, new_state


def init_state(
    batch: int, size: int, feature_maps, channels: int = 256, dtype=jnp.float32
) -> State:
    """Zero temporal state for a clip/stream start."""
    return [jnp.zeros((batch, f, f, channels), dtype) for f in feature_maps]
