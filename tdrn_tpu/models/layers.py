"""Shared model layers.

L2Norm is the TPU-native re-design of the reference's
``layers/modules/l2norm.py`` (SURVEY.md §2 #10): channel-wise L2 normalization
with a learned per-channel scale, applied to the conv4_3 / conv5_3 feature maps
whose activation magnitudes differ from the deeper scales. Operates on NHWC
(channels-last — the TPU-friendly layout) instead of the reference's NCHW.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class L2Norm(nn.Module):
    """Channelwise L2-normalize + learned scale (init `scale_init`)."""

    scale_init: float = 10.0
    eps: float = 1e-10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param(
            "scale", lambda key, shape: jnp.full(shape, self.scale_init, jnp.float32), (c,)
        )
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + self.eps)
        out = x32 / norm * gamma
        return out.astype(self.dtype)


# The reference xavier-initializes all non-pretrained layers (SURVEY.md §2 #25).
_KERNEL_INIT = nn.initializers.xavier_uniform()


def conv3x3(
    features: int, *, stride: int = 1, dilation: int = 1, dtype=jnp.float32,
    kernel_init=_KERNEL_INIT, bias_init=nn.initializers.zeros, name=None,
):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((dilation, dilation), (dilation, dilation)),
        kernel_dilation=(dilation, dilation),
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        name=name,
    )


def conv1x1(
    features: int, *, dtype=jnp.float32, kernel_init=_KERNEL_INIT,
    bias_init=nn.initializers.zeros, name=None,
):
    return nn.Conv(
        features, (1, 1), kernel_init=kernel_init, bias_init=bias_init,
        dtype=dtype, name=name,
    )


class QConv(nn.Module):
    """int8-quantized conv (serving-only, SURVEY.md §6 "beat on perf" row).

    The v5e MXU runs s8 x s8 -> s32 at 2x its bf16 rate (394 vs 197 T/s), and
    the round-3 b8 trace shows the backbone convs MXU/tiling-bound (70% of
    the step). This module is the TPU-native post-training-quantization path:

      * ``kernel``  — int8, HWIO, symmetric per-OUTPUT-channel; the stored
        ``wscale`` (f32, one per out channel) is the quantization step
        ``max|w| / 127``.
      * ``xscale``  — f32 scalar: the CALIBRATED max|input| of this layer
        (utils/quantize.calibrate_act_scales). Static, so the in-graph
        activation quantization is a fused elementwise pass with NO runtime
        reduction — and it writes int8, halving the conv's input read traffic
        vs bf16.
      * accumulation in int32 (``preferred_element_type``), dequantized with
        the folded factor ``(xscale/127) * wscale`` per channel, bias added in
        f32, output cast to ``dtype``.

    Zero-point is 0 (symmetric), so SAME zero-padding stays exact. Params are
    produced by ``utils/quantize.quantize_backbone`` from any fp32/bf16
    checkpoint; this module has no meaningful init (serving-only — no autodiff
    through ``round``).
    """

    features: int
    kernel_size: tuple = (3, 3)
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (kh, kw, cin, self.features),
        )
        wscale = self.param(
            "wscale", lambda key, shape: jnp.ones(shape, jnp.float32),
            (self.features,),
        )
        xscale = self.param(
            "xscale", lambda key, shape: jnp.ones(shape, jnp.float32), ()
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Quantize the input: f32 math for the scaling/round (elementwise,
        # fused), int8 materialization (half the bytes of bf16).
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (127.0 / xscale)), -127.0, 127.0
        ).astype(jnp.int8)
        d = self.dilation
        pad = (d * (kh - 1)) // 2, (d * (kw - 1)) // 2
        y = jax.lax.conv_general_dilated(
            xq,
            k,
            (self.stride, self.stride),
            ((pad[0], pad[0]), (pad[1], pad[1])),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (wscale * (xscale / 127.0)) + bias.astype(
            jnp.float32
        )
        return out.astype(self.dtype)
