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


def fake_quant_act(x, xscale: float):
    """Straight-through fake-quant of activations to QConv's int8 grid.

    Forward value = dequantize(quantize(x)) with the STATIC calibrated scale
    ``xscale`` (max|input|, utils/quantize.calibrate_act_scales) — exactly the
    serving-time QConv input grid. Backward = identity (STE): the round/clip
    is bypassed by ``x + stop_gradient(q - x)`` so gradients reach the fp32
    master weights upstream.
    """
    x32 = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(x32 * (127.0 / xscale)), -127.0, 127.0) * (
        xscale / 127.0
    )
    return (x32 + jax.lax.stop_gradient(q - x32)).astype(x.dtype)


def fake_quant_kernel(k):
    """STE fake-quant of a conv kernel, symmetric per-OUTPUT-channel.

    Mirrors utils/quantize._quantize_conv: step = max|w|/127 over each output
    channel's taps. The step itself is data-derived but sits inside the
    stop_gradient, so the backward is the plain identity on ``k``.
    """
    k32 = k.astype(jnp.float32)
    ws = jnp.maximum(
        jnp.max(jnp.abs(k32), axis=(0, 1, 2), keepdims=True), 1e-12
    ) / 127.0
    q = jnp.clip(jnp.round(k32 / ws), -127.0, 127.0) * ws
    return (k32 + jax.lax.stop_gradient(q - k32)).astype(k.dtype)


class FQConv(nn.Module):
    """Fake-quantized conv for QAT fine-tuning (train-time twin of QConv).

    Parameter tree is IDENTICAL to ``nn.Conv`` (fp32 master ``kernel`` +
    ``bias``) — a QAT checkpoint is a plain checkpoint: it restores into any
    profile, and the int8 serving path (utils/quantize.apply_int8_backbone
    with the SAME scales file) quantizes it exactly as trained. The forward
    simulates QConv's numerics — input snapped to the static-``xscale`` int8
    grid, kernel to the per-out-channel grid — in fp32 elementwise math, with
    straight-through gradients (round/clip backward = identity). The conv
    itself accumulates in the compute dtype rather than int32; the grids
    match, so train-time activations track serving within accumulation noise.

    ``xscale`` is a STATIC attribute (from the calibration json), not a param:
    checkpoints stay scale-free and the quantization stays a fused constant
    elementwise pass, exactly like serving.
    """

    features: int
    kernel_size: tuple = (3, 3)
    stride: int = 1
    dilation: int = 1
    xscale: float = 1.0
    dtype: Dtype = jnp.float32
    kernel_init: Any = _KERNEL_INIT
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        k = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        xq = fake_quant_act(x, float(self.xscale)).astype(self.dtype)
        kq = fake_quant_kernel(k).astype(self.dtype)
        d = self.dilation
        pad = (d * (kh - 1)) // 2, (d * (kw - 1)) // 2
        y = jax.lax.conv_general_dilated(
            xq,
            kq,
            (self.stride, self.stride),
            ((pad[0], pad[0]), (pad[1], pad[1])),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


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
