"""Shared model layers.

L2Norm is the TPU-native re-design of the reference's
``layers/modules/l2norm.py`` (SURVEY.md §2 #10): channel-wise L2 normalization
with a learned per-channel scale, applied to the conv4_3 / conv5_3 feature maps
whose activation magnitudes differ from the deeper scales. Operates on NHWC
(channels-last — the TPU-friendly layout) instead of the reference's NCHW.
"""

from __future__ import annotations

from typing import Any

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
