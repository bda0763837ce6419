"""Transfer Connection Blocks (TCB): the top-down ARM->ODM feature path.

TPU-native re-design of the reference's TCB modules (SURVEY.md §2 #13, §3.4):
each ARM source feature map is projected to 256 channels, fused with the
(2x-upsampled) deeper TCB output, and refined — producing the ODM feature
pyramid. We fuse with a stride-2 transposed conv like the reference's deconv;
addition happens pre-activation.

    t3 = TCB(s3)
    t2 = TCB(s2, up(t3)) ... t0 = TCB(s0, up(t1))
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from tdrn_tpu.models.layers import FQConv, QConv, conv3x3

Dtype = Any


class TCB(nn.Module):
    """One transfer-connection block (256-channel output).

    quant=True runs conv1-3 as int8 QConvs (serving-only; see
    utils/quantize.quantize_backbone — the deconv stays in the compute dtype:
    it is a 2x2 kernel with a fraction of the convs' FLOPs). The post-add
    fused tensor is ``sow``-ed so the int8 calibration pass can read conv3's
    true input range (it is not any submodule's output); sow is a no-op
    outside capture_intermediates.
    """

    channels: int = 256
    dtype: Dtype = jnp.float32
    quant: bool = False
    # QAT: ((local_name, xscale), ...) for conv1/conv2/conv3 (FQConv).
    qat_scales: Any = None

    @nn.compact
    def __call__(self, x, deeper: Optional[jnp.ndarray] = None):
        c = self.channels
        if self.quant:
            conv = lambda name: QConv(c, (3, 3), dtype=self.dtype, name=name)
        elif self.qat_scales:
            qs = dict(self.qat_scales)
            conv = lambda name: FQConv(c, (3, 3), xscale=qs[name],
                                       dtype=self.dtype, name=name)
        else:
            conv = lambda name: conv3x3(c, dtype=self.dtype, name=name)
        x = nn.relu(conv("conv1")(x))
        x = conv("conv2")(x)
        if deeper is not None:
            up = nn.ConvTranspose(
                c, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv"
            )(deeper)
            x = x + up
        x = nn.relu(x)
        self.sow("intermediates", "fused", x)
        x = nn.relu(conv("conv3")(x))
        return x


class TopDownPyramid(nn.Module):
    """Apply TCBs deepest-first, threading the upsampled deeper feature."""

    num_scales: int = 4
    channels: int = 256
    dtype: Dtype = jnp.float32
    quant: bool = False
    # QAT: ((key, xscale), ...) with utils/quantize.py keys "tcb{k}/conv{i}".
    qat_scales: Any = None

    @nn.compact
    def __call__(self, sources: List[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(sources) == self.num_scales
        qs = dict(self.qat_scales) if self.qat_scales else None
        outs: List[jnp.ndarray] = [None] * self.num_scales  # type: ignore
        deeper = None
        for k in reversed(range(self.num_scales)):
            blk_qs = None
            if qs:
                pre = f"tcb{k}/"
                blk_qs = tuple(
                    (key[len(pre):], v) for key, v in qs.items()
                    if key.startswith(pre)
                )
            deeper = TCB(self.channels, dtype=self.dtype, quant=self.quant,
                         qat_scales=blk_qs, name=f"tcb{k}")(sources[k], deeper)
            outs[k] = deeper
        return outs
