"""ARM / ODM prediction heads.

TPU-native re-design of the reference's multibox heads (SURVEY.md §2 #12, #14):
per-scale 3×3 convs emitting (A·4) box offsets and (A·num_outputs) logits. The
reference permutes NCHW->NHWC then flattens; we are NHWC natively, so the
(B, H, W, A·D) output reshapes directly to (B, H·W·A, D) in prior order —
matching the row-major cell order of ``ops/priors.py``.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdrn_tpu.models.layers import conv3x3

Dtype = Any


class MultiBoxHead(nn.Module):
    """Per-scale loc + conf heads; concatenates across scales in prior order."""

    num_outputs: int  # 2 for ARM objectness, num_classes for ODM
    anchors_per_cell: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        locs, confs = [], []
        for k, x in enumerate(feats):
            a = self.anchors_per_cell[k]
            b = x.shape[0]
            loc = conv3x3(a * 4, dtype=self.dtype, name=f"loc{k}")(x)
            conf = conv3x3(a * self.num_outputs, dtype=self.dtype, name=f"conf{k}")(x)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, self.num_outputs))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)
