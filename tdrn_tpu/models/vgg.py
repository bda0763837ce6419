"""VGG-16 (reduced-fc) backbone.

TPU-native re-design of the reference's ``vgg(base_cfg, 3)`` builder
(SURVEY.md §2 #9): the standard VGG-16 conv stack with the SSD/RefineDet
surgery — fc6/fc7 replaced by dilated conv6 + 1×1 conv7 — emitting the four
detection scales used by the ARM (SURVEY.md §3.4):

    conv4_3  (size/8,  512 ch)   e.g. 40×40 @320
    conv5_3  (size/16, 512 ch)        20×20
    conv7    (size/32, 1024 ch)       10×10   (after stride-2 pool5)
    conv6_2  (size/64, 512 ch)         5×5    (extra layers, SURVEY.md §2 #11)

Layout is NHWC throughout (TPU MXU-friendly); all pools divide the 320/512
inputs exactly so no ceil-mode special-casing is needed.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from flax.linen import initializers as nn_init

from tdrn_tpu.models.layers import FQConv, QConv, conv1x1, conv3x3

Dtype = Any

# (num_convs, channels) per VGG stage.
_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


# --- W-polyphase stage 1 (stem="poly") --------------------------------------
#
# The round-3 b8 trace pins conv1_2 (64 ch) as the hottest op at ~69 TFLOP/s:
# a 64-channel NHWC bf16 tensor fills only HALF of every (sublane, 128-lane)
# tile, so every load/store of stage 1 moves half-empty tiles. Decomposing
# the W axis into its two stride-2 phases fixes the lane occupancy with NO
# data movement: in NHWC, x[b,h,2j+px,c] viewed as xs[b,h,j,px*C+c] is a pure
# row-major reshape (W and C are adjacent), so "phase space" entry/exit are
# free bitcasts. A SAME 3x3 stride-1 conv then becomes, per OUTPUT phase, one
# (3 rows x 2 cols) conv over the 2C phase channels whose kernel is a fixed
# rearrangement of the original (zero taps make it exact):
#
#   out phase 0 (full-res col 2j):   window xs cols {j-1, j},  pad W (1, 0)
#   out phase 1 (full-res col 2j+1): window xs cols {j, j+1},  pad W (0, 1)
#
# Cost: 12 taps instead of 9 (1.33x FLOPs) for 2x lane occupancy on input
# reads (conv1_2: contraction 3*2*128=768). pool1 in phase space is a max
# over the px pair + row pairs. The kernel rearrangement runs in-graph on the
# (3,3,C,N) parameter (microseconds), so the PARAM TREE IS UNCHANGED — any
# conv-stem checkpoint serves (or trains: the mapping is differentiable) with
# stem="poly". Exactness: tests/test_model.py::test_poly_stem_exact.


def _wpoly_kernels(k):
    """(3,3,C,N) SAME stride-1 kernel -> two (3,2,2C,N) W-polyphase kernels."""
    z = jnp.zeros_like(k[:, 0])  # (3, C, N)
    k_p0 = jnp.stack(
        [
            jnp.concatenate([z, k[:, 0]], axis=1),  # xs col j-1: px0 unused, px1=k0
            jnp.concatenate([k[:, 1], k[:, 2]], axis=1),  # xs col j: px0=k1, px1=k2
        ],
        axis=1,
    )
    k_p1 = jnp.stack(
        [
            jnp.concatenate([k[:, 0], k[:, 1]], axis=1),  # xs col j
            jnp.concatenate([k[:, 2], z], axis=1),  # xs col j+1: px1 unused
        ],
        axis=1,
    )
    return k_p0, k_p1


def _wpoly_conv(xp, k, bias):
    """Phase-space SAME 3x3 conv: xp (B,H,W/2,2C) -> (B,H,W/2,2N)."""
    import jax

    k_p0, k_p1 = _wpoly_kernels(k.astype(xp.dtype))
    dn = ("NHWC", "HWIO", "NHWC")
    b = bias.astype(xp.dtype)
    y0 = jax.lax.conv_general_dilated(
        xp, k_p0, (1, 1), ((1, 1), (1, 0)), dimension_numbers=dn
    )
    y1 = jax.lax.conv_general_dilated(
        xp, k_p1, (1, 1), ((1, 1), (0, 1)), dimension_numbers=dn
    )
    # concat is px-major (c minor) == the phase-space channel convention.
    return jnp.concatenate([y0 + b, y1 + b], axis=-1)


def _wpoly2_conv(xp, k, bias):
    """poly2 variant: BOTH output phases from ONE symmetric (3,3)-window conv
    over phase space — full 2N-wide (128-lane at N=64) MXU outputs at 2x
    FLOPs (18 of 36 taps nonzero) instead of two half-wide convs at 1.33x.
    Which trade wins is an on-device question (NOTES.md round-4)."""
    import jax

    kk = k.astype(xp.dtype)
    z = jnp.zeros_like(kk[:, 0])  # (3, C, N)
    # Window xs cols {j-1, j, j+1}; out channels (px*N + n), px-major.
    # phase 0 (full-res 2j):  k0 @ (j-1,px1), k1 @ (j,px0), k2 @ (j,px1)
    # phase 1 (full-res 2j+1): k0 @ (j,px0), k1 @ (j,px1), k2 @ (j+1,px0)
    wcol0 = jnp.concatenate(
        [jnp.concatenate([z, z], axis=2), jnp.concatenate([kk[:, 0], z], axis=2)],
        axis=1,
    )  # (3, 2C, 2N): rows = (px0, px1) input blocks, cols = (ph0, ph1) outputs
    wcol1 = jnp.concatenate(
        [
            jnp.concatenate([kk[:, 1], kk[:, 0]], axis=2),
            jnp.concatenate([kk[:, 2], kk[:, 1]], axis=2),
        ],
        axis=1,
    )
    wcol2 = jnp.concatenate(
        [jnp.concatenate([z, kk[:, 2]], axis=2), jnp.concatenate([z, z], axis=2)],
        axis=1,
    )
    kp = jnp.stack([wcol0, wcol1, wcol2], axis=1)  # (3, 3, 2C, 2N)
    y = jax.lax.conv_general_dilated(
        xp, kp, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + jnp.concatenate([bias, bias]).astype(xp.dtype)


def _wpoly_stage1(x, k1, b1, k2, b2, conv=None):
    """conv1_1 + relu + conv1_2 + relu + pool1, entirely in W-phase space."""
    conv = conv or _wpoly_conv
    bb, hh, wd, c = x.shape
    xp = x.reshape(bb, hh, wd // 2, 2 * c)  # free (row-major view)
    yp = nn.relu(conv(xp, k1, b1))
    yp = nn.relu(conv(yp, k2, b2))
    n = yp.shape[-1] // 2
    y = jnp.max(yp.reshape(bb, hh, wd // 2, 2, n), axis=3)  # pool over px
    return jnp.max(y.reshape(bb, hh // 2, 2, wd // 2, n), axis=2)  # row pairs


class _ConvParams(nn.Module):
    """Declare conv kernel/bias params without an nn.Conv forward — the fused
    Pallas stem consumes them directly while keeping the parameter tree
    identical to the unfused stem (a checkpoint trained with stem="conv"
    serves with stem="fused" unchanged)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_uniform(), self.shape)
        b = self.param("bias", nn_init.zeros, (self.shape[-1],))
        return k, b


class VGG16Reduced(nn.Module):
    """VGG-16 with reduced-fc surgery; returns the 4 ARM source feature maps.

    ``width_mult`` scales every channel count (1.0 = the reference geometry);
    fractional widths are used by the test suite / sharding dry-runs to keep
    CPU compile times small while exercising the full topology.
    """

    dtype: Dtype = jnp.float32
    width_mult: float = 1.0
    # stem="s2d": space-to-depth the input 2x and run stage 1 at half spatial
    # resolution with 4x input channels, skipping pool1. Identical downstream
    # geometry, ~4x less activation traffic on the two most bandwidth-bound
    # layers (the classic TPU early-conv trick). Train-from-scratch only (not
    # weight-compatible with the reference stem).
    # stem="fused": stage 1 (conv1_1+relu+conv1_2+relu+pool1) runs as ONE
    # Pallas kernel (ops/stem_pallas.py) — weight-compatible with "conv"
    # (same param tree/geometry; bf16 compute, fp32 accumulate). Inference
    # profile: the kernel has no autodiff path.
    stem: str = "conv"
    # quant=True: every backbone conv runs as an int8 QConv (models/layers.py)
    # — serving-only, params produced by utils/quantize.quantize_backbone
    # from any fp32/bf16 checkpoint (+ a calibration pass for the static
    # activation scales). conv/s2d stems only.
    quant: bool = False
    # QAT fine-tuning (models/layers.FQConv): tuple of (conv_name, xscale)
    # pairs — every backbone conv runs fake-quantized on QConv's grids with
    # straight-through gradients. Param tree unchanged (fp32 masters).
    qat_scales: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        w = lambda c: max(8, int(c * self.width_mult))
        if self.quant:
            # conv + s2d both route stage 1 through c3() below; poly/fused
            # stems consume raw kernel params and stay unquantized.
            assert self.stem in ("conv", "s2d"), \
                "quant supports the conv/s2d stems only"

            def c3(n, name, stride=1, dilation=1):
                return QConv(n, (3, 3), stride=stride, dilation=dilation,
                             dtype=self.dtype, name=name)

            def c1(n, name):
                return QConv(n, (1, 1), dtype=self.dtype, name=name)
        elif self.qat_scales:
            assert self.stem in ("conv", "s2d"), \
                "qat supports the conv/s2d stems only"
            qs = dict(self.qat_scales)

            def c3(n, name, stride=1, dilation=1):
                return FQConv(n, (3, 3), stride=stride, dilation=dilation,
                              xscale=qs[name], dtype=self.dtype, name=name)

            def c1(n, name):
                return FQConv(n, (1, 1), xscale=qs[name], dtype=self.dtype,
                              name=name)
        else:
            def c3(n, name, stride=1, dilation=1):
                return conv3x3(n, stride=stride, dilation=dilation,
                               dtype=self.dtype, name=name)

            def c1(n, name):
                return conv1x1(n, dtype=self.dtype, name=name)
        sources = []
        start_stage = 0
        if self.stem == "s2d":
            b, h, wd, c = x.shape
            x = x.reshape(b, h // 2, 2, wd // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
        elif self.stem in ("poly", "poly2"):
            # W-polyphase stage 1 (module comment above): weight-compatible
            # with stem="conv" (identical param tree; kernels rearranged
            # in-graph), exact, full-lane stage-1 reads. poly = two (3,2)
            # convs at 1.33x FLOPs; poly2 = one (3,3) conv with full-width
            # outputs at 2x FLOPs.
            n1 = w(64)
            k1, b1 = _ConvParams((3, 3, x.shape[-1], n1), name="conv1_1")()
            k2, b2 = _ConvParams((3, 3, n1, n1), name="conv1_2")()
            conv = _wpoly2_conv if self.stem == "poly2" else _wpoly_conv
            # Compute in self.dtype like every other stem (conv3x3 casts its
            # input; _wpoly_conv follows the input's dtype) — otherwise an
            # fp32 input would silently run stage 1 in fp32 under the bf16
            # compute profile.
            x = _wpoly_stage1(x.astype(self.dtype), k1, b1, k2, b2, conv)
            start_stage = 1
        elif self.stem in ("fused", "fused2"):
            import jax

            from tdrn_tpu.ops.stem_pallas import fused_conv_stage, fused_stem_stage1

            # Interpret mode on any non-TPU backend (Mosaic is TPU-only).
            interp = jax.default_backend() != "tpu"
            n1 = w(64)
            k1, b1 = _ConvParams((3, 3, x.shape[-1], n1), name="conv1_1")()
            k2, b2 = _ConvParams((3, 3, n1, n1), name="conv1_2")()
            x = fused_stem_stage1(
                x, k1, b1, k2, b2, out_dtype=self.dtype, interpret=interp
            )
            start_stage = 1
            if self.stem == "fused2":  # also fuse stage 2 (64->128->128 + pool2)
                n2 = w(128)
                k3, b3 = _ConvParams((3, 3, n1, n2), name="conv2_1")()
                k4, b4 = _ConvParams((3, 3, n2, n2), name="conv2_2")()
                x = fused_conv_stage(
                    x, k3, b3, k4, b4, out_dtype=self.dtype, interpret=interp
                )
                start_stage = 2
        for si, (n, ch) in enumerate(_STAGES):
            if si < start_stage:
                continue
            for ci in range(n):
                x = c3(w(ch), f"conv{si + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            if si == 3:  # conv4_3 output (pre-pool4)
                sources.append(x)
            if si == 4:  # conv5_3 output (pre-pool5)
                sources.append(x)
            if si == 0 and self.stem == "s2d":
                pass  # stage 1 already ran at half resolution; skip pool1
            elif si < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # pool5: stride-2 (RefineDet geometry: fc7 scale = size/32).
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # fc6 -> dilated conv6, fc7 -> 1x1 conv7 (reduced-fc surgery).
        x = nn.relu(c3(w(1024), "conv6", dilation=3)(x))
        x = nn.relu(c1(w(1024), "conv7")(x))
        sources.append(x)
        # Extra layers: conv6_1 (1x1, 256) + conv6_2 (3x3, s2, 512) -> size/64.
        x = nn.relu(c1(w(256), "conv6_1")(x))
        x = nn.relu(c3(w(512), "conv6_2", stride=2)(x))
        sources.append(x)
        return sources
