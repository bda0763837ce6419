"""Post-training int8 quantization of the VGG backbone (serving-only).

The round-3 b8 trace (BENCH.md) shows the step dominated by MXU/tiling-bound
backbone convs (5.26 of 7.53 ms). The v5e MXU runs s8 x s8 -> s32 at 2x its
bf16 rate, so an int8 backbone is the largest remaining throughput lever that
doesn't change the model. This module produces the parameters for
``models/layers.QConv`` (see its docstring for the numerics) from any
fp32/bf16 checkpoint:

  * weights: symmetric per-output-channel, step ``wscale = max|w|/127`` —
    sub-percent weight error, no calibration needed;
  * activations: symmetric per-tensor with a STATIC scale calibrated from
    sample frames (max|input| per conv, exploiting that every conv input is
    post-ReLU so the chain of conv-output maxima determines them). Static
    scales keep the in-graph quantization a fused elementwise pass — no
    runtime reductions.

Quality is gated on the synthetic fidelity harnesses (mAP delta vs the bf16
profile) before any adoption; like every serving transform the checkpoint on
disk stays fp32.

Typical composition (the int8 serving profile)::

    model, variables = apply_inference_precision(model, variables, "bf16")
    model, variables = apply_int8_backbone(model, variables, calib_frames)
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np
import jax.numpy as jnp

# Backbone conv chain in dataflow order (models/vgg.py): each conv's input is
# relu(previous conv's output) — max-pools between them don't change the max —
# except conv1_1, whose input is the preprocessed frame itself.
VGG_CONV_CHAIN: Sequence[str] = (
    "conv1_1", "conv1_2",
    "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
    "conv6", "conv7", "conv6_1", "conv6_2",
)


def calibrate_act_scales(
    model, variables, frames: Any, headroom: float = 1.0,
    percentile: float | None = None,
) -> Dict[str, float]:
    """Per-conv max|input| from a calibration forward pass.

    ``frames``: (B, H, W, 3) PREPROCESSED (mean-subtracted fp32/bf16) frames —
    a handful of representative images is enough; activations beyond the
    calibrated max are clipped at serving time (standard PTQ behavior).

    ``percentile`` (e.g. 99.9) switches the statistic from the per-layer max
    to that percentile of the activation distribution — the standard PTQ
    lever when max-calibration's outlier sensitivity wastes the int8 range
    (finer steps for the bulk of values at the cost of clipping the tail).
    """
    frames = frames[:8]  # capture_intermediates holds EVERY activation alive;
    # 8 frames bound the footprint (and the host fetch) at any input size.
    if getattr(model, "chunk", 1) > 1:
        # Chunked streaming models expect (chunk*B) inputs with B-sized state;
        # the backbone params are identical at chunk=1, so calibrate there.
        model = model.clone(chunk=1)
    state = model.zero_state(frames.shape[0]) if model.temporal else None
    _, mods = model.apply(
        variables, frames, state, capture_intermediates=True
    )
    inter = mods["intermediates"]["backbone"]
    outs = {
        k: np.asarray(v["__call__"][0], np.float32)
        for k, v in inter.items()
        if k.startswith("conv")
    }
    scales: Dict[str, float] = {}
    prev = None
    for name in VGG_CONV_CHAIN:
        if prev is None:
            a = np.abs(np.asarray(frames, np.float32))
            m = float(a.max() if percentile is None else np.percentile(a, percentile))
        elif percentile is None:
            m = max(float(outs[prev].max()), 0.0)  # input = relu(prev), no copy
        else:
            m = max(
                float(np.percentile(np.maximum(outs[prev], 0.0), percentile)),
                0.0,
            )
        scales[name] = max(m, 1e-6) * headroom
        prev = name
    return scales


def quantize_backbone_params(variables: Any, act_scales: Dict[str, float]):
    """fp32/bf16 backbone conv params -> int8 kernel + wscale + xscale."""
    frozen = type(variables).__name__ == "FrozenDict"
    plain = dict(variables)
    params = dict(plain["params"])
    backbone = dict(params["backbone"])
    for name, xscale in act_scales.items():
        sub = dict(backbone[name])
        k = np.asarray(sub["kernel"], np.float32)
        ws = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0) / 127.0
        ws = np.maximum(ws, 1e-12)
        sub["kernel"] = jnp.asarray(
            np.clip(np.round(k / ws), -127, 127).astype(np.int8)
        )
        sub["wscale"] = jnp.asarray(ws, dtype=jnp.float32)
        sub["xscale"] = jnp.asarray(np.float32(xscale))
        sub["bias"] = jnp.asarray(np.asarray(sub["bias"], np.float32))
        backbone[name] = sub
    params["backbone"] = backbone
    out = dict(plain)
    out["params"] = params
    if frozen:
        from flax.core import freeze

        out = freeze(out)
    return out


def apply_int8_backbone(model, variables, calib_frames: Any = None,
                        headroom: float = 1.0,
                        act_scales: Dict[str, float] | None = None):
    """Calibrate + quantize: returns (quant model, transformed variables).

    ``calib_frames`` must be preprocessed like serving inputs (the in-graph
    ``ops/preprocess.py`` output). Alternatively pass pre-computed
    ``act_scales`` (e.g. loaded via :func:`load_act_scales` from a calibration
    done offline with ``eval.py --precision int8 --save_scales``). Compose
    AFTER the bf16 profile — the quantizer re-derives f32 scales from whatever
    weight dtype it's given.
    """
    if model.backbone != "vgg16" or model.stem != "conv":
        raise ValueError("int8 backbone supports the vgg16 conv stem only")
    if getattr(model, "fold_mean", False):
        # The folded mean taps are ~100x the rgb taps, so a per-output-channel
        # weight scale would crush the rgb taps to a few int8 steps.
        raise ValueError("int8 backbone is incompatible with fold_mean")
    if act_scales is None:
        if calib_frames is None:
            raise ValueError("need calib_frames or act_scales")
        act_scales = calibrate_act_scales(model, variables, calib_frames, headroom)
    return (model.clone(quant=True),
            quantize_backbone_params(variables, act_scales))


def save_act_scales(path: str, scales: Dict[str, float]) -> None:
    """Persist calibrated activation scales (json) for offline serving."""
    import json

    with open(path, "w") as f:
        json.dump({k: float(v) for k, v in scales.items()}, f, indent=1)


def load_act_scales(path: str) -> Dict[str, float]:
    import json

    with open(path) as f:
        scales = json.load(f)
    missing = set(VGG_CONV_CHAIN) - set(scales)
    extra = set(scales) - set(VGG_CONV_CHAIN)
    if missing or extra:
        raise ValueError(
            f"scales file {path}: missing convs {sorted(missing)}, "
            f"unknown convs {sorted(extra)}"
        )
    bad = {k: v for k, v in scales.items() if not (float(v) > 0)}
    if bad:
        # A zero/NaN scale would make QConv compute 127/0 -> inf -> int8
        # garbage with no error — reject the file instead.
        raise ValueError(f"scales file {path}: non-positive scales {bad}")
    return {k: float(v) for k, v in scales.items()}
