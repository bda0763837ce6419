"""Post-training int8 quantization of the backbone (serving-only).

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

Covered backbones: VGG-16 (every conv, ``VGG_CONV_CHAIN``) and ResNet-101
(stem + every bottleneck conv1/conv2/conv3/proj + the extra stage,
``models/resnet.resnet_conv_chain``; the frozen-BN/GroupNorm affines stay in
the compute dtype — XLA fuses them into the conv epilogue, and every conv
input is still either the frame, a post-ReLU tensor, or a norm output whose
ReLU follows, so the same static-scale calibration applies). ``tcb=True``
extends to the TCB pyramid convs for either backbone; ``gru=True`` extends
to the temporal-cell convs (safe statically — the recurrent half of their
input is tanh-bounded; models/temporal.ConvGRUCell).

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
    percentile: float | None = None, tcb: bool = False, gru: bool = False,
) -> Dict[str, float]:
    """Per-conv max|input| from a calibration forward pass.

    ``frames``: (B, H, W, 3) PREPROCESSED (mean-subtracted fp32/bf16) frames —
    a handful of representative images is enough; activations beyond the
    calibrated max are clipped at serving time (standard PTQ behavior).

    ``percentile`` (e.g. 99.9) switches the statistic from the per-layer max
    to that percentile of the activation distribution — the standard PTQ
    lever when max-calibration's outlier sensitivity wastes the int8 range
    (finer steps for the bulk of values at the cost of clipping the tail).

    ``tcb=True`` also calibrates the TCB pyramid convs (keys
    ``tcb{k}/conv{1,2,3}``): conv1 reads the L2Norm outputs (scales 0/1,
    signed) or the backbone sources (2/3, post-relu); conv2 reads
    relu(conv1); conv3 reads the sow-ed post-add fused tensor (models/tcb.py).

    ``gru=True`` also calibrates the temporal-cell convs (keys
    ``gru{k}/gates|gate|cand``) from the sow-ed concat inputs
    (models/temporal.py). The hidden half of the concat is tanh-bounded
    (|h| <= 1 for every future frame), so the scale floors at 1.0 and the
    single zero-state calibration step covers the whole recurrence.
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

    def stat(x, signed=False):
        if percentile is None:
            # max(relu(x)) == max(x.max(), 0): no materialized copy needed.
            m = float(np.abs(x).max()) if signed else float(x.max())
            return max(m, 0.0)
        x = np.abs(x) if signed else np.maximum(x, 0.0)
        return max(float(np.percentile(x, percentile)), 0.0)

    def out(mod):  # a captured submodule's output
        return np.asarray(inter[mod]["__call__"][0], np.float32)

    scales: Dict[str, float] = {}
    if model.backbone == "vgg16":
        prev = None
        for name in VGG_CONV_CHAIN:
            if prev is None:
                scales[name] = stat(np.asarray(frames, np.float32), signed=True)
            else:
                scales[name] = stat(out(prev))  # input = relu(prev's output)
            prev = name
        # TCB conv1 inputs for the two deep (non-L2Norm) scales.
        deep_src = (lambda: stat(out("conv7")), lambda: stat(out("conv6_2")))
    elif model.backbone == "resnet101":
        from tdrn_tpu.models.resnet import _DEPTHS

        scales["stem"] = stat(np.asarray(frames, np.float32), signed=True)
        # stem_bn's output feeds relu+maxpool (both max-preserving) -> stage1_0
        prev = stat(out("stem_bn"))
        blocks = _DEPTHS[101]
        for si, n in enumerate(blocks, start=1):
            for bi in range(n):
                nm = f"stage{si}_{bi}"
                blk = inter[nm]
                scales[f"{nm}/conv1"] = prev
                if bi == 0:  # shortcut conv reads the same block input
                    scales[f"{nm}/proj"] = prev
                # conv2/conv3 inputs are relu(bn1/bn2 output)
                scales[f"{nm}/conv2"] = stat(
                    np.asarray(blk["bn1"]["__call__"][0], np.float32)
                )
                scales[f"{nm}/conv3"] = stat(
                    np.asarray(blk["bn2"]["__call__"][0], np.float32)
                )
                prev = stat(out(nm))  # block output (post-relu)
        scales["extra1"] = prev  # = C5
        scales["extra2"] = stat(out("extra1"))  # input = relu(extra1 output)
        deep_src = (lambda: scales["extra1"],  # C5 feeds tcb2
                    lambda: stat(out("extra2")))  # relu(extra2) feeds tcb3
    else:
        raise ValueError(f"int8 calibration: unknown backbone {model.backbone}")
    if tcb:
        root = mods["intermediates"]
        tcb_inter = root["tcb"]
        n = len(model.cfg.feature_maps)
        for k in range(n):
            blk = tcb_inter[f"tcb{k}"]
            if k < 2:  # L2Norm-ed shallow scales: signed input
                src = stat(np.asarray(root[f"l2norm{k}"]["__call__"][0],
                                      np.float32), signed=True)
            else:
                src = deep_src[k - 2]()
            scales[f"tcb{k}/conv1"] = src
            scales[f"tcb{k}/conv2"] = stat(
                np.asarray(blk["conv1"]["__call__"][0], np.float32)
            )
            scales[f"tcb{k}/conv3"] = stat(np.asarray(blk["fused"][0],
                                                      np.float32))
    if gru:
        if not model.temporal:
            raise ValueError("gru=True needs a temporal model")
        from tdrn_tpu.models.temporal import cell_kind

        tinter = mods["intermediates"]["temporal"]
        for k in range(len(model.cfg.feature_maps)):
            cell = tinter[f"gru{k}"]
            xh = stat(np.asarray(cell["xh"][0], np.float32), signed=True)
            if cell_kind(model.temporal_cell, k) == "convgru":
                xrh = stat(np.asarray(cell["xrh"][0], np.float32), signed=True)
                scales[f"gru{k}/gates"] = max(xh, 1.0)
                scales[f"gru{k}/cand"] = max(xrh, 1.0)
            else:  # light: gate reads xh; cand reads the (signed) dw output
                dw = stat(
                    np.asarray(cell["dw"]["__call__"][0], np.float32),
                    signed=True,
                )
                scales[f"gru{k}/gate"] = max(xh, 1.0)
                scales[f"gru{k}/cand"] = max(dw, 1.0)
    return {k: max(v, 1e-6) * headroom for k, v in scales.items()}


def _quantize_conv(sub: Dict[str, Any], xscale: float) -> Dict[str, Any]:
    sub = dict(sub)
    k = np.asarray(sub["kernel"], np.float32)
    ws = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0) / 127.0
    ws = np.maximum(ws, 1e-12)
    sub["kernel"] = jnp.asarray(
        np.clip(np.round(k / ws), -127, 127).astype(np.int8)
    )
    sub["wscale"] = jnp.asarray(ws, dtype=jnp.float32)
    sub["xscale"] = jnp.asarray(np.float32(xscale))
    sub["bias"] = jnp.asarray(np.asarray(sub["bias"], np.float32))
    return sub


_TCB_KEY = r"tcb\d+/conv[123]"
_GRU_KEY = r"gru\d+/(gates|gate|cand)"


def _is_tcb_key(name: str) -> bool:
    import re

    return re.fullmatch(_TCB_KEY, name) is not None


def _is_gru_key(name: str) -> bool:
    import re

    return re.fullmatch(_GRU_KEY, name) is not None


def quantize_backbone_params(variables: Any, act_scales: Dict[str, float]):
    """fp32/bf16 conv params -> int8 kernel + wscale + xscale.

    Keys are backbone conv paths relative to ``params["backbone"]`` (VGG
    ``conv3_1``; ResNet ``stem`` / ``stage2_0/conv1`` / ``extra2``) or TCB
    convs (``tcb{k}/conv{i}``, quantized under ``params["tcb"]``).
    """
    frozen = type(variables).__name__ == "FrozenDict"
    plain = dict(variables)
    params = dict(plain["params"])
    backbone = dict(params["backbone"])
    tcb = dict(params["tcb"]) if "tcb" in params else {}
    temporal = dict(params["temporal"]) if "temporal" in params else {}
    for name, xscale in act_scales.items():
        if _is_tcb_key(name) or _is_gru_key(name):
            root = tcb if _is_tcb_key(name) else temporal
            blk_name, conv_name = name.split("/")
            blk = dict(root[blk_name])
            blk[conv_name] = _quantize_conv(blk[conv_name], xscale)
            root[blk_name] = blk
        elif "/" in name:  # nested backbone conv (resnet bottleneck)
            blk_name, conv_name = name.split("/")
            blk = dict(backbone[blk_name])
            blk[conv_name] = _quantize_conv(blk[conv_name], xscale)
            backbone[blk_name] = blk
        else:
            backbone[name] = _quantize_conv(backbone[name], xscale)
    params["backbone"] = backbone
    if tcb:
        params["tcb"] = tcb
    if temporal:
        params["temporal"] = temporal
    out = dict(plain)
    out["params"] = params
    if frozen:
        from flax.core import freeze

        out = freeze(out)
    return out


def _validate_gru_keys(model, act_scales: Dict[str, float]) -> None:
    """Check gru scale-key names match the model's per-scale cell kinds.

    A scales file calibrated on one temporal cell applied to another (e.g. a
    convgru-calibrated ``gru0/gates`` fed to a hybrid model whose scale 0 is a
    LightGRU expecting ``gru0/gate``) would otherwise surface as an opaque
    KeyError inside the cell's init (ADVICE r4). ConvGRU scales are
    ``gru{k}/gates`` + ``gru{k}/cand``; LightGRU's are ``gru{k}/gate`` +
    ``gru{k}/cand``.
    """
    import re

    if not model.temporal:
        return  # apply_int8_backbone/apply_qat raise their own error for this
    from tdrn_tpu.models.temporal import cell_kind

    by_scale: Dict[int, set] = {}
    for key in act_scales:
        m = re.fullmatch(_GRU_KEY, key)
        if m:
            k = int(key[len("gru"):key.index("/")])
            by_scale.setdefault(k, set()).add(key.split("/", 1)[1])
    for k, got in sorted(by_scale.items()):
        kind = cell_kind(model.temporal_cell, k)
        want = {"gates", "cand"} if kind == "convgru" else {"gate", "cand"}
        if got != want:
            raise ValueError(
                f"gru scale keys for scale {k} are gru{k}/{sorted(got)} but "
                f"the model's cell there is {kind!r} (temporal_cell="
                f"{model.temporal_cell!r}), which needs gru{k}/{sorted(want)}"
                " — the scales file was calibrated on a different cell kind"
            )


def apply_int8_backbone(model, variables, calib_frames: Any = None,
                        headroom: float = 1.0,
                        act_scales: Dict[str, float] | None = None,
                        tcb: bool = False, gru: bool = False):
    """Calibrate + quantize: returns (quant model, transformed variables).

    ``calib_frames`` must be preprocessed like serving inputs (the in-graph
    ``ops/preprocess.py`` output). Alternatively pass pre-computed
    ``act_scales`` (e.g. loaded via :func:`load_act_scales` from a calibration
    done offline with ``eval.py --precision int8 --save_scales``). Compose
    AFTER the bf16 profile — the quantizer re-derives f32 scales from whatever
    weight dtype it's given.
    """
    if model.backbone == "vgg16":
        # s2d is a value-preserving reshape of the input, so the calibration
        # chain (conv1_1 input = the frame; conv1_2 input = relu(conv1_1)) is
        # unchanged — stage-1 convs quantize exactly like the conv stem's.
        # poly/fused stems consume raw kernel params and are not supported.
        if model.stem not in ("conv", "s2d"):
            raise ValueError(
                "int8 vgg16 backbone supports the conv/s2d stems only"
            )
    elif model.backbone != "resnet101":
        raise ValueError(f"int8 backbone: unsupported {model.backbone!r}")
    if getattr(model, "fold_mean", False):
        # The folded mean taps are ~100x the rgb taps, so a per-output-channel
        # weight scale would crush the rgb taps to a few int8 steps.
        raise ValueError("int8 backbone is incompatible with fold_mean")
    if act_scales is None:
        if calib_frames is None:
            raise ValueError("need calib_frames or act_scales")
        act_scales = calibrate_act_scales(
            model, variables, calib_frames, headroom, tcb=tcb, gru=gru
        )
    else:
        # The scales file declares its scope.
        tcb = any(_is_tcb_key(k) for k in act_scales)
        gru = any(_is_gru_key(k) for k in act_scales)
        missing = sorted(set(expected_conv_keys(model)) - set(act_scales))
        if missing:
            shown = missing[:5] + (["..."] if len(missing) > 5 else [])
            raise ValueError(
                f"act_scales missing convs for backbone "
                f"{model.backbone!r}: {shown}"
            )
        if gru:
            _validate_gru_keys(model, act_scales)
    if gru and not model.temporal:
        raise ValueError("gru int8 scales need a temporal model")
    return (model.clone(quant=True, quant_tcb=tcb, quant_gru=gru),
            quantize_backbone_params(variables, act_scales))


def apply_qat(model, act_scales: Dict[str, float]):
    """Clone the model for QAT fine-tuning on the given calibrated scales.

    The train-time twin of :func:`apply_int8_backbone`: every conv the int8
    serving profile would quantize runs fake-quantized (models/layers.FQConv)
    on the SAME grids — per-out-channel weight steps derived in-graph from the
    fp32 masters, static activation scale from ``act_scales`` — with
    straight-through gradients. Which subsystems fake-quantize follows the
    keys present (tcb/gru extensions), exactly like the scales-file serving
    path. Params/checkpoints stay plain fp32; serve the result with
    ``--precision int8 --int8_scales <same file>``.
    """
    if model.backbone == "vgg16":
        if model.stem not in ("conv", "s2d"):
            raise ValueError("qat supports the conv/s2d stems only")
    elif model.backbone != "resnet101":
        raise ValueError(f"qat: unsupported backbone {model.backbone!r}")
    missing = sorted(set(expected_conv_keys(model)) - set(act_scales))
    if missing:
        shown = missing[:5] + (["..."] if len(missing) > 5 else [])
        raise ValueError(
            f"qat scales missing convs for backbone {model.backbone!r}: {shown}"
        )
    if any(_is_gru_key(k) for k in act_scales) and not model.temporal:
        raise ValueError("gru qat scales need a temporal model")
    _validate_gru_keys(model, act_scales)
    bad = {k: v for k, v in act_scales.items() if not (float(v) > 0)}
    if bad:
        raise ValueError(f"qat: non-positive activation scales {bad}")
    return model.clone(
        qat_scales=tuple(sorted((k, float(v)) for k, v in act_scales.items()))
    )


def expected_conv_keys(model) -> Sequence[str]:
    """The backbone conv-scale keys this model's int8 profile requires."""
    if model.backbone == "vgg16":
        return VGG_CONV_CHAIN
    from tdrn_tpu.models.resnet import resnet_conv_chain

    return tuple(resnet_conv_chain(101))


def save_act_scales(path: str, scales: Dict[str, float]) -> None:
    """Persist calibrated activation scales (json) for offline serving."""
    import json

    with open(path, "w") as f:
        json.dump({k: float(v) for k, v in scales.items()}, f, indent=1)


def load_act_scales(path: str) -> Dict[str, float]:
    import json

    import re

    with open(path) as f:
        scales = json.load(f)
    if "stem" in scales:  # resnet family (completeness checked vs the model
        # in apply_int8_backbone via expected_conv_keys)
        pat = (r"stem|extra[12]|stage\d+_\d+/(conv[123]|proj)|"
               + _TCB_KEY + "|" + _GRU_KEY)
        known = set()
    else:  # vgg family: the full chain is static, check it here
        pat = _TCB_KEY + "|" + _GRU_KEY
        known = set(VGG_CONV_CHAIN)
    missing = known - set(scales)
    extra = {
        k for k in set(scales) - known if not re.fullmatch(pat, k)
    }
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
