"""Inference precision: resident-bf16 weights with fp32 heads/detect.

Round 2 measured that flax ``dtype=bfloat16`` alone makes inference SLOWER
than fp32 (BENCH.md: fast-profile b8 7.82 vs 6.72 ms): flax stores params in
``param_dtype`` (fp32 by default), so every step re-casts all ~35M weights
fp32->bf16 before each conv — pure added HBM traffic on a model that is
bandwidth-bound, while XLA already runs the fp32 convs through bf16 MXU
passes.

The TPU-native design is *resident* bf16 (SURVEY.md §6 rebuild-target row,
VERDICT round-2 item 1): convert the backbone/TCB/temporal/offset weights to
bf16 ONCE at load — halving their HBM footprint and per-step read traffic —
while keeping the ARM/ODM prediction heads, the L2Norm scales, and the whole
detect path (decode/softmax/NMS) in fp32. The streaming temporal carry also
becomes bf16, halving the donated-state traffic.

Numerical notes:
  * uint8 pixels and the integer pixel means (123/117/104) are exactly
    representable in bf16 (8 mantissa bits cover integers up to 256), so the
    bf16 preprocess is lossless.
  * The fp32 heads read bf16 features: flax ``promote_dtype`` upcasts the
    activations, so head matmuls accumulate and emit fp32 logits — detect/NMS
    numerics are full fp32 downstream of the feature pyramid.
  * Training is unaffected: fp32 masters always; this is a load-time,
    inference-only transform (the checkpoint on disk stays fp32).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

# Top-level subtrees of params["params"] kept in fp32: the prediction heads
# (their logits feed detect directly) and the L2Norm scales (tiny; L2Norm
# computes in fp32 internally regardless).
FP32_SUBTREES: Tuple[str, ...] = ("arm", "odm", "l2norm0", "l2norm1")


def _cast_tree(tree: Any, dtype) -> Any:
    import jax

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, tree)


def cast_params_bf16(variables: Any, keep_fp32: Tuple[str, ...] = FP32_SUBTREES):
    """Cast float params to resident bf16, keeping ``keep_fp32`` subtrees fp32.

    ``variables`` is a flax variables dict ``{"params": {module: subtree}}``
    (FrozenDict or plain dict); returns the same container type.
    """
    frozen = type(variables).__name__ == "FrozenDict"
    plain = dict(variables) if frozen else variables
    params = dict(plain["params"])
    for name, subtree in params.items():
        if name not in keep_fp32:
            params[name] = _cast_tree(subtree, jnp.bfloat16)
    out = dict(plain)
    out["params"] = params
    if frozen:
        from flax.core import freeze

        out = freeze(out)
    return out


def bf16_inference_model(model):
    """Clone a detector for resident-bf16 inference (bf16 compute + carry,
    fp32 heads). Pair with :func:`cast_params_bf16` on the restored params."""
    return model.clone(dtype=jnp.bfloat16, head_dtype=jnp.float32)


def apply_inference_precision(model, variables, precision: str):
    """('fp32' | 'bf16') -> possibly-transformed (model, variables)."""
    if precision in (None, "fp32", "float32"):
        return model, variables
    if precision in ("bf16", "bfloat16"):
        return bf16_inference_model(model), cast_params_bf16(variables)
    raise ValueError(f"unknown inference precision {precision!r}")


# --- Mean-fold: absorb the preprocess mean-subtract into conv1_1 ------------
#
# The streaming step's elementwise (x - mean) pass costs a full HBM
# read+write over the frame plus a layout copy before conv1_1 (BENCH.md
# round-2 trace: ~0.27 ms of "formatting" in a 1.7 ms b1 step). Fold it away
# EXACTLY: feed raw pixels plus a constant all-ones 4th channel, and extend
# conv1_1's kernel with a channel whose taps are -sum_c k[...,c,:]*mean[c].
#
#   conv(x - m) = conv(x) - conv(m)  and the ones channel is zero-padded at
#   the borders exactly like x, so border cells see the partial-tap sum
#   -sum_{valid taps} k*m — identical to zero-padding the mean-subtracted
#   input. Bit-level equality up to float reassociation.
#
# Works for both stems: with stem="s2d" the space-to-depth reshape interleaves
# the ones channel per spatial position ((py,px,c) channel order), so the
# trained (3,3,4*3,N) kernel maps position-wise into (3,3,4*4,N).
# Inference-only (training feeds pre-normalized augmented frames); the
# checkpoint on disk keeps the 3-channel kernel.


def fold_mean_params(variables: Any, cfg, stem: str = "conv"):
    """Rewrite backbone/conv1_1 for 4-channel (rgb + ones) input."""
    import numpy as np

    frozen = type(variables).__name__ == "FrozenDict"
    plain = dict(variables) if frozen else dict(variables)
    params = dict(plain["params"])
    backbone = dict(params["backbone"])
    conv = dict(backbone["conv1_1"])
    k = np.asarray(conv["kernel"], np.float32)
    mean = np.asarray(cfg.pixel_means, np.float32)
    kh, kw, cin, cout = k.shape
    if stem == "s2d":
        assert cin % 3 == 0, cin
        pos = cin // 3  # spatial positions folded into channels (4 for 2x2)
        k4 = np.zeros((kh, kw, 4 * pos, cout), np.float32)
        for p in range(pos):
            k4[:, :, 4 * p : 4 * p + 3, :] = k[:, :, 3 * p : 3 * p + 3, :]
            k4[:, :, 4 * p + 3, :] = -np.einsum(
                "hwcn,c->hwn", k[:, :, 3 * p : 3 * p + 3, :], mean
            )
    else:
        assert cin == 3, cin
        k4 = np.concatenate(
            [k, -np.einsum("hwcn,c->hwn", k, mean)[:, :, None, :]], axis=2
        )
    conv["kernel"] = jnp.asarray(k4, dtype=np.asarray(conv["kernel"]).dtype)
    backbone["conv1_1"] = conv
    params["backbone"] = backbone
    out = dict(plain)
    out["params"] = params
    if frozen:
        from flax.core import freeze

        out = freeze(out)
    return out


def pad_stem_params(variables: Any, pad_to: int):
    """Zero-pad backbone/conv1_1's input channels to ``pad_to`` (exact: the
    new kernel channels are zero, and the model feeds zeros there)."""
    import numpy as np

    frozen = type(variables).__name__ == "FrozenDict"
    plain = dict(variables) if frozen else dict(variables)
    params = dict(plain["params"])
    backbone = dict(params["backbone"])
    conv = dict(backbone["conv1_1"])
    k = np.asarray(conv["kernel"])
    kh, kw, cin, cout = k.shape
    assert cin < pad_to, (cin, pad_to)
    kp = np.zeros((kh, kw, pad_to, cout), k.dtype)
    kp[:, :, :cin, :] = k
    conv["kernel"] = jnp.asarray(kp)
    backbone["conv1_1"] = conv
    params["backbone"] = backbone
    out = dict(plain)
    out["params"] = params
    if frozen:
        from flax.core import freeze

        out = freeze(out)
    return out


def apply_pad_stem(model, variables, pad_to: int = 8):
    """Clone the model to zero-pad the stem input to ``pad_to`` channels and
    pad conv1_1's kernel to match (exact). Perf experiment for XLA's
    small-channel conv rewrite — conv stem only (s2d interleaves channels
    spatially, so its padding would need a position-wise kernel map)."""
    if model.backbone != "vgg16" or model.stem != "conv":
        raise ValueError("pad_stem supports the vgg16 conv stem only")
    return model.clone(pad_stem=pad_to), pad_stem_params(variables, pad_to)


def apply_fold_mean(model, variables):
    """Clone the model for raw-pixel (rgb+ones) input + fold conv1_1.

    VGG backbones only (the flagship); composes with bf16 (fold first or
    after — the transform preserves dtype)."""
    if model.backbone != "vgg16":
        raise ValueError("fold_mean supports the vgg16 backbone only")
    if model.stem in ("fused", "fused2"):
        raise ValueError("fold_mean + fused Pallas stem not supported")
    return (
        model.clone(fold_mean=True),
        fold_mean_params(variables, model.cfg, model.stem),
    )
