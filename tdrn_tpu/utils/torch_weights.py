"""Pretrained-weight surgery: torch VGG-16 checkpoints -> flax params.

Rebuild of the reference's weight-init path (SURVEY.md §2 #25): the reference
loads ``vgg16_reducedfc.pth`` (an ssd.pytorch-heritage ``nn.Sequential`` state
dict with integer layer keys) into its VGG base and xavier-inits the rest.
Here the converter maps either that layout or a torchvision ``vgg16`` state
dict onto our ``backbone`` parameter tree (NHWC: torch OIHW kernels transpose
to HWIO). New layers keep their xavier init (models/layers.py).

Torch-cpu is only imported inside the functions, so the framework has no hard
torch dependency.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# ssd.pytorch reduced-fc Sequential index -> our backbone module name.
_REDUCEDFC_MAP = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
    31: "conv6", 33: "conv7",
}

# torchvision vgg16 .features index -> our backbone conv name (conv6/7 absent).
_TORCHVISION_MAP = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def vgg_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Detect the layout and produce {conv_name: {kernel, bias}} (HWIO)."""
    keys = set(sd.keys())
    if any(k.startswith("features.") for k in keys):
        idx_map = _TORCHVISION_MAP
        prefix = "features."
    else:
        idx_map = _REDUCEDFC_MAP
        prefix = ""
    out = {}
    for idx, name in idx_map.items():
        wk, bk = f"{prefix}{idx}.weight", f"{prefix}{idx}.bias"
        if wk not in sd:
            continue
        out[name] = {
            "kernel": _oihw_to_hwio(np.asarray(sd[wk], np.float32)),
            "bias": np.asarray(sd[bk], np.float32),
        }
    return out


# ---------------------------------------------------------------------------
# Full-model grafting (both directions) against the torch mirror
# (utils/torch_mirror.py). Mirror module attribute names equal our flax module
# names, so the mapping is purely mechanical: join the flax tree path with "."
# and convert kernel layouts:
#   conv    kernel: flax HWIO            <-> torch OIHW
#   deconv  kernel: flax (kH,kW,in,out)  <-> torch (in,out,kH,kW) spatially
#           FLIPPED (lax.conv_transpose correlates with the un-flipped kernel;
#           torch's ConvTranspose2d scatters it — verified numerically in
#           tests/test_torch_parity.py).
#   scale/bias vectors: identical.
# ---------------------------------------------------------------------------


def _flatten_tree(tree, prefix=()):
    """Yield (path_tuple, leaf) for a nested flax param dict."""
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten_tree(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _kernel_to_torch(path, k: np.ndarray) -> np.ndarray:
    if "deconv" in path:
        return np.transpose(k[::-1, ::-1], (2, 3, 0, 1)).copy()
    return np.transpose(k, (3, 2, 0, 1))


def _kernel_from_torch(path, w: np.ndarray) -> np.ndarray:
    if "deconv" in path:
        return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
    return np.transpose(w, (2, 3, 1, 0))


def _torch_key(path) -> str:
    mods, leaf = path[:-1], path[-1]
    suffix = "weight" if leaf == "kernel" else leaf
    return ".".join(mods) + "." + suffix


def flax_to_torch_state(params) -> Dict[str, "np.ndarray"]:
    """Flax variables -> a torch-mirror ``state_dict``-shaped numpy dict."""
    tree = params["params"] if "params" in params else params
    out = {}
    for path, leaf in _flatten_tree(tree):
        v = np.asarray(leaf, np.float32)
        if path[-1] == "kernel":
            v = _kernel_to_torch(path, v)
        out[_torch_key(path)] = v
    return out


def torch_state_to_flax(sd: Dict[str, np.ndarray], template):
    """Torch-mirror state dict -> flax variables shaped like ``template``.

    Every template leaf must be present in ``sd`` (full-model graft — the
    point is end-to-end parity, so silent partial loads are an error).
    """
    tree = template["params"] if "params" in template else template

    def build(sub, prefix):
        out = {}
        for k, v in sub.items():
            path = prefix + (k,)
            if isinstance(v, dict):
                out[k] = build(v, path)
                continue
            key = _torch_key(path)
            if key not in sd:
                raise KeyError(f"torch state dict missing {key} (flax {path})")
            w = np.asarray(sd[key], np.float32)
            if k == "kernel":
                w = _kernel_from_torch(path, w)
            if tuple(w.shape) != tuple(v.shape):
                raise ValueError(f"{key}: shape {w.shape} != template {tuple(v.shape)}")
            out[k] = w
        return out

    new_tree = build(tree, ())
    return {"params": new_tree} if "params" in template else new_tree


def load_torch_mirror_from_flax(torch_model, params):
    """Copy flax params into a TorchTDRN mirror in place."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in flax_to_torch_state(params).items()}
    torch_model.load_state_dict(state)
    return torch_model


def flax_from_torch_mirror(torch_model, template):
    """Build flax variables (shaped like ``template``) from a TorchTDRN mirror."""
    sd = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
    return torch_state_to_flax(sd, template)


# ---------------------------------------------------------------------------
# torchvision ResNet-50/101/152 -> our models/resnet.py ResNetBackbone.
#
# The reference fine-tunes a torchvision/caffe ResNet-101 with frozen BN
# (SURVEY.md §2 #17). Our FrozenBN is a per-channel affine, so pretrained
# BatchNorm folds EXACTLY:  scale = gamma / sqrt(running_var + eps),
# bias = beta - running_mean * scale  (eps = 1e-5, torchvision default).
# Convs in torchvision resnets are bias-free; our nn.Conv biases are set to 0.
# torchvision key layout:  conv1 / bn1 / layer{1..4}.{i}.conv{1..3} /
# layer{1..4}.{i}.bn{1..3} / layer{1..4}.{i}.downsample.{0,1}.
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str):
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float64)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float64)
    scale = gamma / np.sqrt(var + _BN_EPS)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _resnet_torch_prefix(path):
    """Our backbone-relative module path -> torchvision key prefix (or None)."""
    mod = path[0]
    if mod == "stem":
        return "conv1"
    if mod == "stem_bn":
        return "bn1"
    if mod.startswith("stage"):
        stage, block = mod[len("stage"):].split("_")
        sub = path[1]
        if sub.startswith("conv"):
            return f"layer{stage}.{block}.{sub}"
        if sub.startswith("bn"):
            return f"layer{stage}.{block}.{sub}"
        if sub == "proj":
            return f"layer{stage}.{block}.downsample.0"
        if sub == "proj_bn":
            return f"layer{stage}.{block}.downsample.1"
    return None  # extra1/extra2 etc: not pretrained


def resnet_backbone_from_torchvision(sd: Dict[str, np.ndarray], backbone_template):
    """Fill a ResNetBackbone param subtree from a torchvision state dict.

    ``backbone_template``: the flax ``params["params"]["backbone"]`` tree
    (FrozenBN norm). Returns (new_backbone_tree, loaded_keys, skipped_keys).
    Shapes are checked strictly for everything that maps; non-pretrained
    modules (extra1/extra2) keep their template values.
    """
    loaded, skipped = [], []

    def build(sub, prefix):
        out = {}
        for k, v in sub.items():
            path = prefix + (k,)
            if isinstance(v, dict):
                out[k] = build(v, path)
                continue
            tprefix = _resnet_torch_prefix(path)
            if tprefix is None:
                out[k] = v
                skipped.append(".".join(path))
                continue
            if k == "kernel":
                w = _oihw_to_hwio(np.asarray(sd[f"{tprefix}.weight"], np.float32))
            elif k == "bias" and f"{tprefix}.running_mean" not in sd:
                # Conv bias: torchvision resnet convs are bias-free.
                w = np.zeros(v.shape, np.float32)
            else:  # FrozenBN scale/bias from folded BatchNorm stats
                scale, bias = _fold_bn(sd, tprefix)
                w = scale if k == "scale" else bias
            if tuple(w.shape) != tuple(v.shape):
                raise ValueError(
                    f"{tprefix} -> {'.'.join(path)}: shape {w.shape} != "
                    f"template {tuple(v.shape)}"
                )
            out[k] = w
            loaded.append(".".join(path))
        return out

    return build(backbone_template, ()), loaded, skipped


def load_resnet_backbone(params, ckpt_path: str):
    """Return flax params with the ResNet backbone replaced by a torchvision
    checkpoint's folded weights (pretrained-init path for BASELINE config 5)."""
    sd = load_torch_state_dict(ckpt_path)
    new_backbone, loaded, skipped = resnet_backbone_from_torchvision(
        sd, params["params"]["backbone"]
    )
    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"]["backbone"] = new_backbone
    return new_params, loaded, skipped


def load_vgg_backbone(params, ckpt_path: str, strict: bool = False):
    """Return a copy of the flax params tree with backbone convs replaced by the
    torch checkpoint's weights. Shape-mismatched layers (e.g. a torchvision
    checkpoint lacking conv6/conv7) are skipped unless ``strict``."""
    import jax

    converted = vgg_params_from_state_dict(load_torch_state_dict(ckpt_path))
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    backbone = dict(params["params"]["backbone"])
    loaded, skipped = [], []
    for name, new in converted.items():
        if name not in backbone:
            skipped.append(name)
            continue
        cur = backbone[name]
        if tuple(cur["kernel"].shape) != new["kernel"].shape:
            if strict:
                raise ValueError(
                    f"{name}: shape {new['kernel'].shape} != {tuple(cur['kernel'].shape)}"
                )
            skipped.append(name)
            continue
        backbone[name] = {"kernel": new["kernel"], "bias": new["bias"]}
        loaded.append(name)
    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"]["backbone"] = backbone
    if strict and skipped:
        raise ValueError(f"unloaded layers: {skipped}")
    return new_params, loaded, skipped
