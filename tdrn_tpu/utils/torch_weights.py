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
