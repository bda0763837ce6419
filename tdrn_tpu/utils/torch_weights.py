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
