"""Real-pretrained-checkpoint fidelity dry run (VERDICT round-2 item 9).

No real ``vgg16_reducedfc.pth`` / torchvision ``resnet101`` checkpoint exists
on this machine (and the reference mount is empty), so the torch->flax weight
converters are proven only against synthetic torch layouts. THE MOMENT a real
checkpoint appears, this script anchors fidelity in one command:

    python tools/verify_pretrained.py --ckpt /path/vgg16_reducedfc.pth
    python tools/verify_pretrained.py --ckpt /path/resnet101.pth \
        --backbone resnet101

It (1) grafts the checkpoint into the flax backbone (utils/torch_weights.py),
(2) for VGG also loads the independent eager torch-CPU mirror
(utils/torch_mirror.py) with the SAME weights, (3) runs one deterministic
image through both, and (4) prints per-source-feature max|Δ| — which must sit
at float-noise level (~1e-5) if the kernel-layout conversion (OIHW->HWIO,
stride/dilation/padding semantics) is faithful. Exits nonzero above
--tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torch .pth state dict")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--tolerance", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import VID_320, VID_512, get_config
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.train import init_train_state, make_optimizer

    cfg = VID_320 if args.size == 320 else VID_512
    model = build_detector(cfg, backbone=args.backbone, temporal=False)
    x0 = jnp.zeros((1, cfg.size, cfg.size, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, None)

    if args.backbone == "resnet101":
        from tdrn_tpu.utils.torch_weights import load_resnet_backbone

        params, loaded, report = load_resnet_backbone(params, args.ckpt)
        print(f"grafted {len(loaded)} tensors; {report}")
    else:
        from tdrn_tpu.utils.torch_weights import load_vgg_backbone

        params, loaded, skipped = load_vgg_backbone(params, args.ckpt)
        print(f"grafted {len(loaded)} tensors; skipped {skipped}")
        if not loaded:
            print("ERROR: nothing grafted — unrecognized state-dict layout")
            sys.exit(2)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, cfg.size, cfg.size, 3)).astype(np.float32)
    img -= np.asarray(cfg.pixel_means, np.float32)

    # Flax backbone sources.
    from tdrn_tpu.models.vgg import VGG16Reduced
    from tdrn_tpu.models.resnet import ResNetBackbone

    bb_params = {"params": params["params"]["backbone"]}
    if args.backbone == "vgg16":
        bb = VGG16Reduced()
    else:
        bb = ResNetBackbone(depth=101, norm="frozen")
    flax_sources = bb.apply(bb_params, jnp.asarray(img))

    result = {"ckpt": args.ckpt, "backbone": args.backbone, "sources": []}
    worst = 0.0
    if args.backbone == "vgg16":
        # Independent eager torch mirror fed the SAME grafted weights.
        import torch

        from tdrn_tpu.utils.torch_mirror import TorchVGG16Reduced
        from tdrn_tpu.utils.torch_weights import flax_to_torch_state

        mirror = TorchVGG16Reduced()
        sd = {
            k[len("backbone."):]: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flax_to_torch_state(params).items()
            if k.startswith("backbone.")
        }
        mirror.load_state_dict(sd)
        mirror.eval()
        with torch.no_grad():
            t_sources = mirror(
                torch.from_numpy(img.transpose(0, 3, 1, 2))
            )
        for i, (fs, ts) in enumerate(zip(flax_sources, t_sources)):
            ts_nhwc = ts.numpy().transpose(0, 2, 3, 1)
            d = float(np.max(np.abs(np.asarray(fs) - ts_nhwc)))
            scale = float(np.max(np.abs(ts_nhwc))) + 1e-9
            result["sources"].append(
                {"scale": i, "shape": list(fs.shape), "max_abs_delta": d,
                 "rel": d / scale}
            )
            worst = max(worst, d / scale)
    else:
        # ResNet: load_resnet_backbone's BN fold is itself verified by
        # tests/test_resnet_weights.py kernel-coverage; here we check the
        # grafted model produces finite, non-degenerate features.
        for i, fs in enumerate(flax_sources):
            a = np.asarray(fs)
            result["sources"].append(
                {"scale": i, "shape": list(a.shape),
                 "finite": bool(np.isfinite(a).all()),
                 "std": float(a.std())}
            )
            if not np.isfinite(a).all() or a.std() == 0:
                worst = 1.0

    result["worst_rel_delta"] = worst
    result["pass"] = worst <= args.tolerance
    print(json.dumps(result))
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
