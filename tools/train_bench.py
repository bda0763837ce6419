"""True-device training-step throughput (the surface bench.py doesn't cover).

Methodology matches bench.py (NOTES.md): on the axon tunnel
``block_until_ready`` returns at dispatch, so we pipeline N jitted train
steps — each step consumes the previous TrainState (strict dependency chain)
— and force ONE host materialization of the final loss, which provably waits
for all N steps. The batch tensors are pre-uploaded; we measure the chip, not
the tunnel.

    python tools/train_bench.py                    # voc_320 frame mode, b32
    python tools/train_bench.py --clip --batch 4   # vid_320 TBPTT, T=8 clips

Prints one JSON line with steps/sec, frames(images)/sec/chip and ms/step.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="default: voc_320 (frame) / vid_320 (--clip)")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "resnet101"])
    ap.add_argument("--stem", default="conv",
                    choices=["conv", "poly", "poly2", "s2d"])
    ap.add_argument("--cell", default="convgru", choices=["convgru", "light"])
    ap.add_argument("--clip", action="store_true",
                    help="TBPTT clip mode (temporal model, scan over T)")
    ap.add_argument("--seq_len", type=int, default=8)
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 32 frame mode / 4 clip mode")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision train step: bf16 feature-pyramid "
                         "compute (cast hoisted out of the clip scan), fp32 "
                         "masters/heads/loss (train/trainer.py compute_dtype)")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint per-frame forwards in clip mode")
    ap.add_argument("--gpercore", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)

    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import get_config
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.train import (
        Targets,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = get_config(args.config or ("vid_320" if args.clip else "voc_320"))
    batch = args.batch or (4 if args.clip else 32)
    model = build_detector(
        cfg, backbone=args.backbone, temporal=args.clip, stem=args.stem,
        temporal_cell=args.cell,
    )
    opt = make_optimizer(base_lr=1e-3, warmup_steps=10)
    ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=batch)
    step = make_train_step(
        model, opt, clip_mode=args.clip, remat=args.remat,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )

    rng = np.random.RandomState(0)
    g = 8  # padded GT slots per image
    if args.clip:
        t = args.seq_len
        frames = jnp.asarray(
            rng.rand(t, batch, cfg.size, cfg.size, 3).astype(np.float32)
        )
        boxes = jnp.asarray(
            np.tile(np.asarray([[0.2, 0.2, 0.7, 0.7]], np.float32),
                    (t, batch, g, 1))
        )
        labels = jnp.ones((t, batch, g), jnp.int32)
        valid = jnp.asarray(
            np.tile(np.arange(g) < 2, (t, batch, 1))
        )
        per_step_images = t * batch
    else:
        frames = jnp.asarray(
            rng.rand(batch, cfg.size, cfg.size, 3).astype(np.float32)
        )
        boxes = jnp.asarray(
            np.tile(np.asarray([[0.2, 0.2, 0.7, 0.7]], np.float32),
                    (batch, g, 1))
        )
        labels = jnp.ones((batch, g), jnp.int32)
        valid = jnp.asarray(np.tile(np.arange(g) < 2, (batch, 1)))
        per_step_images = batch
    targets = Targets(boxes, labels, valid)

    # Compile + warmup (donated ts: rebind each call).
    for _ in range(args.warmup):
        ts, metrics = step(ts, frames, targets)
    float(metrics["loss"])  # fence

    t0 = time.perf_counter()
    for _ in range(args.steps):
        ts, metrics = step(ts, frames, targets)
    loss = float(metrics["loss"])  # single final fetch forces the chain
    dt = time.perf_counter() - t0

    ms = dt / args.steps * 1e3
    out = {
        "metric": ("train_clip_images_per_sec_per_chip" if args.clip
                   else "train_images_per_sec_per_chip"),
        "value": round(per_step_images / (dt / args.steps), 2),
        "unit": "images/s",
        "ms_per_step": round(ms, 2),
        "steps_per_sec": round(1e3 / ms, 3),
        "config": cfg.name,
        "backbone": args.backbone,
        "stem": args.stem,
        "cell": args.cell,
        "clip": args.clip,
        "seq_len": args.seq_len if args.clip else None,
        "batch": batch,
        "remat": args.remat,
        "bf16": args.bf16,
        "loss": round(loss, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
