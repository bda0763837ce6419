"""Training entry point (CLI).

Rebuild of the reference's ``train.py`` (SURVEY.md §2 #21, §3.1) with the same
flag surface (dataset/size/batch/lr/resume/checkpoint cadence) on top of the
jitted data-parallel train step. Works for VOC single-image training and VID
clip (temporal, truncated-BPTT) training.

Example:
    python train.py --dataset voc_320 --data_root /data/VOCdevkit \
        --batch_size 32 --max_iter 120000 --save_folder weights/
    python train.py --dataset vid_320 --data_root /data/ILSVRC --clip \
        --batch_size 4 --seq_len 8
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description="Train a TDRN-TPU detector")
    ap.add_argument("--dataset", default="voc_320", help="config name (see tdrn_tpu.config)")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--backbone", default="vgg16", choices=["vgg16", "resnet101"])
    ap.add_argument("--backbone_norm", default="frozen", choices=["frozen", "group"],
                    help="resnet norm: frozen (pretrained BN fold) or group "
                         "(GroupNorm, trainable from scratch)")
    ap.add_argument("--pretrained", default=None,
                    help="torch checkpoint to graft into the backbone: "
                         "vgg16_reducedfc.pth / torchvision vgg16 (vgg16) or "
                         "a torchvision resnet101 state dict (resnet101)")
    ap.add_argument("--init_from", default=None,
                    help="init params from another run's checkpoint dir "
                         "(subtree-tolerant graft; e.g. staged TDRN training: "
                         "clip fine-tuning from a frame-trained detector — "
                         "the fresh temporal subtree keeps its init)")
    ap.add_argument("--clip", action="store_true", help="VID clip (temporal) training")
    ap.add_argument(
        "--image_sets",
        default="2007:trainval,2012:trainval",
        help="VOC splits as year:split[,year:split...]",
    )
    ap.add_argument("--seq_len", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--milestones", type=int, nargs="+", default=[80000, 100000])
    ap.add_argument("--gamma", type=float, default=0.1)
    ap.add_argument("--grad_clip", type=float, default=10.0,
                    help="global-norm gradient clip (0 = off)")
    ap.add_argument("--no_photometric", action="store_true",
                    help="disable photometric distortion (color-sensitive data)")
    ap.add_argument("--max_iter", type=int, default=120000)
    ap.add_argument("--save_folder", default="weights/")
    ap.add_argument("--save_every", type=int, default=5000)
    ap.add_argument("--resume", action="store_true", help="resume from latest ckpt")
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--loader", default="threads", choices=["threads", "grain"],
                    help="input pipeline: thread-pool or grain worker processes")
    ap.add_argument("--temporal_cell", default="convgru", choices=["convgru", "light", "hybrid"])
    ap.add_argument("--stem", default="conv", choices=["conv", "poly", "poly2", "s2d"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (TPU pod / multi-host)")
    ap.add_argument("--coordinator", default=None, help="host:port for multihost")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--tensorboard", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 feature-pyramid "
                         "compute + carry (params cast once per step, hoisted "
                         "out of the clip scan), fp32 masters/heads/loss — "
                         "the training twin of the resident-bf16 serving "
                         "profile (utils/precision.py)")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint per-frame forwards in clip mode (less HBM)")
    ap.add_argument("--qat", action="store_true",
                    help="quantization-aware fine-tuning: the convs the int8 "
                         "serving profile quantizes run fake-quantized on the "
                         "calibrated grids (straight-through gradients; fp32 "
                         "masters/checkpoints). Requires --int8_scales; "
                         "typically composed with --init_from <fp32 run>. "
                         "Serve the result with --precision int8 and the SAME "
                         "scales file.")
    ap.add_argument("--int8_scales", default=None,
                    help="activation-scales json from `eval.py --precision "
                         "int8 --save_scales` (defines which convs fake-"
                         "quantize: backbone [+ tcb/gru keys if present])")
    ap.add_argument("--mixed_frames", type=int, default=0,
                    help="clip mode: interleave one frame-objective optimizer "
                         "step per iteration on this many INDEPENDENT frames "
                         "(run as T=1 clips through the same train step). "
                         "Restores the scene diversity cold-start clip "
                         "training lacks (4 correlated scenes/step vs frame "
                         "training's batch_size independent ones — NOTES.md "
                         "round-3 diagnosis). Each iteration then performs 2 "
                         "optimizer steps; --max_iter still bounds TOTAL "
                         "optimizer steps.")
    return ap.parse_args()


def main():
    args = parse_args()
    if args.mixed_frames and not args.clip:
        raise SystemExit("--mixed_frames requires --clip")
    if args.qat and not args.int8_scales:
        raise SystemExit("--qat requires --int8_scales (calibrate offline: "
                         "eval.py --precision int8 --save_scales <path>)")
    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)
    import jax
    import jax.numpy as jnp

    if args.multihost:
        from tdrn_tpu.parallel.distributed import init_distributed

        proc = init_distributed(args.coordinator)
        print(f"process {proc}/{jax.process_count()}, {jax.device_count()} global devices")
        args.seed = args.seed + proc  # decorrelate per-host thread loaders

    from tdrn_tpu.config import get_config
    from tdrn_tpu.data import SSDAugmentation, VIDDetection, VOCDetection
    from tdrn_tpu.data.loader import make_loader
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.parallel import make_mesh, replicate_tree, shard_batch_tree
    from tdrn_tpu.train import (
        Targets,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from tdrn_tpu.train.checkpoint import CheckpointManager
    from tdrn_tpu.utils.logging import MetricsLogger

    cfg = get_config(args.dataset)
    # Model (and checkpoint) params are always fp32 masters; --bf16 selects
    # the mixed-precision COMPUTE path inside the train step instead.
    model = build_detector(
        cfg, backbone=args.backbone, temporal=args.clip,
        stem=args.stem, temporal_cell=args.temporal_cell,
        backbone_norm=args.backbone_norm,
    )

    aug = SSDAugmentation(cfg.size, cfg.pixel_means, seed=args.seed,
                          photometric=not args.no_photometric)
    if args.clip:
        dataset = VIDDetection(
            args.data_root, "train", mode="clip", seq_len=args.seq_len,
            transform=aug, seed=args.seed,
        )
    elif args.dataset.startswith("vid"):
        dataset = VIDDetection(
            args.data_root, "train", mode="frame", transform=aug, seed=args.seed
        )
    else:
        sets = tuple(tuple(p.split(":")) for p in args.image_sets.split(","))
        try:
            dataset = VOCDetection(
                args.data_root, image_sets=sets, transform=aug, seed=args.seed
            )
        except FileNotFoundError as e:
            raise SystemExit(
                f"dataset split not found under {args.data_root} "
                f"(--image_sets {args.image_sets}): {e}"
            )
    from tdrn_tpu.data import VID_CLASSES, VOC_CLASSES

    n_fg = len(VID_CLASSES) if isinstance(dataset, VIDDetection) else len(VOC_CLASSES)
    if cfg.num_classes < n_fg + 1:
        # Out-of-range labels reach take_along_axis in the loss, whose jit
        # gather fills NaN in the forward (and silently drops the OOB grad) —
        # a silent-NaN trap; fail loudly at startup instead.
        raise SystemExit(
            f"config {cfg.name} has num_classes={cfg.num_classes} (incl. "
            f"background) but the dataset has {n_fg} foreground classes"
        )
    print(f"dataset: {len(dataset)} samples; priors: {cfg.num_priors}")

    opt = make_optimizer(
        args.lr, args.momentum, args.weight_decay, args.warmup, args.milestones,
        args.gamma, grad_clip_norm=args.grad_clip,
    )
    mesh = make_mesh()
    ts = init_train_state(model, jax.random.PRNGKey(args.seed), opt, batch=args.batch_size)
    if args.pretrained:
        if args.backbone == "resnet101":
            from tdrn_tpu.utils.torch_weights import load_resnet_backbone

            if args.backbone_norm != "frozen":
                raise SystemExit("--pretrained resnet weights need --backbone_norm frozen")
            params, loaded, _ = load_resnet_backbone(ts.params, args.pretrained)
        else:
            from tdrn_tpu.utils.torch_weights import load_vgg_backbone

            params, loaded, skipped = load_vgg_backbone(ts.params, args.pretrained)
            if skipped:
                print(f"pretrained: skipped {skipped}")
        print(f"pretrained: grafted {len(loaded)} tensors from {args.pretrained}")
        ts = ts._replace(params=jax.tree.map(jnp.asarray, params))
    if args.init_from:
        from tdrn_tpu.train.checkpoint import CheckpointManager as _Mgr

        out = _Mgr(args.init_from).restore_params(ts.params)
        if out is None:
            raise SystemExit(f"--init_from: no checkpoint in {args.init_from}")
        params, missing, extra = out
        ts = ts._replace(params=jax.tree.map(jnp.asarray, params))
        print(
            f"init_from {args.init_from}: {len(missing)} fresh subtree(s) "
            f"{missing[:3]}, {len(extra)} unused {extra[:3]}"
        )
    ts = replicate_tree(ts, mesh)

    ckpt = CheckpointManager(args.save_folder, save_every=args.save_every)
    if jax.process_index() == 0:
        # Persist construction flags so eval/test/serve/live rebuild the exact
        # model pytree without re-passing them (ADVICE round-1: non-default
        # --stem/--temporal_cell checkpoints were otherwise unrestorable).
        ckpt.save_meta({
            "dataset": args.dataset,
            "backbone": args.backbone,
            "temporal": bool(args.clip),
            "stem": args.stem,
            "temporal_cell": args.temporal_cell,
            "backbone_norm": args.backbone_norm,
            "tcb_channels": 256,
            "bf16": bool(args.bf16),
            "qat": bool(args.qat),
            "optimizer": {
                "lr": args.lr, "momentum": args.momentum,
                "weight_decay": args.weight_decay, "warmup": args.warmup,
                "milestones": list(args.milestones), "gamma": args.gamma,
                "grad_clip": args.grad_clip,
            },
        })
    if args.resume:
        restored = ckpt.restore_latest(ts)
        if restored is not None:
            ts = replicate_tree(restored, mesh)
            print(f"resumed at step {int(ts.step)}")

    qat_scales = None
    if args.qat:
        from tdrn_tpu.utils.quantize import load_act_scales

        qat_scales = load_act_scales(args.int8_scales)
        print(f"qat: fake-quantizing {len(qat_scales)} convs "
              f"on {args.int8_scales}")
    step_fn = make_train_step(
        model, opt, clip_mode=args.clip, remat=args.remat,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        qat_scales=qat_scales,
    )
    logger = MetricsLogger(args.save_folder, tensorboard=args.tensorboard, echo_every=args.log_every)

    if args.loader == "grain":
        from tdrn_tpu.data.grain_pipeline import make_grain_loader

        loader = make_grain_loader(
            dataset, batch_size=args.batch_size, num_workers=args.num_workers,
            clip_mode=args.clip, seed=args.seed,
        )
    else:
        loader = make_loader(
            dataset,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            clip_mode=args.clip,
            seed=args.seed,
        )
    frame_iter = None
    if args.mixed_frames:
        frame_ds = VIDDetection(
            args.data_root, "train", mode="frame", transform=aug,
            seed=args.seed + 7919,
        )
        frame_iter = iter(make_loader(
            frame_ds, batch_size=args.mixed_frames, num_workers=2,
            clip_mode=False, seed=args.seed + 7919,
        ))

    t_last = time.perf_counter()
    start = int(ts.step)
    steps_done = start  # optimizer steps, exactly bounded by --max_iter
    steps_logged = start
    for batch in loader:
        if steps_done >= args.max_iter:
            break
        images, boxes, labels, valid = batch
        images = shard_batch_tree(np.ascontiguousarray(images), mesh, args.clip)
        targets = shard_batch_tree(
            Targets(boxes, labels, valid), mesh, leading_time_axis=args.clip
        )
        ts, metrics = step_fn(ts, images, targets)
        steps_done += 1
        ckpt.maybe_save(ts, step=steps_done)  # host-side step: no fetch
        if frame_iter is not None and steps_done < args.max_iter:
            # Frame-objective step: independent frames as T=1 clips through
            # the SAME jitted step (second shape variant, compiled once).
            fi, fb, fl, fv = next(frame_iter)
            fimages = shard_batch_tree(
                np.ascontiguousarray(fi)[None], mesh, leading_time_axis=True
            )
            ftargets = shard_batch_tree(
                Targets(fb[None], fl[None], fv[None]), mesh,
                leading_time_axis=True,
            )
            ts, fmetrics = step_fn(ts, fimages, ftargets)
            metrics = dict(metrics, frame_loss=fmetrics["loss"])
            steps_done += 1
            ckpt.maybe_save(ts, step=steps_done)
        if steps_done - steps_logged >= args.log_every:
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            metrics["steps_per_sec"] = (steps_done - steps_logged) / (now - t_last)
            t_last = now
            steps_logged = steps_done
            logger.log(steps_done, metrics)
    ckpt.maybe_save(ts, force=True)
    ckpt.wait()
    print("training complete")


if __name__ == "__main__":
    main()
