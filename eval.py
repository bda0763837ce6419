"""Evaluation entry point (CLI).

Rebuild of the reference's ``eval.py`` (SURVEY.md §2 #22/#23, §3.2): run the
jitted detector over the VOC test / VID val split, collect per-class
detections, and compute 07-metric (or continuous) AP + mAP. Unlike the
reference's batch=1 host loop, frames are batched and pre/post-processing run
inside the jitted graph; only the final (top_k, 5) detections come back.

Example:
    python eval.py --dataset voc_320 --data_root /data/VOCdevkit \
        --checkpoint weights/ --batch_size 32
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description="Evaluate a TDRN-TPU detector")
    ap.add_argument("--dataset", default="voc_320")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--backbone", default="vgg16", choices=["vgg16", "resnet101"])
    ap.add_argument("--checkpoint", required=True, help="checkpoint directory")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--temporal", action="store_true", help="VID temporal (clip) eval")
    ap.add_argument("--score_thresh", type=float, default=0.01)
    ap.add_argument("--use_07_metric", action="store_true", default=True)
    ap.add_argument("--results_dir", default=None, help="write VOC-format det files")
    ap.add_argument("--max_images", type=int, default=0, help="0 = all")
    return ap.parse_args()


def main():
    args = parse_args()
    import cv2
    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import get_config
    from tdrn_tpu.data import VOC_CLASSES, VID_CLASSES, VOCDetection, VIDDetection
    from tdrn_tpu.eval import evaluate_detections, write_voc_results_files
    from tdrn_tpu.inference import make_single_image_forward
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.train import init_train_state, make_optimizer
    from tdrn_tpu.train.checkpoint import CheckpointManager

    cfg = get_config(args.dataset)
    is_vid = args.dataset.startswith("vid")
    class_names = VID_CLASSES if is_vid else VOC_CLASSES
    model = build_detector(cfg, backbone=args.backbone, temporal=args.temporal)

    # Restore params from the checkpoint directory.
    opt = make_optimizer()
    ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=1)
    mgr = CheckpointManager(args.checkpoint)
    restored = mgr.restore_latest(ts)
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint}")
    params = restored.params
    print(f"restored step {int(restored.step)}")

    if is_vid:
        dataset = VIDDetection(args.data_root, "val", mode="frame", transform=None)
        get_raw = lambda i: dataset._load_frame(*dataset.frames[i]) + (np.zeros(0, bool), str(i))
    else:
        dataset = VOCDetection(
            args.data_root, image_sets=(("2007", "test"),), keep_difficult=True
        )
        get_raw = dataset.raw_item

    forward = make_single_image_forward(model)
    n = len(dataset) if args.max_images == 0 else min(args.max_images, len(dataset))

    all_gt = {}
    all_dets = defaultdict(lambda: defaultdict(lambda: ([], [])))
    bs = args.batch_size
    for start in range(0, n, bs):
        idxs = range(start, min(start + bs, n))
        frames, metas = [], []
        for i in idxs:
            img, boxes, labels, difficult, img_id = get_raw(i)
            h, w, _ = img.shape
            frames.append(cv2.resize(img, (cfg.size, cfg.size)))
            metas.append((img_id, (h, w)))
            if len(difficult) != len(labels):
                difficult = np.zeros(len(labels), bool)
            all_gt[img_id] = (boxes, labels, difficult)
        batch = np.stack(frames).astype(np.uint8)
        if len(batch) < bs:  # pad to static shape
            batch = np.concatenate([batch, np.zeros((bs - len(batch),) + batch.shape[1:], np.uint8)])
        det = forward(params, jnp.asarray(batch))
        det_boxes = np.asarray(det.boxes)
        det_scores = np.asarray(det.scores)
        det_classes = np.asarray(det.classes)
        for bi, (img_id, (h, w)) in enumerate(metas):
            keep = det_scores[bi] >= args.score_thresh
            b = det_boxes[bi][keep] * np.asarray([w, h, w, h], np.float32)
            s = det_scores[bi][keep]
            c = det_classes[bi][keep] - 1  # back to 0-based object classes
            for ci in np.unique(c):
                sel = c == ci
                bl, sl = all_dets[int(ci)][img_id]
                bl.extend(b[sel])
                sl.extend(s[sel])
        if (start // bs) % 20 == 0:
            print(f"{start + len(metas)}/{n} images", flush=True)

    dets_np = {
        ci: {k: (np.asarray(v[0]).reshape(-1, 4), np.asarray(v[1])) for k, v in d.items()}
        for ci, d in all_dets.items()
    }
    aps = evaluate_detections(all_gt, dets_np, class_names, use_07_metric=args.use_07_metric)
    for name in class_names:
        print(f"AP {name}: {aps[name]:.4f}")
    print(f"mAP: {aps['mAP']:.4f}")
    if args.results_dir:
        write_voc_results_files(args.results_dir, dets_np, class_names)


if __name__ == "__main__":
    main()
