"""Live / streaming video demo (CLI).

Rebuild of the reference's live demo (SURVEY.md §2 #24, §3.3): read frames
from a camera or video file, run the streaming per-frame detector (temporal
state HBM-resident, one device dispatch per frame), draw boxes + FPS overlay.

Example:
    python live.py --checkpoint weights/ --source video.mp4 --out annotated.mp4
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description="Streaming video detection demo")
    ap.add_argument("--dataset", default=None,
                    help="config name; defaults to the checkpoint's meta (else vid_320)")
    ap.add_argument("--backbone", default=None)
    ap.add_argument("--stem", default=None, choices=["conv", "poly", "poly2", "s2d", "fused", "fused2"],
                    help="override the checkpoint's stem (fused = Pallas stage-1)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--source", default="0", help="camera index or video path")
    ap.add_argument("--out", default=None, help="write annotated video here")
    ap.add_argument("--score_thresh", type=float, default=0.4)
    ap.add_argument("--max_frames", type=int, default=0)
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16", "int8"],
                    help="bf16 = resident-bf16 feature pyramid, fp32 "
                         "heads/detect (utils/precision.py)")
    ap.add_argument("--int8_scales", default=None,
                    help="activation-scales json for --precision int8 "
                         "(from eval.py --precision int8 --save_scales)")
    ap.add_argument("--backbone_norm", default=None, choices=["frozen", "group"],
                    help="resnet norm override (identical param trees restore "
                         "silently into the wrong norm)")
    ap.add_argument("--pad_stem", type=int, default=0,
                    help="zero-pad the stem input+kernel to N channels (exact; "
                         "-7.6%% b1 latency at N=4 on v5e, BENCH.md round 3; "
                         "vgg conv stem only)")
    return ap.parse_args()


def main():
    args = parse_args()
    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)
    import cv2

    from tdrn_tpu.data import VID_CLASSES, VOC_CLASSES
    from tdrn_tpu.inference import StreamingDetector, load_inference_model

    try:
        model, params, cfg, _, _ = load_inference_model(
            args.checkpoint, dataset=args.dataset, backbone=args.backbone,
            stem=args.stem, temporal=True, dataset_fallback="vid_320",
            precision=args.precision, backbone_norm=args.backbone_norm,
            int8_scales=args.int8_scales,
        )
    except (FileNotFoundError, ValueError) as e:
        raise SystemExit(str(e))
    if args.pad_stem:
        from tdrn_tpu.utils.precision import apply_pad_stem

        model, params = apply_pad_stem(model, params, args.pad_stem)
    class_names = VID_CLASSES if cfg.name.startswith("vid") else VOC_CLASSES

    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"cannot open source {args.source}")

    det = StreamingDetector(model, params, num_streams=1)
    writer = None
    n, t0 = 0, time.perf_counter()
    while True:
        ok, frame_bgr = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        rgb = cv2.cvtColor(cv2.resize(frame_bgr, (cfg.size, cfg.size)), cv2.COLOR_BGR2RGB)
        out = det.detect(rgb[None])
        boxes = np.asarray(out.boxes)[0]
        scores = np.asarray(out.scores)[0]
        classes = np.asarray(out.classes)[0]
        h, w = frame_bgr.shape[:2]
        for b, s, c in zip(boxes, scores, classes):
            if s < args.score_thresh:
                continue
            x1, y1, x2, y2 = (b * [w, h, w, h]).astype(int)
            cv2.rectangle(frame_bgr, (x1, y1), (x2, y2), (0, 220, 0), 2)
            label = f"{class_names[int(c) - 1]} {s:.2f}"
            cv2.putText(frame_bgr, label, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 220, 0), 1)
        n += 1
        fps = n / (time.perf_counter() - t0)
        cv2.putText(frame_bgr, f"{fps:.1f} FPS", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 255), 2)
        if args.out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                    cap.get(cv2.CAP_PROP_FPS) or 25.0, (w, h),
                )
            writer.write(frame_bgr)
    cap.release()
    if writer is not None:
        writer.release()
    print(f"processed {n} frames at {fps:.1f} FPS")


if __name__ == "__main__":
    main()
