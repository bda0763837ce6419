"""Synthetic fidelity harness (VERDICT round-1, next-round #9).

No VOC/VID data exists on this machine, so end-to-end training fidelity is
tracked on a CLEANLY SEPARABLE synthetic detection task where a correct
pipeline must reach mAP >= 0.9: solid-color rectangles on textured gray noise,
color <-> class (4 classes), non-overlapping (pairwise IoU = 0), sizes spanning
all four anchor scales. Round-1's ad-hoc harness topped out at AP ~0.5 because
its task was ambiguous (overlapping same-color shapes); this one isolates the
pipeline: any sustained shortfall from ~1.0 is a training/eval defect, not
task noise.

Usage (drives the real train.py / eval.py CLIs end to end):
    python tools/synth_fidelity.py --steps 3000 --out /tmp/synth_fidelity
    # prints one JSON line: {"mAP": ..., "per_class": {...}, "threshold": 0.9}

Generation only (e.g. to inspect images):
    python tools/synth_fidelity.py --gen_only --out /tmp/synth_fidelity
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# color <-> class: visually trivial to separate. Names must be VOC classes
# (data/voc.py VOC_CLASSES); the mapping to colors is arbitrary.
CLASSES = {
    "aeroplane": (220, 40, 40),   # red
    "bicycle": (40, 200, 40),     # green
    "bird": (40, 60, 230),        # blue
    "boat": (235, 220, 50),       # yellow
}


def _xml(img_id, w, h, objects):
    parts = [
        "<annotation>",
        f"  <filename>{img_id}.jpg</filename>",
        f"  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>",
    ]
    for name, (x1, y1, x2, y2) in objects:
        parts += [
            "  <object>",
            f"    <name>{name}</name>",
            "    <difficult>0</difficult>",
            # VOC XML is 1-based (the parser subtracts 1).
            f"    <bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin>"
            f"<xmax>{x2 + 1}</xmax><ymax>{y2 + 1}</ymax></bndbox>",
            "  </object>",
        ]
    parts.append("</annotation>")
    return "\n".join(parts)


def _sample_boxes(rng, w, h, n):
    """n non-overlapping pixel boxes spanning the anchor scales."""
    boxes = []
    for _ in range(200):
        if len(boxes) >= n:
            break
        # side fractions 0.1..0.7 of the image, mild aspect jitter
        s = rng.uniform(0.1, 0.7)
        ar = rng.uniform(0.6, 1.6)
        bw = int(np.clip(s * np.sqrt(ar) * w, 16, w - 2))
        bh = int(np.clip(s / np.sqrt(ar) * h, 16, h - 2))
        x1 = int(rng.uniform(0, w - bw))
        y1 = int(rng.uniform(0, h - bh))
        cand = (x1, y1, x1 + bw, y1 + bh)
        if all(
            cand[2] <= b[0] or b[2] <= cand[0] or cand[3] <= b[1] or b[3] <= cand[1]
            for b in boxes
        ):
            boxes.append(cand)
    return boxes


def generate(root: str, n_train: int = 240, n_test: int = 24, size: int = 400,
             seed: int = 0):
    import cv2

    base = os.path.join(root, "VOC2007")
    for d in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    rng = np.random.default_rng(seed)
    names = list(CLASSES)
    splits = {"trainval": [], "test": []}
    for i in range(n_train + n_test):
        img_id = f"{i:06d}"
        split = "trainval" if i < n_train else "test"
        splits[split].append(img_id)
        w = h = size
        img = rng.normal(128, 18, (h, w, 3)).clip(0, 255).astype(np.uint8)
        objects = []
        for box in _sample_boxes(rng, w, h, int(rng.integers(1, 4))):
            name = names[int(rng.integers(len(names)))]
            r, g, b = CLASSES[name]
            x1, y1, x2, y2 = box
            img[y1:y2, x1:x2] = (
                np.array([r, g, b]) + rng.normal(0, 8, (y2 - y1, x2 - x1, 3))
            ).clip(0, 255).astype(np.uint8)
            objects.append((name, box))
        cv2.imwrite(
            os.path.join(base, "JPEGImages", f"{img_id}.jpg"),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 95],
        )
        with open(os.path.join(base, "Annotations", f"{img_id}.xml"), "w") as f:
            f.write(_xml(img_id, w, h, objects))
    for split, ids in splits.items():
        with open(os.path.join(base, "ImageSets", "Main", f"{split}.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    print(f"generated {n_train} train / {n_test} test images under {base}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_fidelity")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gen_only", action="store_true")
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--extra_train_args", default="",
                    help="extra train.py flags, e.g. '--stem s2d'")
    args = ap.parse_args()

    data_root = os.path.join(args.out, "data")
    weights = os.path.join(args.out, "weights")
    if not args.skip_gen:
        generate(data_root, seed=args.seed)
    if args.gen_only:
        return

    # Prepend (not replace) PYTHONPATH: the axon TPU plugin rides on it.
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Color IS the class signal: photometric distortion off (NOTES.md).
    train_cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "voc_320", "--data_root", data_root,
        "--image_sets", "2007:trainval", "--batch_size", str(args.batch_size),
        "--max_iter", str(args.steps), "--lr", str(args.lr),
        "--warmup", "200", "--milestones", str(int(args.steps * 0.75)),
        "--save_folder", weights, "--save_every", str(args.steps),
        "--no_photometric", "--log_every", "50", "--seed", str(args.seed),
    ] + (args.extra_train_args.split() if args.extra_train_args else [])
    subprocess.run(train_cmd, check=True, cwd=REPO, env=env)

    eval_cmd = [
        sys.executable, os.path.join(REPO, "eval.py"),
        "--dataset", "voc_320", "--data_root", data_root,
        "--checkpoint", weights, "--split", "2007:test", "--batch_size", "8",
    ]
    out = subprocess.run(
        eval_cmd, check=True, cwd=REPO, env=env, capture_output=True, text=True
    )
    sys.stderr.write(out.stdout[-4000:])
    # eval.py prints "AP <class>: <v>" per class; its own mAP averages all 20
    # VOC names (16 absent here -> AP 0), so the harness mAP is the mean over
    # the 4 classes that exist in the task.
    aps = {}
    for line in out.stdout.splitlines():
        toks = line.replace(":", " ").split()
        if len(toks) >= 3 and toks[0] == "AP" and toks[1] in CLASSES:
            aps[toks[1]] = float(toks[2])
    map4 = float(np.mean([aps[c] for c in CLASSES])) if len(aps) == len(CLASSES) else None
    result = {
        "mAP": map4,
        "per_class": aps,
        "threshold": args.threshold,
        "steps": args.steps,
        "pass": map4 is not None and map4 >= args.threshold,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
