"""Synthetic fidelity harness (VERDICT round-1 #9; hard mode: round-2 #3).

No VOC/VID data exists on this machine, so end-to-end training fidelity is
tracked on synthetic detection tasks driving the REAL train.py/eval.py CLIs.

Default (easy) profile — pipeline-defect detector: solid-color rectangles on
gray noise, color <-> class (4 classes), non-overlapping, sizes spanning the
anchor scales. A correct pipeline reaches mAP ~1.0 (measured 1.000 in round
2); any sustained shortfall is a training/eval defect. SATURATED: it can no
longer rank regressions.

--hard profile — the discriminative benchmark (VERDICT round-2 item 3): 10
classes keyed by (color, texture) pairs that share colors across textures and
neighboring hues across classes, overlapping and nested boxes (IoU up to
~0.6), object scales 0.05-0.6 of the image (the smallest sit below the 32-px
anchor), and unannotated DISTRACTOR shapes in non-class color/texture combos.
Trained mAP is designed to land mid-range (~0.6-0.9) so a one-point
regression is visible. Per-class thresholds live in NOTES.md once measured.

--prefilter_check additionally re-runs eval with --prefilter 512 on the SAME
checkpoint and reports per-class AP deltas — quantifying prefilter exactness
on a genuinely cluttered score field (VERDICT round-2 weak #5), not the
trivially sparse saturated model.

Usage:
    python tools/synth_fidelity.py --steps 3000 --out /tmp/synth_fidelity
    python tools/synth_fidelity.py --hard --steps 6000 --prefilter_check \
        --out /tmp/synth_hard
    # prints one JSON line: {"mAP": ..., "per_class": {...}, ...}
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

# Hard profile: class = (color, texture). Colors repeat across textures and
# sit near each other in hue, so neither cue alone separates the classes —
# the model must conjoin them. Distractors use combos outside this table.
HARD_CLASSES = {
    "aeroplane": ((220, 40, 40), "solid"),     # red
    "bicycle":   ((220, 40, 40), "stripes"),   # red     (color tie w/ above)
    "bird":      ((150, 30, 30), "solid"),     # dark red (hue neighbor)
    "boat":      ((40, 190, 40), "solid"),     # green
    "bottle":    ((40, 190, 40), "dots"),      # green   (color tie)
    "bus":       ((40, 160, 140), "solid"),    # teal    (hue neighbor)
    "car":       ((50, 70, 225), "solid"),     # blue
    "cat":       ((50, 70, 225), "checker"),   # blue    (color tie)
    "chair":     ((230, 215, 50), "stripes"),  # yellow
    "cow":       ((235, 160, 40), "stripes"),  # orange  (hue neighbor, same texture)
}
DISTRACTOR_SPECS = (
    ((160, 160, 160), "stripes"),  # gray stripes
    ((170, 60, 200), "solid"),     # purple
    ((150, 30, 30), "dots"),       # dark-red dots (class color, non-class combo)
    ((230, 215, 50), "checker"),   # yellow checker
)


def _draw_textured(img, box, color, texture, rng):
    """Paint a textured rectangle in-place (RGB image)."""
    x1, y1, x2, y2 = box
    h, w = y2 - y1, x2 - x1
    base = np.asarray(color, np.float32)
    dark = base * 0.45
    patch = np.broadcast_to(base, (h, w, 3)).copy()
    if texture == "stripes":
        rows = (np.arange(h)[:, None] // 4) % 2 == 1
        patch[np.broadcast_to(rows[..., None], (h, w, 1))[..., 0]] = dark
    elif texture == "dots":
        patch[:] = dark
        yy, xx = np.mgrid[0:h, 0:w]
        dots = ((yy % 8) < 3) & ((xx % 8) < 3)
        patch[dots] = base
    elif texture == "checker":
        yy, xx = np.mgrid[0:h, 0:w]
        check = ((yy // 6) + (xx // 6)) % 2 == 1
        patch[check] = dark
    patch = patch + rng.normal(0, 8, (h, w, 3))
    img[y1:y2, x1:x2] = patch.clip(0, 255).astype(np.uint8)


def _sample_boxes_hard(rng, w, h, n):
    """n boxes, overlap/nesting ALLOWED, scales 0.05-0.6 of the image."""
    boxes = []
    for _ in range(10 * n):
        if len(boxes) >= n:
            break
        s = float(rng.uniform(0.05, 0.6))
        ar = rng.uniform(0.5, 2.0)
        bw = int(np.clip(s * np.sqrt(ar) * w, 8, w - 2))
        bh = int(np.clip(s / np.sqrt(ar) * h, 8, h - 2))
        x1 = int(rng.uniform(0, w - bw))
        y1 = int(rng.uniform(0, h - bh))
        boxes.append((x1, y1, x1 + bw, y1 + bh))
    return boxes


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
             seed: int = 0, hard: bool = False):
    import cv2

    base = os.path.join(root, "VOC2007")
    for d in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    rng = np.random.default_rng(seed)
    table = HARD_CLASSES if hard else CLASSES
    names = list(table)
    splits = {"trainval": [], "test": []}
    for i in range(n_train + n_test):
        img_id = f"{i:06d}"
        split = "trainval" if i < n_train else "test"
        splits[split].append(img_id)
        w = h = size
        img = rng.normal(128, 18, (h, w, 3)).clip(0, 255).astype(np.uint8)
        objects = []
        if hard:
            boxes = _sample_boxes_hard(rng, w, h, int(rng.integers(2, 6)))
            drawn = [
                (box, names[int(rng.integers(len(names)))], False)
                for box in boxes
            ]
            # Unannotated distractors in non-class color/texture combos.
            for box in _sample_boxes_hard(rng, w, h, int(rng.integers(0, 3))):
                drawn.append((box, int(rng.integers(len(DISTRACTOR_SPECS))), True))
            # Largest first so nested/overlapped smaller shapes stay visible
            # (their GT remains honest: the visible evidence is on top).
            drawn.sort(
                key=lambda d: -(d[0][2] - d[0][0]) * (d[0][3] - d[0][1])
            )
            for box, which, is_distractor in drawn:
                if is_distractor:
                    color, texture = DISTRACTOR_SPECS[which]
                else:
                    color, texture = table[which]
                _draw_textured(img, box, color, texture, rng)
                if not is_distractor:
                    objects.append((which, box))
        else:
            for box in _sample_boxes(rng, w, h, int(rng.integers(1, 4))):
                name = names[int(rng.integers(len(names)))]
                r, g, b = table[name]
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
    print(f"generated {n_train} train / {n_test} test images under {base}"
          f" (profile: {'hard' if hard else 'easy'})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_fidelity")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gen_only", action="store_true")
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--threshold", type=float, default=None,
                    help="pass bar on mAP (default 0.9 easy / 0.45 hard)")
    ap.add_argument("--hard", action="store_true",
                    help="discriminative profile: 10 confusable "
                         "(color,texture) classes, overlap/nesting, scales "
                         "0.05-0.6, unannotated distractors")
    ap.add_argument("--n_train", type=int, default=None,
                    help="train images (default 240 easy / 360 hard)")
    ap.add_argument("--prefilter_check", action="store_true",
                    help="also eval with --prefilter 512 and report per-"
                         "class AP deltas vs the exact path")
    ap.add_argument("--precision_check", action="store_true",
                    help="also eval with the bf16 / int8 / int8+tcb serving "
                         "profiles and report mAP deltas vs fp32 (most "
                         "meaningful on --hard, whose non-saturated mAP can "
                         "show a regression)")
    ap.add_argument("--qat_check", action="store_true",
                    help="full QAT workflow on the trained model: calibrate "
                         "int8 scales (eval.py --save_scales), fine-tune "
                         "with train.py --qat --init_from, then eval the "
                         "result under --precision int8 with the SAME "
                         "scales; reports mAP_int8_qat vs the PTQ int8 mAP")
    ap.add_argument("--qat_steps", type=int, default=None,
                    help="QAT fine-tune steps (default steps/4)")
    ap.add_argument("--skip_train", action="store_true",
                    help="re-eval an existing --out/weights checkpoint")
    ap.add_argument("--extra_train_args", default="",
                    help="extra train.py flags, e.g. '--stem s2d'")
    args = ap.parse_args()
    classes = HARD_CLASSES if args.hard else CLASSES
    threshold = args.threshold if args.threshold is not None else (
        0.45 if args.hard else 0.9
    )

    data_root = os.path.join(args.out, "data")
    weights = os.path.join(args.out, "weights")
    if not args.skip_gen:
        n_train = args.n_train or (360 if args.hard else 240)
        n_test = 36 if args.hard else 24
        generate(data_root, n_train=n_train, n_test=n_test, seed=args.seed,
                 hard=args.hard)
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
    if not args.skip_train:
        subprocess.run(train_cmd, check=True, cwd=REPO, env=env)

    def run_eval(extra=(), ckpt=None):
        eval_cmd = [
            sys.executable, os.path.join(REPO, "eval.py"),
            "--dataset", "voc_320", "--data_root", data_root,
            "--checkpoint", ckpt or weights, "--split", "2007:test",
            "--batch_size", "8", *extra,
        ]
        out = subprocess.run(
            eval_cmd, check=True, cwd=REPO, env=env, capture_output=True,
            text=True,
        )
        sys.stderr.write(out.stdout[-4000:])
        # eval.py prints "AP <class>: <v>" per class; its own mAP averages all
        # 20 VOC names (absent ones -> AP 0), so the harness mAP is the mean
        # over the classes that exist in the task.
        aps = {}
        for line in out.stdout.splitlines():
            toks = line.replace(":", " ").split()
            if len(toks) >= 3 and toks[0] == "AP" and toks[1] in classes:
                aps[toks[1]] = float(toks[2])
        m = (
            float(np.mean([aps[c] for c in classes]))
            if len(aps) == len(classes)
            else None
        )
        return m, aps

    map_exact, aps = run_eval()
    result = {
        "profile": "hard" if args.hard else "easy",
        "mAP": map_exact,
        "per_class": aps,
        "threshold": threshold,
        "steps": args.steps,
        "pass": map_exact is not None and map_exact >= threshold,
    }
    if args.prefilter_check:
        map_pf, aps_pf = run_eval(("--prefilter", "512"))
        result["prefilter_mAP"] = map_pf
        result["prefilter_delta"] = (
            None if map_pf is None or map_exact is None
            else round(map_pf - map_exact, 6)
        )
        result["prefilter_per_class_delta"] = {
            c: round(aps_pf[c] - aps[c], 6) for c in aps if c in aps_pf
        }
    if args.precision_check:
        for prec, extra in (
            ("bf16", ("--precision", "bf16")),
            ("int8", ("--precision", "int8")),
            ("int8_tcb", ("--precision", "int8", "--int8_tcb")),
        ):
            map_p, _ = run_eval(extra)
            result[f"mAP_{prec}"] = map_p
            result[f"{prec}_delta"] = (
                None if map_p is None or map_exact is None
                else round(map_p - map_exact, 6)
            )
    if args.qat_check:
        # 1. Calibrate once, offline (backbone + TCB keys -> QAT covers both).
        scales = os.path.join(args.out, "int8_scales.json")
        run_eval(("--precision", "int8", "--int8_tcb", "--save_scales", scales))
        # 2. PTQ baseline on those exact scales (what QAT must beat).
        map_ptq, _ = run_eval(("--precision", "int8", "--int8_scales", scales))
        # 3. Fine-tune with fake-quant on the same grids.
        weights_qat = os.path.join(args.out, "weights_qat")
        qat_steps = args.qat_steps or max(200, args.steps // 4)
        qat_cmd = [
            sys.executable, os.path.join(REPO, "train.py"),
            "--dataset", "voc_320", "--data_root", data_root,
            "--image_sets", "2007:trainval",
            "--batch_size", str(args.batch_size),
            "--max_iter", str(qat_steps), "--lr", str(args.lr * 0.1),
            "--warmup", "50", "--milestones", str(qat_steps),
            "--save_folder", weights_qat, "--save_every", str(qat_steps),
            "--no_photometric", "--log_every", "50", "--seed", str(args.seed),
            "--qat", "--int8_scales", scales, "--init_from", weights,
        ] + (args.extra_train_args.split() if args.extra_train_args else [])
        subprocess.run(qat_cmd, check=True, cwd=REPO, env=env)
        # 4. Serve the QAT checkpoint int8 on the SAME scales.
        map_qat, _ = run_eval(("--precision", "int8", "--int8_scales", scales),
                              ckpt=weights_qat)
        result["mAP_int8_ptq"] = map_ptq
        result["mAP_int8_qat"] = map_qat
        result["qat_vs_ptq_delta"] = (
            None if map_qat is None or map_ptq is None
            else round(map_qat - map_ptq, 6)
        )
        result["qat_vs_fp32_delta"] = (
            None if map_qat is None or map_exact is None
            else round(map_qat - map_exact, 6)
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
