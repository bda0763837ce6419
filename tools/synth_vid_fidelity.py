"""Temporal fidelity harness: synthetic ImageNet-VID-format video where the
TEMPORAL model must beat the frame model.

Scenes: colored rectangles (color == class) moving with constant velocity
(bouncing) over textured gray noise; each object is periodically OCCLUDED for
a few frames by a background-colored band (camouflage — zero appearance
evidence). Ground truth persists through occlusion, exactly like real VID
annotation of briefly-hidden objects. A single-frame detector cannot score
those frames; the ConvGRU temporal state can carry the object through. The
measured gap (temporal mAP - frame mAP) is direct evidence the flagship TDRN
capability works end-to-end (SURVEY.md §3.1 seq training; VERDICT round-1
asked for fidelity evidence beyond static overfits).

Usage:
    python tools/synth_vid_fidelity.py --out /tmp/synth_vid --steps 1500
    # trains clip-mode (temporal) + frame-mode models via train.py, evals both
    # via eval.py (--temporal / plain), prints one JSON line with both mAPs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# color <-> VID class (wnid must be a real VID wnid; data/vid.py maps them).
CLASSES = {
    "airplane": ("n02691156", (220, 40, 40)),
    "bear": ("n02131653", (40, 200, 40)),
    "bicycle": ("n02834778", (40, 60, 230)),
    "bird": ("n01503061", (235, 220, 50)),
}
_BG_MEAN = 128.0


def _xml(folder, stem, w, h, objs):
    parts = [
        "<annotation>",
        f"  <folder>{folder}</folder>",
        f"  <filename>{stem}</filename>",
        f"  <size><width>{w}</width><height>{h}</height></size>",
    ]
    for tid, wnid, (x1, y1, x2, y2) in objs:
        parts += [
            "  <object>",
            f"    <trackid>{tid}</trackid>",
            f"    <name>{wnid}</name>",
            f"    <bndbox><xmax>{x2}</xmax><xmin>{x1}</xmin>"
            f"<ymax>{y2}</ymax><ymin>{y1}</ymin></bndbox>",
            "    <occluded>0</occluded>",
            "  </object>",
        ]
    parts.append("</annotation>")
    return "\n".join(parts)


class _Obj:
    def __init__(self, rng, size, name):
        self.name = name
        s = rng.uniform(0.15, 0.4)
        ar = rng.uniform(0.7, 1.4)
        self.w = int(np.clip(s * np.sqrt(ar) * size, 24, size // 2))
        self.h = int(np.clip(s / np.sqrt(ar) * size, 24, size // 2))
        self.x = rng.uniform(0, size - self.w)
        self.y = rng.uniform(0, size - self.h)
        # Three speed regimes so the motion-IoU eval split (eval/motion.py,
        # slow > 0.9 / medium / fast < 0.7 mean track IoU over +/-10 frames)
        # all carry GT: near-static, drifting, and fast movers.
        speed = {
            0: lambda: rng.uniform(0.0, 0.1),
            1: lambda: rng.uniform(0.3, 0.8),
            2: lambda: rng.uniform(2.0, 6.0),
        }[int(rng.integers(3))]
        self.vx = speed() * rng.choice([-1, 1])
        self.vy = speed() * rng.choice([-1, 1])
        # Occlusion schedule: hidden for `occ_len` frames every `occ_period`.
        self.occ_period = int(rng.integers(8, 13))
        self.occ_len = int(rng.integers(2, 5))
        self.occ_phase = int(rng.integers(0, self.occ_period))

    def step(self, size):
        self.x += self.vx
        self.y += self.vy
        if self.x < 0 or self.x + self.w > size:
            self.vx = -self.vx
            self.x = float(np.clip(self.x, 0, size - self.w))
        if self.y < 0 or self.y + self.h > size:
            self.vy = -self.vy
            self.y = float(np.clip(self.y, 0, size - self.h))

    def occluded(self, t):
        return (t + self.occ_phase) % self.occ_period < self.occ_len

    def box(self):
        return (int(self.x), int(self.y), int(self.x) + self.w, int(self.y) + self.h)


def generate(root, n_train=60, n_val=10, frames=24, size=320, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    names = list(CLASSES)
    for si in range(n_train + n_val):
        split = "train" if si < n_train else "val"
        snip = f"synth_{si:04d}"
        ddir = os.path.join(root, "Data", "VID", split, snip)
        adir = os.path.join(root, "Annotations", "VID", split, snip)
        os.makedirs(ddir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        objs = [
            _Obj(rng, size, names[int(rng.integers(len(names)))])
            for _ in range(int(rng.integers(1, 3)))
        ]
        for t in range(frames):
            img = rng.normal(_BG_MEAN, 18, (size, size, 3)).clip(0, 255).astype(np.uint8)
            ann = []
            for tid, o in enumerate(objs):
                x1, y1, x2, y2 = o.box()
                if not o.occluded(t):
                    wnid, (r, g, b) = CLASSES[o.name]
                    img[y1:y2, x1:x2] = (
                        np.array([r, g, b])
                        + rng.normal(0, 8, (y2 - y1, x2 - x1, 3))
                    ).clip(0, 255).astype(np.uint8)
                # GT persists through occlusion (the occluder is camouflage
                # noise — indistinguishable from background for a single frame).
                ann.append((tid, CLASSES[o.name][0], (x1, y1, x2, y2)))
                o.step(size)
            stem = f"{t:06d}"
            cv2.imwrite(
                os.path.join(ddir, stem + ".JPEG"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95],
            )
            with open(os.path.join(adir, stem + ".xml"), "w") as f:
                f.write(_xml(snip, stem, size, size, ann))
    print(f"generated {n_train} train / {n_val} val snippets under {root}")


def _run(cmd, env):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, cwd=REPO, env=env,
                          capture_output=True, text=True)


def _parse_aps(stdout):
    aps = {}
    for line in stdout.splitlines():
        toks = line.replace(":", " ").split()
        if len(toks) >= 3 and toks[0] == "AP" and toks[1] in CLASSES:
            aps[toks[1]] = float(toks[2])
    return aps


def _parse_motion(stdout):
    """mAP(slow)/mAP(medium)/mAP(fast) lines from eval.py --motion_breakdown."""
    out = {}
    for line in stdout.splitlines():
        if line.startswith("mAP(") and "):" in line:
            cat = line[len("mAP("):line.index(")")]
            out[cat] = float(line.split(":")[1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_vid")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--seq_len", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--frame_batch_size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gen_only", action="store_true")
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--staged", action=argparse.BooleanOptionalAction, default=True,
                    help="reference-style staged training: frame model first, "
                         "clip model fine-tunes from it (--init_from)")
    ap.add_argument("--mixed_frames", type=int, default=0,
                    help="pass --mixed_frames N to the CLIP training (round-3 "
                         "cold-start diagnosis: restores scene diversity; "
                         "pair with --no-staged to A/B cold-start recipes)")
    ap.add_argument("--extra_train_args", default="",
                    help="extra flags appended to BOTH train commands (e.g. "
                         "'--stem s2d --temporal_cell light' to gate the fast "
                         "serving profile; eval picks the variant up from "
                         "model_meta.json automatically)")
    ap.add_argument("--precision_check", action="store_true",
                    help="also eval the temporal model with --precision bf16 "
                         "and int8 (serving profiles) and report each mAP "
                         "delta vs fp32 — the precision fidelity gates")
    args = ap.parse_args()

    data_root = os.path.join(args.out, "data")
    w_clip = os.path.join(args.out, "weights_clip")
    w_frame = os.path.join(args.out, "weights_frame")
    if not args.skip_gen:
        generate(data_root, seed=args.seed)
    if args.gen_only:
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    common = [
        "--dataset", "vid_320", "--data_root", data_root,
        "--lr", str(args.lr), "--warmup", "150",
        "--milestones", str(int(args.steps * 0.75)),
        "--no_photometric", "--log_every", "50", "--seed", str(args.seed),
        "--grad_clip", "10",
    ] + (args.extra_train_args.split() if args.extra_train_args else [])
    if not args.skip_train:
        _run([sys.executable, "train.py",
              "--batch_size", str(args.frame_batch_size),
              "--max_iter", str(args.steps),
              "--save_folder", w_frame, "--save_every", str(args.steps)] + common,
             env)
        staged = ["--init_from", w_frame] if args.staged else []
        mixed = (["--mixed_frames", str(args.mixed_frames)]
                 if args.mixed_frames else [])
        _run([sys.executable, "train.py", "--clip",
              "--seq_len", str(args.seq_len),
              "--batch_size", str(args.batch_size),
              "--max_iter", str(args.steps),
              "--save_folder", w_clip, "--save_every", str(args.steps)]
             + staged + mixed + common,
             env)

    ev = [sys.executable, "eval.py", "--dataset", "vid_320",
          "--data_root", data_root, "--split", "val", "--batch_size", "8"]
    out_t = _run(ev + ["--checkpoint", w_clip, "--temporal",
                       "--motion_breakdown"], env)
    out_f = _run(ev + ["--checkpoint", w_frame, "--motion_breakdown"], env)
    aps_t, aps_f = _parse_aps(out_t.stdout), _parse_aps(out_f.stdout)
    m = lambda a: float(np.mean([a[c] for c in CLASSES])) if len(a) == len(CLASSES) else None
    result = {
        "temporal_mAP": m(aps_t),
        "frame_mAP": m(aps_f),
        "temporal_per_class": aps_t,
        "frame_per_class": aps_f,
        "steps": args.steps,
    }
    if result["temporal_mAP"] is not None and result["frame_mAP"] is not None:
        result["temporal_advantage"] = round(
            result["temporal_mAP"] - result["frame_mAP"], 4
        )
    result["staged"] = bool(args.staged)
    result["mixed_frames"] = args.mixed_frames
    result["extra_train_args"] = args.extra_train_args
    # Motion-speed splits (eval.py --motion_breakdown): on this data the
    # temporal advantage should concentrate in the occlusion-heavy frames;
    # the split is the first harness surface for eval/motion.py.
    result["temporal_motion_mAP"] = _parse_motion(out_t.stdout)
    result["frame_motion_mAP"] = _parse_motion(out_f.stdout)
    if args.precision_check:
        for prec, flags in (
            ("bf16", ["--precision", "bf16"]),
            ("int8", ["--precision", "int8"]),
            ("int8_tcb", ["--precision", "int8", "--int8_tcb"]),
            # full-int8 pyramid incl. the recurrent cell — THE quality gate
            # for GRU quantization (state carried through occlusions)
            ("int8_full", ["--precision", "int8", "--int8_tcb", "--int8_gru"]),
        ):
            out_p = _run(ev + ["--checkpoint", w_clip, "--temporal"] + flags,
                         env)
            aps_p = _parse_aps(out_p.stdout)
            result[f"temporal_mAP_{prec}"] = m(aps_p)
            if result[f"temporal_mAP_{prec}"] is not None and result["temporal_mAP"] is not None:
                result[f"{prec}_delta"] = round(
                    result[f"temporal_mAP_{prec}"] - result["temporal_mAP"], 4
                )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
