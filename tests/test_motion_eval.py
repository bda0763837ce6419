"""VID motion-speed mAP breakdown (tdrn_tpu/eval/motion.py).

The standard VID protocol bins GT by mean track IoU over a frame window
(slow > 0.9, medium 0.7-0.9, fast < 0.7) and reports per-bin mAP with
out-of-bin GT ignored via the VOC difficult mechanism.
"""

import os

import numpy as np

from tdrn_tpu.eval.motion import (
    MOTION_CATEGORIES,
    motion_categories_for_snippet,
    motion_gt_views,
    vid_motion_categories,
)
from tdrn_tpu.eval.voc_eval import evaluate_detections


def _box(x, y, s=20.0):
    return np.asarray([x, y, x + s, y + s], np.float32)


def _snippet(shifts, n_frames=5):
    """One track per shift, moving `shift` px/frame along x."""
    frames = []
    for f in range(n_frames):
        boxes = np.stack([_box(100 + s * f, 100) for s in shifts])
        tracks = np.arange(len(shifts), dtype=np.int32)
        frames.append((boxes, tracks))
    return frames


def test_motion_category_thresholds():
    # window=1: IoU of a 20px box shifted d px = (20-d)/(20+d)
    # d=0 -> 1.0 slow; d=2 -> 0.818 medium; d=5 -> 0.6 fast
    frames = _snippet([0.0, 2.0, 5.0])
    cats = motion_categories_for_snippet(frames, window=1)
    mid = cats[2]  # interior frame: neighbors on both sides
    assert mid.tolist() == [0, 1, 2]
    # edge frames (one-sided neighborhood) get the same categories here
    assert cats[0].tolist() == [0, 1, 2]


def test_single_frame_track_defaults_slow():
    boxes = np.asarray([[0, 0, 10, 10]], np.float32)
    frames = [
        (boxes, np.asarray([7], np.int32)),
        (np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)),
    ]
    cats = motion_categories_for_snippet(frames, window=10)
    assert cats[0].tolist() == [0]


def test_vid_motion_categories_from_annotation_tree(tmp_path):
    """End-to-end over an ILSVRC-style Annotations tree (track ids in XML)."""
    rel = "snip0"
    ann_dir = tmp_path / "Annotations" / "VID" / "val" / rel
    os.makedirs(ann_dir)
    stems = [f"{i:06d}" for i in range(4)]
    for f, stem in enumerate(stems):
        # track 0: static bear; track 1: bear moving 6 px/frame (fast @ w=1)
        objs = []
        for t, x in ((0, 50), (1, 50 + 6 * f)):
            objs.append(
                f"<object><trackid>{t}</trackid><name>n02131653</name>"
                f"<bndbox><xmin>{x}</xmin><ymin>10</ymin>"
                f"<xmax>{x + 20}</xmax><ymax>30</ymax></bndbox></object>"
            )
        (ann_dir / f"{stem}.xml").write_text(
            "<annotation>" + "".join(objs) + "</annotation>"
        )
    cats = vid_motion_categories(
        str(tmp_path), "val", [(rel, stems)], window=1
    )
    assert set(cats) == {f"{rel}/{s}" for s in stems}
    for s in stems:
        assert cats[f"{rel}/{s}"].tolist() == [0, 2]
    # frame_ids filter: only asked-for frames come back
    only = vid_motion_categories(
        str(tmp_path), "val", [(rel, stems)], frame_ids={f"{rel}/{stems[1]}"},
        window=1,
    )
    assert set(only) == {f"{rel}/{stems[1]}"}


def test_motion_breakdown_map_ignores_out_of_bin_gt():
    """Per-bin eval: out-of-bin GT is ignored (its matching detection is
    neither TP nor FP), empty bins give nan-skipped classes."""
    slow_box = _box(10, 10)
    fast_box = _box(60, 60)
    all_gt = {
        "img0": (
            np.stack([slow_box, fast_box]),
            np.asarray([0, 0], np.int64),
            np.zeros(2, bool),
        )
    }
    cats = {"img0": np.asarray([0, 2], np.int8)}  # slow, fast
    # Perfect detections on both GT boxes.
    dets = {0: {"img0": (np.stack([slow_box, fast_box]),
                         np.asarray([0.9, 0.8], np.float32))}}
    class_names = ("bear",)

    overall = evaluate_detections(all_gt, dets, class_names,
                                  use_07_metric=False)
    assert overall["mAP"] == 1.0

    views = dict(motion_gt_views(all_gt, cats))
    assert set(views) == set(MOTION_CATEGORIES)
    for cname in ("slow", "fast"):
        aps = evaluate_detections(views[cname], dets, class_names,
                                  use_07_metric=False,
                                  skip_empty_classes=True)
        # The out-of-bin detection matches an ignored GT -> not an FP.
        assert aps["mAP"] == 1.0, (cname, aps)
    aps_med = evaluate_detections(views["medium"], dets, class_names,
                                  use_07_metric=False,
                                  skip_empty_classes=True)
    assert np.isnan(aps_med["mAP"])  # no medium GT anywhere


def test_motion_views_preserve_existing_difficult():
    all_gt = {
        "img0": (
            np.stack([_box(0, 0), _box(40, 40)]),
            np.asarray([0, 0], np.int64),
            np.asarray([True, False]),
        )
    }
    cats = {"img0": np.asarray([0, 0], np.int8)}
    views = dict(motion_gt_views(all_gt, cats))
    _, _, diff_slow = views["slow"]["img0"]
    assert diff_slow.tolist() == [True, False]
    _, _, diff_fast = views["fast"]["img0"]
    assert diff_fast.tolist() == [True, True]
