"""Bitwise equivalence of the augmentation fast paths (data/augment.py).

The host augmentation pipeline is the measured train-throughput bottleneck on
small hosts (16 ms/sample before round 3's fast paths). Both optimizations
must be EXACT — same random stream, same output bits — so the fast paths are
pinned against the reference formulations here.
"""

import numpy as np

from tdrn_tpu.data.augment import (
    PhotoParams,
    SSDAugmentation,
    apply_crop,
    apply_expand,
    apply_expand_crop,
    apply_photo,
    sample_photo,
)


def _photo_reference(img, p):
    """The pre-round-3 float formulation of apply_photo (kept as the oracle)."""
    import cv2

    img = img.copy()
    if p.brightness is not None:
        img += p.brightness
    if p.contrast_first and p.contrast is not None:
        img *= p.contrast
    if p.saturation is not None or p.hue is not None:
        hsv = cv2.cvtColor(
            np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
        ).astype(np.float32)
        if p.saturation is not None:
            hsv[..., 1] = np.clip(hsv[..., 1] * p.saturation, 0, 255)
        if p.hue is not None:
            hsv[..., 0] = (hsv[..., 0] + p.hue) % 180
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)
    if not p.contrast_first and p.contrast is not None:
        img *= p.contrast
    if p.perm is not None:
        img = img[..., list(p.perm)]
    return np.clip(img, 0, 255)


def test_photo_lut_matches_float_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.float32)
    for i in range(40):
        p = sample_photo(np.random.default_rng(i))
        ref = _photo_reference(img, p)
        fast = apply_photo(img, p)
        assert fast.dtype == ref.dtype
        np.testing.assert_array_equal(fast, ref, err_msg=repr(p))


def test_photo_inplace_does_not_alias_caller_input():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (20, 20, 3)).astype(np.float32)
    keep = img.copy()
    p = PhotoParams(brightness=10.0, contrast=1.2, contrast_first=True,
                    saturation=None, hue=None, perm=None)
    out = apply_photo(img, p)  # default inplace=False
    assert not np.shares_memory(out, img)
    np.testing.assert_array_equal(img, keep)


def test_fused_expand_crop_matches_sequential():
    rng = np.random.default_rng(2)
    for trial in range(30):
        h, w = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        n = int(rng.integers(1, 5))
        x1 = rng.uniform(0, w - 10, n)
        y1 = rng.uniform(0, h - 10, n)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(5, 30, n), y1 + rng.uniform(5, 30, n)],
            axis=1,
        ).astype(np.float32)
        labels = rng.integers(1, 5, n).astype(np.int32)
        ratio = float(rng.uniform(1.0, 4.0))
        left = float(rng.uniform(0, w * ratio - w))
        top = float(rng.uniform(0, h * ratio - h))
        ep = (ratio, left, top)
        eh, ew = int(h * ratio), int(w * ratio)
        cw, ch = rng.uniform(0.3 * ew, ew), rng.uniform(0.3 * eh, eh)
        cl, ct = rng.uniform(0, ew - cw), rng.uniform(0, eh - ch)
        rect = np.asarray([cl, ct, cl + cw, ct + ch])

        mean = (123.0, 117.0, 104.0)
        eimg, eboxes = apply_expand(img, boxes, ep, mean)
        ref_img, ref_boxes, ref_labels = apply_crop(eimg, eboxes, labels, rect)
        f_img, f_boxes, f_labels = apply_expand_crop(
            img, boxes, labels, ep, rect, mean
        )
        np.testing.assert_array_equal(f_img, ref_img)
        np.testing.assert_array_equal(f_boxes, ref_boxes)
        np.testing.assert_array_equal(f_labels, ref_labels)


def test_pipeline_deterministic_per_seed():
    """Same seed -> same output through the full fast-path pipeline."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (90, 120, 3), dtype=np.uint8)
    boxes = np.asarray([[10.0, 12.0, 70.0, 60.0]], np.float32)
    labels = np.asarray([2], np.int32)
    outs = []
    for _ in range(2):
        aug = SSDAugmentation(64, seed=7)
        outs.append(aug(img, boxes, labels))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
