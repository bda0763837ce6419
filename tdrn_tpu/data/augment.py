"""SSD training augmentation pipeline.

TPU-native re-design of the reference's ``utils/augmentations.py``
(SURVEY.md §2 #7): photometric distortion (brightness/contrast/saturation/hue +
channel swap), expand-with-mean-fill (<=4x), IoU-constrained random crop,
horizontal mirror, resize, mean subtraction. Implemented as pure-numpy
host-side transforms (the geometric ops are data-dependent and belong on the
CPU feeding pipeline — grain workers — not in the jitted graph); the *eval*
path's resize/normalize lives on-device in ``ops/preprocess.py`` instead.

All randomness is explicit via a passed ``np.random.Generator`` so augmented
pipelines are reproducible and shardable across loader workers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

Array = np.ndarray

# IoU-constraint choices for the random crop (reference's sample options):
# each entry is (min_iou, max_iou); None = no constraint; "keep" = no crop.
_CROP_MODES = (None, 0.1, 0.3, 0.7, 0.9, "any")


def photometric_distort(img: Array, rng: np.random.Generator) -> Array:
    """Random brightness/contrast/saturation/hue/channel-swap. img: float32 RGB HWC."""
    img = img.copy()
    # brightness
    if rng.random() < 0.5:
        img += rng.uniform(-32, 32)
    # contrast (order randomized like the reference's two distort orders)
    contrast_first = rng.random() < 0.5
    if contrast_first and rng.random() < 0.5:
        img *= rng.uniform(0.5, 1.5)
    # saturation/hue in HSV
    if rng.random() < 0.5 or rng.random() < 0.5:
        import cv2

        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
            np.float32
        )
        if rng.random() < 0.5:
            hsv[..., 1] *= rng.uniform(0.5, 1.5)
        if rng.random() < 0.5:
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-18, 18)) % 180
        hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(np.float32)
    if not contrast_first and rng.random() < 0.5:
        img *= rng.uniform(0.5, 1.5)
    # lighting noise: random channel permutation
    if rng.random() < 0.5:
        img = img[..., rng.permutation(3)]
    return np.clip(img, 0, 255)


def expand(
    img: Array, boxes: Array, mean: Tuple[float, float, float], rng: np.random.Generator
) -> Tuple[Array, Array]:
    """Place the image on a larger mean-filled canvas (zoom-out), p=0.5."""
    if rng.random() < 0.5:
        return img, boxes
    h, w, c = img.shape
    ratio = rng.uniform(1.0, 4.0)
    left = rng.uniform(0, w * ratio - w)
    top = rng.uniform(0, h * ratio - h)
    canvas = np.empty((int(h * ratio), int(w * ratio), c), img.dtype)
    canvas[...] = mean
    canvas[int(top) : int(top) + h, int(left) : int(left) + w] = img
    boxes = boxes.copy()
    if len(boxes):
        boxes[:, 0::2] += left
        boxes[:, 1::2] += top
    return canvas, boxes


def _iou_1toN(box: Array, boxes: Array) -> Array:
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-12)


def random_sample_crop(
    img: Array, boxes: Array, labels: Array, rng: np.random.Generator, max_trials: int = 50
):
    """IoU-constrained random crop keeping boxes whose centers fall inside."""
    if len(boxes) == 0:
        return img, boxes, labels
    h, w, _ = img.shape
    while True:
        mode = _CROP_MODES[rng.integers(len(_CROP_MODES))]
        if mode is None:
            return img, boxes, labels
        min_iou = 0.0 if mode == "any" else float(mode)
        for _ in range(max_trials):
            cw = rng.uniform(0.3 * w, w)
            ch = rng.uniform(0.3 * h, h)
            if not 0.5 <= cw / ch <= 2.0:
                continue
            left = rng.uniform(0, w - cw)
            top = rng.uniform(0, h - ch)
            rect = np.asarray([left, top, left + cw, top + ch])
            ious = _iou_1toN(rect, boxes)
            if ious.min() < min_iou:
                continue
            centers = (boxes[:, :2] + boxes[:, 2:]) / 2
            inside = (
                (centers[:, 0] > rect[0])
                & (centers[:, 1] > rect[1])
                & (centers[:, 0] < rect[2])
                & (centers[:, 1] < rect[3])
            )
            if not inside.any():
                continue
            new_img = img[int(rect[1]) : int(rect[3]), int(rect[0]) : int(rect[2])]
            new_boxes = boxes[inside].copy()
            new_boxes[:, :2] = np.maximum(new_boxes[:, :2], rect[:2]) - rect[:2]
            new_boxes[:, 2:] = np.minimum(new_boxes[:, 2:], rect[2:]) - rect[:2]
            new_labels = labels[inside]
            # Drop degenerate slivers (clipped to <2px): their encode targets
            # (log of ~0 extents) explode the loc loss.
            ok = ((new_boxes[:, 2] - new_boxes[:, 0]) >= 2.0) & (
                (new_boxes[:, 3] - new_boxes[:, 1]) >= 2.0
            )
            if not ok.any():
                continue
            return new_img, new_boxes[ok], new_labels[ok]


def mirror(img: Array, boxes: Array, rng: np.random.Generator):
    if rng.random() < 0.5:
        _, w, _ = img.shape
        img = img[:, ::-1]
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, 0::2] = w - boxes[:, 2::-2]
    return img, boxes


class SSDAugmentation:
    """Full train-time pipeline (reference ``SSDAugmentation`` semantics).

    __call__(img uint8 RGB HWC, boxes pixel xyxy (N,4), labels (N,))
      -> (float32 (size,size,3) mean-subtracted, boxes normalized xyxy, labels)
    """

    def __init__(self, size: int, mean=(123.0, 117.0, 104.0), seed: Optional[int] = None,
                 photometric: bool = True):
        self.size = size
        self.mean = mean
        self.photometric = photometric
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: Array, boxes: Array, labels: Array):
        import cv2

        rng = self.rng
        img = img.astype(np.float32)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int32)

        if self.photometric:
            img = photometric_distort(img, rng)
        img, boxes = expand(img, boxes, self.mean, rng)
        img, boxes, labels = random_sample_crop(img, boxes, labels, rng)
        img, boxes = mirror(img, boxes, rng)

        h, w, _ = img.shape
        img = cv2.resize(img, (self.size, self.size)).astype(np.float32)
        img -= self.mean
        if len(boxes):
            boxes = boxes / np.asarray([w, h, w, h], np.float32)
            boxes = np.clip(boxes, 0.0, 1.0)
            # final degenerate filter (mirrors the crop-stage one)
            ok = ((boxes[:, 2] - boxes[:, 0]) >= 2.0 / self.size) & (
                (boxes[:, 3] - boxes[:, 1]) >= 2.0 / self.size
            )
            boxes, labels = boxes[ok], labels[ok]
        return img, boxes, labels


class BaseTransform:
    """Eval/stream host-side preprocess (reference ``BaseTransform``); prefer
    the in-graph ``ops.preprocess`` path on TPU — this exists for parity and
    for host-side tooling."""

    def __init__(self, size: int, mean=(123.0, 117.0, 104.0)):
        self.size = size
        self.mean = mean

    def __call__(self, img: Array):
        import cv2

        out = cv2.resize(img.astype(np.float32), (self.size, self.size))
        return out - self.mean
