"""Host-side numpy oracle for golden numerics tests.

Independently re-derived from the SSD/RefineDet equations (encode/decode with
variances, IoU, greedy NMS, bipartite+argmax matching) — deliberately written in
the naive dynamic-shape style so it is an *independent* check on the fixed-shape
TPU formulations in tdrn_tpu.ops, not a mirror of them.
"""

from __future__ import annotations

import numpy as np


def point_form(b):
    b = np.asarray(b, np.float64)
    return np.concatenate([b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1)


def center_size(b):
    b = np.asarray(b, np.float64)
    return np.concatenate([(b[..., :2] + b[..., 2:]) / 2, b[..., 2:] - b[..., :2]], -1)


def iou_matrix(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            x1 = max(a[i, 0], b[j, 0])
            y1 = max(a[i, 1], b[j, 1])
            x2 = min(a[i, 2], b[j, 2])
            y2 = min(a[i, 3], b[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            aa = max(a[i, 2] - a[i, 0], 0) * max(a[i, 3] - a[i, 1], 0)
            bb = max(b[j, 2] - b[j, 0], 0) * max(b[j, 3] - b[j, 1], 0)
            union = aa + bb - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def encode(matched_xyxy, priors_cxcywh, variances=(0.1, 0.2)):
    g = center_size(matched_xyxy)
    p = np.asarray(priors_cxcywh, np.float64)
    g_cxy = (g[..., :2] - p[..., :2]) / (variances[0] * p[..., 2:])
    g_wh = np.log(g[..., 2:] / p[..., 2:]) / variances[1]
    return np.concatenate([g_cxy, g_wh], -1)


def decode(loc, priors_cxcywh, variances=(0.1, 0.2)):
    loc = np.asarray(loc, np.float64)
    p = np.asarray(priors_cxcywh, np.float64)
    cxy = p[..., :2] + loc[..., :2] * variances[0] * p[..., 2:]
    wh = p[..., 2:] * np.exp(loc[..., 2:] * variances[1])
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)


def greedy_nms(boxes, scores, iou_thresh=0.45, top_k=200, score_thresh=0.0):
    """Dynamic-shape greedy NMS: returns indices of kept boxes in score order."""
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    cand = np.where(scores > score_thresh if score_thresh > 0 else scores > 0)[0]
    cand = cand[np.argsort(-scores[cand], kind="stable")][:top_k]
    keep = []
    suppressed = set()
    for i, ci in enumerate(cand):
        if ci in suppressed:
            continue
        keep.append(ci)
        for cj in cand[i + 1 :]:
            if cj in suppressed:
                continue
            if iou_matrix(boxes[ci : ci + 1], boxes[cj : cj + 1])[0, 0] > iou_thresh:
                suppressed.add(cj)
    return keep


def match(truths, labels, priors_cxcywh, threshold=0.5, variances=(0.1, 0.2)):
    """Reference-semantics matching (explicit loops). IoU is ranked in float32
    so argmax tie-breaks match the float32 device implementation."""
    overlaps = iou_matrix(truths, point_form(priors_cxcywh)).astype(np.float32)
    best_prior_idx = overlaps.argmax(1)  # per gt
    best_truth_overlap = overlaps.max(0)  # per prior
    best_truth_idx = overlaps.argmax(0)
    for j in range(len(truths)):  # force; later GTs win
        best_truth_idx[best_prior_idx[j]] = j
        best_truth_overlap[best_prior_idx[j]] = 2.0
    matched = np.asarray(truths)[best_truth_idx]
    conf = np.asarray(labels)[best_truth_idx] + 1
    conf[best_truth_overlap < threshold] = 0
    loc = encode(matched, priors_cxcywh, variances)
    return loc, conf, best_truth_overlap
