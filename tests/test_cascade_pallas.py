"""Fused ARM->ODM cascade kernel (ops/cascade_pallas.py) equivalence tests.

The kernel must reproduce ops/detection.decode_two_stage bit-for-near:
same two-stage decode, softmax, ARM filter — and the full detect() through
the fused path must match the unfused path exactly at the detection level.
Interpret mode on CPU; real-chip perf in BENCH.md.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.ops.cascade_pallas import fused_refine_cascade
from tdrn_tpu.ops.detection import RawPredictions, decode_two_stage, detect
from tdrn_tpu.ops.priors import prior_boxes


def _rand_preds(rng, b, p, c):
    return RawPredictions(
        jnp.asarray(rng.normal(size=(b, p, 4)).astype("f4") * 0.5),
        jnp.asarray(rng.normal(size=(b, p, 2)).astype("f4") * 2),
        jnp.asarray(rng.normal(size=(b, p, 4)).astype("f4") * 0.5),
        jnp.asarray(rng.normal(size=(b, p, c)).astype("f4") * 2),
    )


def test_cascade_matches_decode_two_stage():
    cfg = TINY_64
    priors = prior_boxes(cfg)
    p, c = priors.shape[0], cfg.num_classes
    preds = _rand_preds(np.random.default_rng(0), 2, p, c)

    ref_boxes, ref_scores = decode_two_stage(preds, priors, cfg)  # (B,P,4),(B,P,C)
    got_boxes, got_scores_cm = fused_refine_cascade(preds, priors, cfg, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got_boxes), np.asarray(ref_boxes), atol=1e-5, rtol=1e-5
    )
    # Reference zeroes only ARM-filtered anchors; the kernel also zeroes the
    # background column (the NMS path zeroes it downstream anyway).
    ref_cm = np.array(ref_scores).transpose(0, 2, 1).copy()
    ref_cm[:, 0, :] = 0.0
    np.testing.assert_allclose(
        np.asarray(got_scores_cm), ref_cm, atol=1e-5, rtol=1e-4
    )


def test_detect_fused_path_matches_unfused():
    cfg_fused = dataclasses.replace(TINY_64, fused_cascade=True)
    cfg_ref = dataclasses.replace(TINY_64, fused_cascade=False)
    priors = prior_boxes(TINY_64)
    preds = _rand_preds(np.random.default_rng(1), 2, priors.shape[0], TINY_64.num_classes)
    ref = np.asarray(detect(preds, priors, cfg_ref))
    got = np.asarray(detect(preds, priors, cfg_fused))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
