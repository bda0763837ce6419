"""Pallas NMS kernel vs the jnp reference implementation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.ops import nms as N
from tdrn_tpu.ops import nms_pallas as NP
from tests.test_geometry import random_boxes

INTERPRET = jax.default_backend() != "tpu"


class TestPallasNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference(self, seed):
        rng = np.random.RandomState(seed)
        boxes = jnp.asarray(random_boxes(rng, 300))
        scores = jnp.asarray(rng.uniform(0, 1, 300).astype(np.float32))
        ref = N.nms_fixed(boxes, scores, 0.45, top_k=100)
        got = NP.nms_fixed_pallas(boxes, scores, 0.45, top_k=100, interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got.keep), np.asarray(ref.keep))

    def test_class_aware_matches_reference(self):
        rng = np.random.RandomState(3)
        boxes = jnp.asarray(random_boxes(rng, 200))
        cls_scores = jnp.asarray(rng.uniform(0, 1, (200, 7)).astype(np.float32))
        ref = N.class_aware_nms(boxes, cls_scores, 0.45, top_k=60, score_thresh=0.01)
        got = NP.class_aware_nms_pallas(
            boxes, cls_scores, 0.45, top_k=60, score_thresh=0.01, interpret=INTERPRET
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_score_thresh_and_padding(self):
        boxes = jnp.asarray([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.6, 0.6]], jnp.float32)
        scores = jnp.asarray([0.5, 0.005], jnp.float32)
        got = NP.nms_fixed_pallas(
            boxes, scores, 0.45, top_k=10, score_thresh=0.01, interpret=INTERPRET
        )
        assert got.scores.shape == (10,)
        assert int(got.keep.sum()) == 1
