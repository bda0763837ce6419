"""Golden numerics tests for the geometry core (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from tdrn_tpu import VOC_320, VOC_512
from tdrn_tpu.ops import boxes as B
from tdrn_tpu.ops import priors as P
from tdrn_tpu.ops import matching as M
from tdrn_tpu.ops import nms as N


def random_boxes(rng, n):
    """Random valid xyxy boxes in [0, 1]."""
    cxy = rng.uniform(0.15, 0.85, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)


class TestBoxForms:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        b = random_boxes(rng, 64)
        out = np.asarray(B.point_form(B.center_size(jnp.asarray(b))))
        np.testing.assert_allclose(out, b, atol=1e-6)

    def test_against_oracle(self):
        rng = np.random.RandomState(1)
        b = random_boxes(rng, 32)
        np.testing.assert_allclose(
            np.asarray(B.center_size(jnp.asarray(b))), oracle.center_size(b), atol=1e-6
        )


class TestIoU:
    def test_pairwise_vs_oracle(self):
        rng = np.random.RandomState(2)
        a = random_boxes(rng, 17)
        b = random_boxes(rng, 23)
        got = np.asarray(B.iou(jnp.asarray(a), jnp.asarray(b)))
        want = oracle.iou_matrix(a, b)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identity(self):
        rng = np.random.RandomState(3)
        a = random_boxes(rng, 8)
        d = np.diag(np.asarray(B.iou(jnp.asarray(a), jnp.asarray(a))))
        np.testing.assert_allclose(d, 1.0, atol=1e-6)

    def test_disjoint(self):
        a = jnp.asarray([[0.0, 0.0, 0.1, 0.1]])
        b = jnp.asarray([[0.5, 0.5, 0.6, 0.6]])
        assert float(B.iou(a, b)[0, 0]) == 0.0


class TestEncodeDecode:
    def test_roundtrip(self):
        rng = np.random.RandomState(4)
        gt = random_boxes(rng, 128)
        pri = oracle.center_size(random_boxes(rng, 128)).astype(np.float32)
        enc = B.encode(jnp.asarray(gt), jnp.asarray(pri))
        dec = np.asarray(B.decode(enc, jnp.asarray(pri)))
        np.testing.assert_allclose(dec, gt, atol=1e-4)

    def test_vs_oracle(self):
        rng = np.random.RandomState(5)
        gt = random_boxes(rng, 64)
        pri = oracle.center_size(random_boxes(rng, 64)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(B.encode(jnp.asarray(gt), jnp.asarray(pri))),
            oracle.encode(gt, pri),
            atol=1e-3,
            rtol=1e-3,
        )
        loc = rng.randn(64, 4).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(B.decode(jnp.asarray(loc), jnp.asarray(pri))),
            oracle.decode(loc, pri),
            atol=1e-3,
            rtol=1e-3,
        )


class TestPriors:
    @pytest.mark.parametrize("cfg", [VOC_320, VOC_512])
    def test_count_and_range(self, cfg):
        pri = P.prior_boxes_np(cfg)
        assert pri.shape == (cfg.num_priors, 4)
        assert (pri >= 0).all() and (pri <= 1).all()

    def test_320_count_matches_survey(self):
        # SURVEY.md §2 #12: 6375 priors @320 = (40²+20²+10²+5²)·3
        assert VOC_320.num_priors == 6375
        assert VOC_512.num_priors == 16320

    def test_first_cell_geometry(self):
        pri = P.prior_boxes_np(VOC_320)
        # first prior: cell (0,0) of the 40×40 map, step 8, min_size 32.
        np.testing.assert_allclose(
            pri[0], [0.5 * 8 / 320, 0.5 * 8 / 320, 32 / 320, 32 / 320], atol=1e-6
        )
        # ratio-2 anchors follow.
        rt = np.sqrt(2.0)
        np.testing.assert_allclose(pri[1, 2:], [32 / 320 * rt, 32 / 320 / rt], atol=1e-6)
        np.testing.assert_allclose(pri[2, 2:], [32 / 320 / rt, 32 / 320 * rt], atol=1e-6)

    def test_row_major_cell_order(self):
        pri = P.prior_boxes_np(VOC_320)
        # second cell (i=0, j=1) starts at index 3 (3 anchors/cell): cx advances.
        np.testing.assert_allclose(pri[3, 0], 1.5 * 8 / 320, atol=1e-6)
        np.testing.assert_allclose(pri[3, 1], 0.5 * 8 / 320, atol=1e-6)


class TestMatching:
    def test_vs_oracle(self):
        rng = np.random.RandomState(6)
        pri = oracle.center_size(random_boxes(rng, 200)).astype(np.float32)
        gt = random_boxes(rng, 5)
        labels = rng.randint(0, 20, 5).astype(np.int32)
        want_loc, want_conf, _ = oracle.match(gt, labels, pri)

        res = M.match(
            jnp.asarray(gt), jnp.asarray(labels), jnp.ones(5, bool), jnp.asarray(pri)
        )
        got_conf = np.asarray(res.conf_targets)
        np.testing.assert_array_equal(got_conf, want_conf)
        pos = want_conf > 0
        np.testing.assert_allclose(
            np.asarray(res.loc_targets)[pos], want_loc[pos], atol=1e-4
        )

    def test_padding_invariance(self):
        rng = np.random.RandomState(7)
        pri = oracle.center_size(random_boxes(rng, 150)).astype(np.float32)
        gt = random_boxes(rng, 4)
        labels = rng.randint(0, 20, 4).astype(np.int32)
        res_a = M.match(
            jnp.asarray(gt), jnp.asarray(labels), jnp.ones(4, bool), jnp.asarray(pri)
        )
        # pad with garbage rows marked invalid
        gt_p = np.concatenate([gt, random_boxes(rng, 6)], 0)
        lab_p = np.concatenate([labels, rng.randint(0, 20, 6).astype(np.int32)])
        valid = np.asarray([True] * 4 + [False] * 6)
        res_b = M.match(
            jnp.asarray(gt_p), jnp.asarray(lab_p), jnp.asarray(valid), jnp.asarray(pri)
        )
        np.testing.assert_array_equal(
            np.asarray(res_a.conf_targets), np.asarray(res_b.conf_targets)
        )
        np.testing.assert_allclose(
            np.asarray(res_a.loc_targets), np.asarray(res_b.loc_targets), atol=1e-6
        )

    def test_every_gt_gets_a_prior(self):
        rng = np.random.RandomState(8)
        pri = oracle.center_size(random_boxes(rng, 300)).astype(np.float32)
        gt = random_boxes(rng, 7)
        labels = np.arange(7, dtype=np.int32)
        res = M.match(
            jnp.asarray(gt), jnp.asarray(labels), jnp.ones(7, bool), jnp.asarray(pri)
        )
        conf = np.asarray(res.conf_targets)
        # force-assignment guarantees >= 1 positive per GT class (distinct best
        # priors may collide only if two GTs share a best prior)
        assert (conf > 0).sum() >= 1

    def test_no_valid_gt_all_background(self):
        rng = np.random.RandomState(9)
        pri = oracle.center_size(random_boxes(rng, 100)).astype(np.float32)
        gt = np.zeros((3, 4), np.float32)
        res = M.match(
            jnp.asarray(gt),
            jnp.zeros(3, jnp.int32),
            jnp.zeros(3, bool),
            jnp.asarray(pri),
        )
        assert (np.asarray(res.conf_targets) == 0).all()
        assert np.isfinite(np.asarray(res.loc_targets)).all()


class TestNMS:
    def test_vs_oracle(self):
        rng = np.random.RandomState(10)
        boxes = random_boxes(rng, 80)
        scores = rng.uniform(0, 1, 80).astype(np.float32)
        want_keep = oracle.greedy_nms(boxes, scores, 0.45, top_k=50)
        res = N.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=50)
        got_scores = np.asarray(res.scores)
        got_scores = got_scores[got_scores > 0]
        want_scores = np.sort(scores[want_keep])[::-1]
        np.testing.assert_allclose(got_scores, want_scores, atol=1e-6)
        got_boxes = np.asarray(res.boxes)[np.asarray(res.keep)]
        want_boxes = boxes[want_keep]
        np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-6)

    def test_clustered_duplicates(self):
        # 3 clusters of near-identical boxes; NMS must keep one per cluster.
        base = np.asarray(
            [[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.7, 0.7], [0.2, 0.6, 0.4, 0.8]],
            np.float32,
        )
        boxes, scores = [], []
        rng = np.random.RandomState(11)
        for k in range(3):
            for _ in range(10):
                boxes.append(base[k] + rng.uniform(-0.005, 0.005, 4))
                scores.append(rng.uniform(0.5, 1.0))
        boxes = np.asarray(boxes, np.float32)
        scores = np.asarray(scores, np.float32)
        res = N.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=30)
        assert int(np.asarray(res.keep).sum()) == 3

    def test_score_thresh(self):
        boxes = jnp.asarray([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.6, 0.6]])
        scores = jnp.asarray([0.5, 0.005])
        res = N.nms_fixed(boxes, scores, 0.45, top_k=10, score_thresh=0.01)
        assert int(res.keep.sum()) == 1

    def test_class_aware_shapes(self):
        rng = np.random.RandomState(12)
        boxes = jnp.asarray(random_boxes(rng, 100))
        cls_scores = jnp.asarray(rng.uniform(0, 1, (100, 21)).astype(np.float32))
        out = N.class_aware_nms(boxes, cls_scores, top_k=50)
        assert out.shape == (21, 50, 5)
        # background row empty
        assert float(jnp.abs(out[0]).sum()) == 0.0

    def test_flatten_detections(self):
        rng = np.random.RandomState(13)
        boxes = jnp.asarray(random_boxes(rng, 60))
        cls_scores = jnp.asarray(rng.uniform(0, 1, (60, 5)).astype(np.float32))
        det = N.class_aware_nms(boxes, cls_scores, top_k=20)
        top = N.flatten_detections(det, top_k=20)
        assert top.boxes.shape == (20, 4)
        s = np.asarray(top.scores)
        assert (np.diff(s) <= 1e-6).all()  # sorted descending
        assert (np.asarray(top.classes)[s > 0] > 0).all()

    def test_jit_fixed_shape(self):
        f = jax.jit(lambda b, s: N.nms_fixed(b, s, 0.45, 50))
        rng = np.random.RandomState(14)
        boxes = jnp.asarray(random_boxes(rng, 100))
        r = f(boxes, jnp.asarray(rng.uniform(0, 1, 100).astype(np.float32)))
        assert r.scores.shape == (50,)
