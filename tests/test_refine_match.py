"""refine_match semantics: matching against per-image ARM-refined anchors
(the B,P,4 priors path of match_batch) and its use inside the refine loss."""

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from tdrn_tpu.config import TINY_64
from tdrn_tpu.ops import boxes as B
from tdrn_tpu.ops.matching import match, match_batch
from tdrn_tpu.ops.priors import prior_boxes_np
from tests.test_geometry import random_boxes


def test_per_image_refined_priors_path():
    """match_batch with (B, P, 4) priors must equal per-image match calls."""
    rng = np.random.RandomState(0)
    p = 150
    batch = 3
    refined = np.stack(
        [oracle.center_size(random_boxes(rng, p)).astype(np.float32) for _ in range(batch)]
    )
    gt = np.stack([random_boxes(rng, 4) for _ in range(batch)])
    labels = rng.randint(0, 10, (batch, 4)).astype(np.int32)
    valid = np.ones((batch, 4), bool)

    res = match_batch(
        jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid), jnp.asarray(refined)
    )
    for b in range(batch):
        ref = match(
            jnp.asarray(gt[b]), jnp.asarray(labels[b]), jnp.ones(4, bool),
            jnp.asarray(refined[b]),
        )
        np.testing.assert_array_equal(
            np.asarray(res.conf_targets[b]), np.asarray(ref.conf_targets)
        )
        np.testing.assert_allclose(
            np.asarray(res.loc_targets[b]), np.asarray(ref.loc_targets), atol=1e-6
        )


def test_refined_anchors_improve_matching():
    """The two-stage premise: anchors decoded toward GT match more positives
    than the raw priors."""
    rng = np.random.RandomState(1)
    cfg = TINY_64
    priors = prior_boxes_np(cfg)
    # one GT box poorly covered by the static grid
    gt = np.asarray([[0.13, 0.21, 0.52, 0.77]], np.float32)
    labels = np.zeros((1,), np.int32)
    valid = np.ones((1,), bool)

    base = match(jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid),
                 jnp.asarray(priors), threshold=0.5)
    n_base = int((np.asarray(base.conf_targets) > 0).sum())

    # simulate a perfect ARM: encode GT against priors, decode back -> anchors on GT
    enc = B.encode(jnp.broadcast_to(jnp.asarray(gt), (len(priors), 4)), jnp.asarray(priors))
    refined = B.decode(enc, jnp.asarray(priors))
    refined_cs = B.center_size(refined)
    re = match(jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid),
               refined_cs, threshold=0.5)
    n_refined = int((np.asarray(re.conf_targets) > 0).sum())
    assert n_refined > n_base
    assert n_refined == len(priors)  # every anchor decoded exactly onto the GT


def test_loss_uses_refined_anchors():
    """odm loc targets must be encoded w.r.t. ARM-refined anchors, not priors."""
    from tdrn_tpu.ops.detection import RawPredictions
    from tdrn_tpu.train import Targets, refine_multibox_loss

    cfg = TINY_64
    rng = np.random.RandomState(2)
    p = cfg.num_priors
    priors = jnp.asarray(prior_boxes_np(cfg))
    gt = jnp.asarray(random_boxes(rng, 2)[None])
    targets = Targets(gt, jnp.zeros((1, 2), jnp.int32), jnp.ones((1, 2), bool))

    arm_loc_a = jnp.zeros((1, p, 4))
    arm_loc_b = jnp.asarray(rng.randn(1, p, 4).astype(np.float32))
    base = RawPredictions(arm_loc_a, jnp.zeros((1, p, 2)),
                          jnp.zeros((1, p, 4)), jnp.zeros((1, p, cfg.num_classes)))
    moved = base._replace(arm_loc=arm_loc_b)
    _, m_a = refine_multibox_loss(base, priors, targets, cfg)
    _, m_b = refine_multibox_loss(moved, priors, targets, cfg)
    # different ARM regressions -> different ODM matching/normalization
    assert float(m_a["odm_loc"]) != float(m_b["odm_loc"])
