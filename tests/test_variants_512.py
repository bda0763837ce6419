"""512-input + ResNet-101 variants: trace-only shape validation (jax.eval_shape
— no FLOPs, so full-width models are cheap to check on CPU)."""

import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import VID_512, VOC_320, VOC_512
from tdrn_tpu.models import build_detector
from tdrn_tpu.models.ssd import build_ssd


@pytest.mark.parametrize(
    "cfg,backbone",
    [
        (VOC_512, "vgg16"),
        (VOC_512, "resnet101"),
        (VID_512, "resnet101"),
        (VOC_320, "resnet101"),
    ],
)
def test_dual_refinement_shapes(cfg, backbone):
    model = build_detector(cfg, backbone=backbone, temporal=True)
    x = jax.ShapeDtypeStruct((2, cfg.size, cfg.size, 3), jnp.float32)
    state = [
        jax.ShapeDtypeStruct((2, f, f, 256), jnp.float32) for f in cfg.feature_maps
    ]
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, state)
    (preds, new_state) = jax.eval_shape(model.apply, params, x, state)
    p = cfg.num_priors
    assert preds.arm_loc.shape == (2, p, 4)
    assert preds.odm_conf.shape == (2, p, cfg.num_classes)
    assert [s.shape for s in new_state] == [(2, f, f, 256) for f in cfg.feature_maps]


def test_512_prior_count():
    assert VOC_512.num_priors == 16320  # (64²+32²+16²+8²)·3


def test_ssd_512_shapes():
    model = build_ssd(VOC_512)
    x = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    loc, conf = jax.eval_shape(model.apply, params, x)
    assert loc.shape == (1, VOC_512.num_priors, 4)
    assert conf.shape == (1, VOC_512.num_priors, 21)


def test_param_counts_full_width():
    """Sanity: full-width VGG dual-refinement model is in the expected range."""
    model = build_detector(VOC_320, temporal=True)
    x = jax.ShapeDtypeStruct((1, 320, 320, 3), jnp.float32)
    state = [jax.ShapeDtypeStruct((1, f, f, 256), jnp.float32) for f in VOC_320.feature_maps]
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, state)
    n = sum(int(jnp.prod(jnp.asarray(p.shape))) for p in jax.tree.leaves(params))
    assert 30e6 < n < 80e6, n  # VGG16-reduced (~23M) + TCB/GRU/heads
