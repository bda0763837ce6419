"""SSD single-stage variant + DRN anchor-offset coupling tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models.offset import bilinear_shift
from tdrn_tpu.models.ssd import build_ssd, ssd_detect_topk
from tdrn_tpu.ops.priors import prior_boxes
from tdrn_tpu.train import Targets
from tdrn_tpu.train.loss import multibox_loss
from tests.test_loss import synth_batch


class TestBilinearShift:
    def test_zero_offset_identity(self):
        rng = np.random.RandomState(0)
        feat = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        z = jnp.zeros((2, 8, 8))
        np.testing.assert_allclose(
            np.asarray(bilinear_shift(feat, z, z)), np.asarray(feat), atol=1e-6
        )

    def test_integer_shift(self):
        rng = np.random.RandomState(1)
        feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        dy = jnp.ones((1, 8, 8))
        dx = jnp.zeros((1, 8, 8))
        out = np.asarray(bilinear_shift(feat, dy, dx))
        # row r of the output equals row r+1 of the input (clamped at border)
        np.testing.assert_allclose(out[0, :7], np.asarray(feat)[0, 1:], atol=1e-6)
        np.testing.assert_allclose(out[0, 7], np.asarray(feat)[0, 7], atol=1e-6)

    def test_half_pixel_interpolates(self):
        feat = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(1.0)
        dy = jnp.full((1, 4, 4), 0.5)
        dx = jnp.zeros((1, 4, 4))
        out = np.asarray(bilinear_shift(feat, dy, dx))
        assert out[0, 0, 1, 0] == pytest.approx(0.5)
        assert out[0, 1, 1, 0] == pytest.approx(0.5)

    def test_gradients(self):
        rng = np.random.RandomState(2)
        feat = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))

        def f(d):
            return jnp.sum(bilinear_shift(feat, d, d) ** 2)

        g = jax.grad(f)(jnp.full((1, 6, 6), 0.3))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestSSD:
    @pytest.fixture(scope="class")
    def ssd(self):
        model = build_ssd(TINY_64, width_mult=0.125)
        x = jnp.zeros((2, 64, 64, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        return model, params

    def test_forward_shapes(self, ssd):
        model, params = ssd
        loc, conf = model.apply(params, jnp.zeros((2, 64, 64, 3)))
        assert loc.shape == (2, TINY_64.num_priors, 4)
        assert conf.shape == (2, TINY_64.num_priors, TINY_64.num_classes)

    def test_detect_api(self, ssd):
        model, params = ssd
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        loc, conf = model.apply(params, x)
        top = ssd_detect_topk(loc, conf, prior_boxes(TINY_64), TINY_64, top_k=20)
        assert top.boxes.shape == (2, 20, 4)
        assert top.scores.shape == (2, 20)

    def test_multibox_loss_trains(self, ssd):
        model, params = ssd
        rng = np.random.RandomState(1)
        images, targets = synth_batch(rng, batch=2)
        priors = prior_boxes(TINY_64)

        def loss_fn(p):
            loc, conf = model.apply(p, images)
            return multibox_loss(loc, conf, priors, targets, TINY_64)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
