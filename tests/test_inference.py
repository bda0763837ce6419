"""Streaming / clip inference pipelines (BASELINE.json configs 3 & 4 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.inference import (
    StreamingDetector,
    make_clip_forward,
    make_single_image_forward,
)
from tests.helpers import tiny_detector


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_detector(temporal=True)
    x = jnp.zeros((2, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, model.zero_state(2))
    return model, params


class TestStreaming:
    def test_detect_contract(self, model_and_params):
        model, params = model_and_params
        det = StreamingDetector(model, params, num_streams=2, top_k=25)
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
        out = det.detect(frames)
        assert out.boxes.shape == (2, 25, 4)
        assert out.scores.shape == (2, 25)
        assert out.classes.shape == (2, 25)

    def test_state_carries_and_resets(self, model_and_params):
        model, params = model_and_params
        det = StreamingDetector(model, params, num_streams=1, top_k=10)
        rng = np.random.RandomState(1)
        frame = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
        out1 = det.detect(frame)
        out2 = det.detect(frame)  # same frame, carried state -> different scores
        assert not np.allclose(np.asarray(out1.scores), np.asarray(out2.scores))
        det.reset()
        out3 = det.detect(frame)  # reset -> identical to the first call
        np.testing.assert_allclose(
            np.asarray(out1.scores), np.asarray(out3.scores), atol=1e-5
        )

    def test_per_stream_reset(self, model_and_params):
        model, params = model_and_params
        det = StreamingDetector(model, params, num_streams=2, top_k=10)
        rng = np.random.RandomState(2)
        frames = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
        first = det.detect(frames)
        det.detect(frames)
        det.reset([0])  # reset only stream 0
        out = det.detect(frames)
        np.testing.assert_allclose(
            np.asarray(first.scores[0]), np.asarray(out.scores[0]), atol=1e-5
        )
        assert not np.allclose(np.asarray(first.scores[1]), np.asarray(out.scores[1]))


class TestClipForward:
    def test_clip_scan_matches_streaming(self, model_and_params):
        """lax.scan over a clip == frame-by-frame streaming with carried state."""
        model, params = model_and_params
        rng = np.random.RandomState(3)
        clip = rng.randint(0, 255, (3, 1, 64, 64, 3), np.uint8)
        run = make_clip_forward(model, top_k=10)
        dets = run(params, jnp.asarray(clip))
        assert dets.scores.shape == (3, 1, 10)

        stream = StreamingDetector(model, params, num_streams=1, top_k=10)
        for t in range(3):
            out = stream.detect(clip[t])
            np.testing.assert_allclose(
                np.asarray(dets.scores[t]), np.asarray(out.scores), atol=1e-5
            )

    def test_single_image_forward(self, model_and_params):
        model, params = model_and_params
        run = make_single_image_forward(model, top_k=15)
        rng = np.random.RandomState(4)
        imgs = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
        out = run(params, jnp.asarray(imgs))
        assert out.boxes.shape == (2, 15, 4)
