"""Streaming (continuous-batching) eval runner: lane scheduling must not
change results vs sequential per-snippet processing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.eval.runner import finalize, new_accum, record, run_streaming
from tdrn_tpu.inference import StreamingDetector
from tests.helpers import tiny_detector


@pytest.fixture(scope="module")
def setup():
    model = tiny_detector(temporal=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, model.zero_state(1))
    rng = np.random.RandomState(0)
    snippets = []
    for s in range(3):
        frames = []
        for t in range(2 + s):  # uneven lengths: 2, 3, 4 frames
            frames.append(
                (f"s{s}/f{t}", (64, 64), rng.randint(0, 255, (64, 64, 3), np.uint8))
            )
        snippets.append(frames)
    return model, params, snippets


def _sequential_reference(model, params, snippets, score_thresh):
    """One lane, one snippet at a time — the trivially-correct ordering."""
    accum = new_accum()
    det = StreamingDetector(model, params, num_streams=1)
    for snip in snippets:
        det.reset()
        for img_id, hw, frame in snip:
            out = det.detect(frame[None])
            record(
                accum, img_id, hw,
                np.asarray(out.boxes)[0], np.asarray(out.scores)[0],
                np.asarray(out.classes)[0], score_thresh,
            )
    return finalize(accum)


@pytest.mark.parametrize("lanes", [1, 2])
def test_streaming_matches_sequential(setup, lanes):
    model, params, snippets = setup
    want = _sequential_reference(model, params, snippets, 0.01)
    det = StreamingDetector(model, params, num_streams=lanes)
    got = finalize(run_streaming(det, snippets, 0.01, progress_every=0))
    assert set(got.keys()) == set(want.keys())
    for ci in want:
        assert set(got[ci].keys()) == set(want[ci].keys()), ci
        for img_id in want[ci]:
            gb, gs = got[ci][img_id]
            wb, ws = want[ci][img_id]
            np.testing.assert_allclose(np.sort(gs), np.sort(ws), atol=1e-4)
            np.testing.assert_allclose(
                gb[np.argsort(gs)], wb[np.argsort(ws)], atol=1e-3
            )
