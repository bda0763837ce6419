"""Pipelined (chunked) streaming equivalence (VERDICT round-2 item 5).

TDRN.chunk=F batches the state-independent model across F consecutive frames
per stream while the temporal cell steps them sequentially inside the same
program. The restructure is EXACT at the model level (bit-identical preds and
state, asserted below). End-to-end StreamingDetector outputs are compared
with a float tolerance instead: the chunked step compiles at batch F*S, so
XLA fuses the in-graph uint8 preprocess differently than the batch-S program
and scores drift by ~1 ULP — enough to swap near-tied rows in the top-k
ordering of a random-init model, but semantically identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdrn_tpu.inference import StreamingDetector
from tests.helpers import tiny_detector


@pytest.fixture(scope="module")
def model_params():
    model = tiny_detector(temporal=True)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, model.zero_state(2))
    return model, params


def test_chunk_model_equivalent(model_params):
    """chunk=2 forward == two chunk=1 forwards. Mathematically an identity
    restructure; compared at tight float tolerance because conv kernels tile
    differently at batch 4 vs 2 (reassociated accumulation ~1e-6)."""
    model, params = model_params
    m2 = model.clone(chunk=2)
    frames = jnp.asarray(
        np.random.RandomState(0).randn(2, 2, 64, 64, 3), jnp.float32
    )
    st0 = model.zero_state(2)
    p0, st1 = model.apply(params, frames[0], st0)
    p1, st2 = model.apply(params, frames[1], st1)
    pc, stc = m2.apply(params, frames.reshape(4, 64, 64, 3), st0)
    for name in ("arm_loc", "arm_conf", "odm_loc", "odm_conf"):
        got = getattr(pc, name).reshape(2, 2, *getattr(pc, name).shape[1:])
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(getattr(p0, name)), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(getattr(p1, name)), atol=2e-5
        )
    for a, b in zip(st2, stc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_chunk2_streaming_close(model_params):
    model, params = model_params
    streams, frames_n = 2, 4
    frames = np.random.RandomState(0).randint(
        0, 255, (frames_n, streams, 64, 64, 3), np.uint8
    )

    ref = StreamingDetector(model, params, num_streams=streams)
    ref_dets = [ref.detect(frames[t]) for t in range(frames_n)]

    det2 = StreamingDetector(model, params, num_streams=streams, chunk=2)
    out_a = det2.detect(frames[0:2])  # (2, S, ...)
    out_b = det2.detect(frames[2:4])

    for t, out in zip(range(frames_n), [out_a, out_a, out_b, out_b]):
        i = t % 2
        # Sorted score vectors agree to float noise (ordering of near-ties may
        # swap — see module docstring).
        np.testing.assert_allclose(
            np.sort(np.asarray(out.scores[i]), axis=-1),
            np.sort(np.asarray(ref_dets[t].scores), axis=-1),
            atol=5e-6,
        )
    # Final carried temporal state matches to float noise.
    for s2, s1 in zip(det2._state, ref._state):
        np.testing.assert_allclose(
            np.asarray(s2, np.float32), np.asarray(s1, np.float32), atol=1e-5
        )


def test_chunk_reset_applies_at_chunk_boundary(model_params):
    model, params = model_params
    frames = np.random.RandomState(1).randint(0, 255, (2, 1, 64, 64, 3), np.uint8)
    det = StreamingDetector(model, params, num_streams=1, chunk=2)
    det.detect(frames)
    det.reset([0])
    out_fresh = det.detect(frames)
    det_clean = StreamingDetector(model, params, num_streams=1, chunk=2)
    out_clean = det_clean.detect(frames)
    np.testing.assert_array_equal(
        np.asarray(out_fresh.scores), np.asarray(out_clean.scores)
    )


def test_chunk_hybrid_cell_equivalent():
    """chunk=2 == two chunk=1 steps for the hybrid per-scale cell too (the
    round-4 single-stream latency candidate pairs chunking with hybrid)."""
    from tdrn_tpu.config import TINY_64
    from tdrn_tpu.models import build_detector

    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.125, temporal_cell="hybrid")
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 1, 64, 64, 3).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)), model.zero_state(1)
    )
    m2 = model.clone(chunk=2)
    h0 = model.zero_state(1)
    p1, h1 = model.apply(params, x[0], h0)
    p2, h2 = model.apply(params, x[1], h1)
    pc, hc = m2.apply(params, x.reshape(2, 64, 64, 3), h0)
    np.testing.assert_allclose(
        np.asarray(pc.odm_conf[1]), np.asarray(p2.odm_conf[0]), atol=2e-5
    )
    for a, b in zip(h2, hc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
