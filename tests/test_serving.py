"""Micro-batching inference server: correctness of lane state under
concurrency, eviction, and inactive-lane freezing."""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.inference import StreamingDetector
from tdrn_tpu.serving import InferenceServer
from tests.helpers import tiny_detector


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_detector(temporal=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, model.zero_state(1))
    return model, params


def make_server(model, params, lanes=2, window_ms=1.0):
    det = StreamingDetector(model, params, num_streams=lanes, top_k=10)
    return InferenceServer(det, window_ms=window_ms)


class TestInactiveLaneFreeze:
    def test_state_frozen_when_inactive(self, model_and_params):
        """A lane that skips steps must produce the same sequence as one that
        runs back-to-back (its state must not advance on garbage frames)."""
        model, params = model_and_params
        rng = np.random.RandomState(0)
        f1 = rng.randint(0, 255, (64, 64, 3), np.uint8)
        f2 = rng.randint(0, 255, (64, 64, 3), np.uint8)

        # reference: single-lane detector, frames back-to-back
        det = StreamingDetector(model, params, num_streams=1, top_k=10)
        r1 = det.detect(f1[None])
        r2 = det.detect(f2[None])

        srv = make_server(model, params, lanes=2)
        try:
            a1 = srv.submit("a", f1)
            # interleave other-stream traffic so stream a's lane idles
            for _ in range(3):
                srv.submit("b", rng.randint(0, 255, (64, 64, 3), np.uint8))
            a2 = srv.submit("a", f2)
            np.testing.assert_allclose(a1[1], np.asarray(r1.scores)[0], atol=1e-5)
            np.testing.assert_allclose(a2[1], np.asarray(r2.scores)[0], atol=1e-5)
        finally:
            srv.close()


class TestConcurrency:
    def test_parallel_streams_match_sequential(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(1)
        frames = {s: [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(3)]
                  for s in ("s0", "s1")}

        # sequential reference per stream
        want = {}
        for s, fs in frames.items():
            det = StreamingDetector(model, params, num_streams=1, top_k=10)
            want[s] = []
            for f in fs:
                out = det.detect(f[None])
                want[s].append(np.asarray(out.scores)[0])

        srv = make_server(model, params, lanes=2, window_ms=2.0)
        got = {s: [] for s in frames}
        errs = []

        def client(s):
            try:
                for f in frames[s]:
                    _, scores, _ = srv.submit(s, f)
                    got[s].append(scores)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        try:
            threads = [threading.Thread(target=client, args=(s,)) for s in frames]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errs, errs
            for s in frames:
                for g, w in zip(got[s], want[s]):
                    np.testing.assert_allclose(g, w, atol=1e-5)
            assert srv.frames == 6
        finally:
            srv.close()


class TestEviction:
    def test_lru_eviction_resets_lane(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(2)
        f = rng.randint(0, 255, (64, 64, 3), np.uint8)
        srv = make_server(model, params, lanes=1)
        try:
            first = srv.submit("x", f)
            srv.submit("y", f)  # evicts x (single lane)
            again = srv.submit("x", f)  # x re-assigned -> fresh state
            np.testing.assert_allclose(first[1], again[1], atol=1e-5)
        finally:
            srv.close()


class TestEvictionDrain:
    def test_evicted_stream_pending_requests_fail(self, model_and_params):
        """Eviction must not leave the old stream's queued frames in the lane
        (they would interleave into the new stream's temporal state)."""
        from tdrn_tpu.serving import _Pending

        model, params = model_and_params
        det = StreamingDetector(model, params, num_streams=1, top_k=10)
        srv = InferenceServer(det, dispatch_thread=False)
        try:
            with srv._lock:
                lane_a = srv._assign_lane("a")
                stale = _Pending(np.zeros((64, 64, 3), np.uint8))
                srv._queues[lane_a].append(stale)
                lane_b = srv._assign_lane("b")  # evicts a (single lane)
            assert lane_b == lane_a
            assert stale.event.is_set() and stale.result is None
            assert srv._queues[lane_a] == []
        finally:
            srv.close()


class TestSubmitSync:
    def test_sync_matches_streaming(self, model_and_params):
        model, params = model_and_params
        rng = np.random.RandomState(3)
        f1 = rng.randint(0, 255, (64, 64, 3), np.uint8)
        f2 = rng.randint(0, 255, (64, 64, 3), np.uint8)

        det = StreamingDetector(model, params, num_streams=1, top_k=10)
        r1 = det.detect(f1[None])
        r2 = det.detect(f2[None])

        srv = make_server(model, params, lanes=2)
        try:
            a1 = srv.submit_sync("a", f1)
            srv.submit_sync("b", rng.randint(0, 255, (64, 64, 3), np.uint8))
            a2 = srv.submit_sync("a", f2)
            np.testing.assert_allclose(a1[1], np.asarray(r1.scores)[0], atol=1e-5)
            np.testing.assert_allclose(a2[1], np.asarray(r2.scores)[0], atol=1e-5)
        finally:
            srv.close()


class TestLatencyStats:
    def test_percentiles(self):
        from tdrn_tpu.serving import LatencyStats

        st = LatencyStats(cap=100)
        assert st.snapshot() == {"n": 0}
        for ms in range(1, 101):  # 1..100 ms
            st.record(ms / 1e3)
        snap = st.snapshot()
        assert snap["n"] == 100
        assert 50 <= snap["p50_ms"] <= 52
        assert 90 <= snap["p90_ms"] <= 92
        assert 99 <= snap["p99_ms"] <= 100
        assert snap["max_ms"] == 100.0
        for ms in range(200, 260):  # ring: old entries fall out
            st.record(ms / 1e3)
        assert st.snapshot()["n"] == 100

    def test_server_records_latency(self, model_and_params):
        model, params = model_and_params
        srv = make_server(model, params, lanes=2)
        try:
            f = np.random.RandomState(5).randint(0, 255, (64, 64, 3), np.uint8)
            srv.submit_sync("s", f)
            srv.submit("s", f)
            snap = srv.latency.snapshot()
            assert snap["n"] == 2 and snap["p50_ms"] > 0
        finally:
            srv.close()
