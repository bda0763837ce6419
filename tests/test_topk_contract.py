"""Exactness contract on candidate selection (ADVICE round 2 / round-3 fix).

tools/tpu_checks.py measured on the real v5e that lax.approx_max_k
(recall_target=1.0) returns lax.top_k's VALUES but a DIFFERENT index order
under score ties — and detect's score fields are tie-heavy by construction
(zeroed sub-threshold / ARM-filtered anchors). Tie order feeds NMS, so it is
part of the exact-parity contract: cfg.approx_topk must default to False, and
the exact `_top_k` path must break ties by lowest index (the sequential
reference semantics the numpy oracle implements).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tdrn_tpu.config import CONFIGS
from tdrn_tpu.ops.nms import _top_k


def test_approx_topk_defaults_off():
    # Flipping this back on requires a passing tools/tpu_checks.py run on the
    # deployment backend (values AND tie order) — see BENCH.md round 3.
    for name, cfg in CONFIGS.items():
        assert cfg.approx_topk is False, name


def test_exact_topk_breaks_ties_by_lowest_index():
    rng = np.random.RandomState(0)
    for trial in range(4):
        scores = rng.rand(997).astype(np.float32)
        scores[scores < 0.6] = 0.0  # heavy ties at exactly 0
        scores = np.round(scores * 8) / 8  # ties among kept values too
        k = 64
        vals, idx = jax.jit(lambda s: _top_k(s, k, approx=False))(
            jnp.asarray(scores)
        )
        vals, idx = np.asarray(vals), np.asarray(idx)
        # Reference: stable sort by descending score, ties -> lowest index.
        order = np.lexsort((np.arange(len(scores)), -scores))[:k]
        np.testing.assert_array_equal(vals, scores[order])
        np.testing.assert_array_equal(idx, order)
