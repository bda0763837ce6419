"""Pass-through GRU initialization (VERDICT round-2 item 4).

Cold-start clip training collapsed (temporal mAP 0.28 vs frame 0.59) because
a xavier-initialized gated cell destroys its input features at step 0. The
cells now initialize near the identity: z-gate biased open, candidate conv =
center-tap identity on x (+ small noise). These tests pin that property.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdrn_tpu.models.temporal import ConvGRUCell, LightGRUCell


@pytest.mark.parametrize("cell_cls", [ConvGRUCell, LightGRUCell])
def test_passthrough_init_preserves_features(cell_cls):
    c = 32
    cell = cell_cls(channels=c)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 2 * c)[..., :c] * 0.5,
                    jnp.float32)
    h0 = jnp.zeros_like(x)
    params = cell.init(jax.random.PRNGKey(0), x, h0)
    out = cell.apply(params, x, h0)
    # At init with zero state: h' ~ sigmoid(2)*tanh(x). The output must be a
    # strongly-correlated monotone squash of x, not a random mix.
    target = float(jax.nn.sigmoid(2.0)) * np.tanh(np.asarray(x))
    got = np.asarray(out)
    corr = np.corrcoef(got.ravel(), target.ravel())[0, 1]
    assert corr > 0.95, corr
    # And close in value (the 0.1-xavier noise perturbs mildly).
    rel = np.abs(got - target).mean() / (np.abs(target).mean() + 1e-9)
    assert rel < 0.35, rel


@pytest.mark.parametrize("cell_cls", [ConvGRUCell, LightGRUCell])
def test_xavier_init_option_destroys_features(cell_cls):
    """Sanity check of the counterfactual: the old init is NOT pass-through
    (otherwise this round's change would be a no-op)."""
    c = 32
    cell = cell_cls(channels=c, passthrough_init=False)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, c) * 0.5, jnp.float32)
    h0 = jnp.zeros_like(x)
    params = cell.init(jax.random.PRNGKey(0), x, h0)
    out = cell.apply(params, x, h0)
    corr = np.corrcoef(np.asarray(out).ravel(), np.tanh(np.asarray(x)).ravel())[0, 1]
    assert abs(corr) < 0.6, corr


def test_passthrough_keeps_state_dynamics():
    """The cell must still be a functioning GRU: a nonzero carried state
    influences the next output (gates are open, not welded shut)."""
    c = 16
    cell = ConvGRUCell(channels=c)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, c), jnp.float32)
    params = cell.init(jax.random.PRNGKey(0), x, jnp.zeros_like(x))
    out0 = cell.apply(params, x, jnp.zeros_like(x))
    out1 = cell.apply(params, x, jnp.ones_like(x))
    assert float(jnp.max(jnp.abs(out0 - out1))) > 1e-3
