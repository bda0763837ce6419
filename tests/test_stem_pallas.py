"""Fused Pallas stem kernel vs the unfused XLA reference (ops/stem_pallas.py).

Interpret mode on CPU at reduced geometry; the real-chip numerics/perf runs
are recorded in BENCH.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.ops.stem_pallas import fused_stem_stage1


def _ref_stem(x, k1, b1, k2, b2):
    dn = jax.lax.conv_dimension_numbers(x.shape, k1.shape, ("NHWC", "HWIO", "NHWC"))
    o = jax.lax.conv_general_dilated(x, k1, (1, 1), "SAME", dimension_numbers=dn)
    o = jax.nn.relu(o + b1)
    dn2 = jax.lax.conv_dimension_numbers(o.shape, k2.shape, ("NHWC", "HWIO", "NHWC"))
    o = jax.lax.conv_general_dilated(o, k2, (1, 1), "SAME", dimension_numbers=dn2)
    o = jax.nn.relu(o + b2)
    return jax.lax.reduce_window(
        o, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@pytest.mark.parametrize("b,h,w,n", [(1, 64, 64, 8), (2, 32, 48, 16)])
def test_fused_stem_matches_reference_fp32(b, h, w, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype("f4"))
    k1 = jnp.asarray(rng.normal(size=(3, 3, 3, n)).astype("f4") * 0.3)
    b1 = jnp.asarray(rng.normal(size=(n,)).astype("f4"))
    k2 = jnp.asarray(rng.normal(size=(3, 3, n, n)).astype("f4") * 0.1)
    b2 = jnp.asarray(rng.normal(size=(n,)).astype("f4"))

    ref = _ref_stem(x, k1, b1, k2, b2)
    got = fused_stem_stage1(
        x, k1, b1, k2, b2, compute_dtype=jnp.float32, interpret=True
    )
    assert got.shape == (b, h // 2, w // 2, n) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cin,cmid,cout", [(8, 16, 16), (16, 8, 24)])
def test_fused_conv_stage_matches_reference(cin, cmid, cout):
    from tdrn_tpu.ops.stem_pallas import fused_conv_stage

    rng = np.random.default_rng(3)
    b, h, w = 1, 64, 32
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype("f4"))
    k1 = jnp.asarray(rng.normal(size=(3, 3, cin, cmid)).astype("f4") * 0.2)
    b1 = jnp.asarray(rng.normal(size=(cmid,)).astype("f4"))
    k2 = jnp.asarray(rng.normal(size=(3, 3, cmid, cout)).astype("f4") * 0.1)
    b2 = jnp.asarray(rng.normal(size=(cout,)).astype("f4"))
    ref = _ref_stem(x, k1, b1, k2, b2)
    got = fused_conv_stage(
        x, k1, b1, k2, b2, compute_dtype=jnp.float32, interpret=True
    )
    assert got.shape == (b, h // 2, w // 2, cout) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("stem", ["fused", "fused2"])
def test_fused_stem_detector_parity(stem):
    """stem='fused'/'fused2' consumes a stem='conv' checkpoint unchanged: same
    param tree, near-identical predictions (bf16 stem compute tolerance)."""
    from tdrn_tpu.config import TINY_64
    from tdrn_tpu.models import build_detector

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype("f4") * 5)
    conv_model = build_detector(TINY_64, temporal=False, tcb_channels=32, width_mult=0.125)
    fused_model = build_detector(
        TINY_64, temporal=False, tcb_channels=32, width_mult=0.125, stem=stem
    )
    params = jax.jit(conv_model.init)(jax.random.PRNGKey(0), x, None)
    tmpl = jax.eval_shape(lambda: fused_model.init(jax.random.PRNGKey(0), x, None))
    assert jax.tree.map(lambda a: a.shape, tmpl) == jax.tree.map(
        lambda a: a.shape, params
    )
    ref, _ = conv_model.apply(params, x, None)
    got, _ = fused_model.apply(params, x, None)
    for a, b in zip(ref, got):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 0.05


def test_fused_stem_bf16_close():
    rng = np.random.default_rng(1)
    b, h, w, n = 1, 64, 64, 8
    x = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype("f4"))
    k1 = jnp.asarray(rng.normal(size=(3, 3, 3, n)).astype("f4") * 0.3)
    b1 = jnp.asarray(rng.normal(size=(n,)).astype("f4"))
    k2 = jnp.asarray(rng.normal(size=(3, 3, n, n)).astype("f4") * 0.1)
    b2 = jnp.asarray(rng.normal(size=(n,)).astype("f4"))
    ref = _ref_stem(x, k1, b1, k2, b2)
    got = fused_stem_stage1(
        x, k1, b1, k2, b2, compute_dtype=jnp.bfloat16, interpret=True
    )
    # bf16 matmuls with fp32 accumulation: ~1% relative agreement.
    err = np.abs(np.asarray(got, "f4") - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale
