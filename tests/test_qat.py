"""Quantization-aware training (models/layers.FQConv + utils/quantize.apply_qat).

QAT is the train-time twin of the int8 PTQ serving path: the same convs, the
same grids (per-out-channel weight steps, static calibrated activation
scales), simulated in fp32 with straight-through gradients. The contract
under test:

  * FQConv's forward values sit on QConv's exact quantization grids
    (accumulation dtype is the only difference);
  * the QAT model's PARAM TREE — structure and init values — is identical to
    the plain model (fp32 masters; checkpoints interchange freely);
  * gradients flow through the fake-quant (STE) so fine-tuning works;
  * the validation surface mirrors apply_int8_backbone's.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models import build_detector
from tdrn_tpu.models.layers import FQConv, QConv
from tdrn_tpu.utils.quantize import (
    apply_int8_backbone,
    apply_qat,
    calibrate_act_scales,
)


def test_fqconv_matches_qconv_grid():
    """FQConv(fp32 masters) == QConv(int8 params) up to accumulation dtype:
    both snap inputs/weights to identical grids."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 8).astype(np.float32).clip(0)
    k = (rng.randn(3, 3, 8, 16) * 0.2).astype(np.float32)
    b = rng.randn(16).astype(np.float32) * 0.1
    xscale = float(np.abs(x).max())

    fq = FQConv(16, (3, 3), xscale=xscale, dtype=jnp.float32).apply(
        {"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )

    ws = np.abs(k).reshape(-1, 16).max(axis=0) / 127.0
    q = QConv(16, (3, 3), dtype=jnp.float32).apply(
        {"params": {
            "kernel": jnp.asarray(np.clip(np.round(k / ws), -127, 127).astype(np.int8)),
            "wscale": jnp.asarray(ws, jnp.float32),
            "xscale": jnp.asarray(np.float32(xscale)),
            "bias": jnp.asarray(b),
        }},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.asarray(fq), np.asarray(q), rtol=1e-4, atol=1e-4
    )


def test_fqconv_ste_gradients():
    """d(FQConv)/d(kernel) is the plain conv gradient on the quantized input
    (straight-through): nonzero, finite, and zero only where the plain conv's
    gradient is zero."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    variables = FQConv(6, (3, 3), xscale=3.0, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x
    )

    def loss(v):
        y = FQConv(6, (3, 3), xscale=3.0, dtype=jnp.float32).apply(v, x)
        return jnp.sum(y * y)

    g = jax.grad(loss)(variables)["params"]
    assert float(jnp.abs(g["kernel"]).max()) > 0
    assert np.isfinite(np.asarray(g["kernel"])).all()
    assert float(jnp.abs(g["bias"]).max()) > 0


def _tiny_scales(model, params, x, **kw):
    return calibrate_act_scales(model, params, x, **kw)


def test_qat_param_tree_identical_to_base():
    """apply_qat changes NOTHING about the parameters: same tree structure and
    same init values (same RNG paths) — a QAT checkpoint is a plain one."""
    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    state = model.zero_state(2)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, state)
    scales = _tiny_scales(model, params, x, tcb=True, gru=True)

    qat = apply_qat(model, scales)
    qparams = jax.jit(qat.init)(jax.random.PRNGKey(1), x, state)
    assert jax.tree.structure(params) == jax.tree.structure(qparams)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(qparams)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qat_forward_matches_int8_serving():
    """The QAT forward tracks the int8 SERVING forward (same grids) far more
    closely than it tracks the plain fp32 forward — i.e. training sees what
    serving will compute."""
    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    state = model.zero_state(2)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x, state)
    scales = _tiny_scales(model, params, x, tcb=True, gru=True)

    qat = apply_qat(model, scales)
    int8_model, int8_params = apply_int8_backbone(
        model.clone(dtype=jnp.float32), params, act_scales=scales
    )

    base_preds, _ = jax.jit(model.apply)(params, x, state)
    qat_preds, qat_state = jax.jit(qat.apply)(params, x, state)
    int8_preds, _ = jax.jit(int8_model.apply)(int8_params, x, state)
    assert qat_state is not None
    for name, bp, qp, ip in zip(base_preds._fields, base_preds, qat_preds,
                                int8_preds):
        qp = np.asarray(qp, np.float32)
        ip = np.asarray(ip, np.float32)
        bp = np.asarray(bp, np.float32)
        err_vs_int8 = np.linalg.norm(qp - ip) / max(np.linalg.norm(ip), 1e-6)
        err_vs_base = np.linalg.norm(qp - bp) / max(np.linalg.norm(bp), 1e-6)
        # int8 serving runs the bf16 profile around the int8 convs, so exact
        # equality isn't expected — but QAT must sit much nearer serving than
        # the un-quantized forward does.
        assert err_vs_int8 < 0.12, (name, err_vs_int8)
        assert err_vs_int8 < err_vs_base or err_vs_base < 1e-3, (
            name, err_vs_int8, err_vs_base,
        )


def test_qat_train_step_updates_quantized_convs():
    """make_train_step(qat_scales=...): loss finite, STE gradients reach the
    fake-quantized convs' fp32 masters, and the optimizer updates them."""
    from tdrn_tpu.train import (
        Targets, init_train_state, make_optimizer, make_train_step,
    )

    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(3), x, model.zero_state(1))
    scales = _tiny_scales(model, params, x, tcb=True, gru=True)

    opt = make_optimizer(base_lr=1e-2, warmup_steps=1)
    ts = init_train_state(model, jax.random.PRNGKey(3), opt, batch=2)
    step = make_train_step(model, opt, clip_mode=True, qat_scales=scales)

    t, b, g = 2, 2, 3
    frames = jnp.asarray(rng.randn(t, b, 64, 64, 3).astype(np.float32) * 30)
    boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.7, 0.7]], jnp.float32), (t, b, g, 1))
    labels = jnp.ones((t, b, g), jnp.int32)
    valid = jnp.tile(jnp.asarray([True, False, False]), (t, b, 1))

    before = np.asarray(ts.params["params"]["backbone"]["conv1_1"]["kernel"])
    tcb_before = np.asarray(ts.params["params"]["tcb"]["tcb0"]["conv1"]["kernel"])
    ts2, metrics = step(ts, frames, Targets(boxes, labels, valid))
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(ts2.params["params"]["backbone"]["conv1_1"]["kernel"])
    tcb_after = np.asarray(ts2.params["params"]["tcb"]["tcb0"]["conv1"]["kernel"])
    assert float(np.abs(after - before).max()) > 0
    assert float(np.abs(tcb_after - tcb_before).max()) > 0
    # Masters stay fp32 through the update.
    assert after.dtype == np.float32


def test_qat_composes_with_bf16_compute():
    from tdrn_tpu.train import (
        Targets, init_train_state, make_optimizer, make_train_step,
    )

    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.125)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), x, None)
    scales = _tiny_scales(model, params, x)

    opt = make_optimizer(base_lr=1e-2, warmup_steps=1)
    ts = init_train_state(model, jax.random.PRNGKey(4), opt, batch=2)
    step = make_train_step(model, opt, clip_mode=False,
                           compute_dtype=jnp.bfloat16, qat_scales=scales)
    b, g = 2, 2
    images = jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32) * 30)
    boxes = jnp.tile(jnp.asarray([[0.3, 0.3, 0.8, 0.8]], jnp.float32), (b, g, 1))
    labels = jnp.ones((b, g), jnp.int32)
    valid = jnp.tile(jnp.asarray([True, False]), (b, 1))
    ts2, metrics = step(ts, images, Targets(boxes, labels, valid))
    assert np.isfinite(float(metrics["loss"]))
    assert ts2.params["params"]["backbone"]["conv1_1"]["kernel"].dtype == jnp.float32


def test_qat_resnet_matches_int8():
    model = build_detector(TINY_64, backbone="resnet101", temporal=False,
                           tcb_channels=32, width_mult=0.125)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(5), x, None)
    scales = _tiny_scales(model, params, x)

    qat = apply_qat(model, scales)
    qat_preds, _ = jax.jit(qat.apply)(params, x, None)
    int8_model, int8_params = apply_int8_backbone(model, params,
                                                  act_scales=scales)
    int8_preds, _ = jax.jit(int8_model.apply)(int8_params, x, None)
    for qp, ip in zip(qat_preds, int8_preds):
        qp, ip = np.asarray(qp, np.float32), np.asarray(ip, np.float32)
        err = np.linalg.norm(qp - ip) / max(np.linalg.norm(ip), 1e-6)
        assert err < 0.15, err


def test_qat_validation_surface():
    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.125)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(6), x, None)
    scales = _tiny_scales(model, params, x)

    bad = dict(scales)
    bad.pop("conv4_2")
    with pytest.raises(ValueError, match="missing convs"):
        apply_qat(model, bad)

    with pytest.raises(ValueError, match="conv stem"):
        apply_qat(model.clone(stem="s2d"), scales)

    with pytest.raises(ValueError, match="temporal"):
        apply_qat(model, dict(scales, **{"gru0/gates": 2.0, "gru0/cand": 2.0}))

    with pytest.raises(ValueError, match="non-positive"):
        apply_qat(model, dict(scales, conv1_1=0.0))


def test_qat_s2d_stem():
    """QAT composes with the s2d fast-profile stem (round 4): param tree
    unchanged, forward runs fake-quantized, gradients flow to conv1_1."""
    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.25, stem="s2d")
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), x, None)
    scales = _tiny_scales(model, params, x)

    qat = apply_qat(model, scales)
    qparams = jax.jit(qat.init)(jax.random.PRNGKey(4), x, None)
    assert jax.tree.structure(params) == jax.tree.structure(qparams)

    def loss(p):
        preds, _ = qat.apply(p, x, None)
        return jnp.sum(jnp.square(preds.odm_conf))

    g = jax.jit(jax.grad(loss))(params)
    gk = np.asarray(g["params"]["backbone"]["conv1_1"]["kernel"])
    assert gk.shape[2] == 12  # s2d: 4x input channels
    assert np.abs(gk).max() > 0  # STE gradients reach the stem
