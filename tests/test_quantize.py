"""int8 backbone quantization (utils/quantize.py + models/layers.QConv)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdrn_tpu.config import TINY_64
from tdrn_tpu.models import build_detector
from tdrn_tpu.models.layers import QConv
from tdrn_tpu.utils.quantize import (
    VGG_CONV_CHAIN,
    apply_int8_backbone,
    calibrate_act_scales,
)


def test_qconv_matches_fp32_conv():
    """s8 x s8 -> s32 QConv ≈ the fp32 conv it quantizes (both error sources
    — per-channel weight step and per-tensor activation step — are bounded)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 8).astype(np.float32).clip(0)  # post-relu-like
    k = (rng.randn(3, 3, 8, 16) * 0.2).astype(np.float32)
    b = rng.randn(16).astype(np.float32) * 0.1

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b

    ws = np.abs(k).reshape(-1, 16).max(axis=0) / 127.0
    params = {
        "params": {
            "kernel": jnp.asarray(np.clip(np.round(k / ws), -127, 127).astype(np.int8)),
            "wscale": jnp.asarray(ws, jnp.float32),
            "xscale": jnp.asarray(np.float32(np.abs(x).max())),
            "bias": jnp.asarray(b),
        }
    }
    q = QConv(16, (3, 3), dtype=jnp.float32).apply(params, jnp.asarray(x))
    ref = np.asarray(ref, np.float32)
    err = np.linalg.norm(np.asarray(q) - ref) / np.linalg.norm(ref)
    assert err < 0.02, err


def test_calibration_chain():
    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.125)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 50)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    scales = calibrate_act_scales(model, params, x)
    assert set(scales) == set(VGG_CONV_CHAIN)
    assert scales["conv1_1"] == pytest.approx(float(jnp.abs(x).max()), rel=1e-6)
    assert all(s > 0 for s in scales.values())


def test_int8_backbone_end_to_end():
    """Quantized detector ≈ fp32 detector: int8 kernels in the tree, same
    output shapes, prediction tensors within PTQ error of fp32."""
    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    state = model.zero_state(2)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, state)

    qmodel, qparams = apply_int8_backbone(model, params, x)
    kern = qparams["params"]["backbone"]["conv3_1"]["kernel"]
    assert kern.dtype == jnp.int8
    assert "xscale" in qparams["params"]["backbone"]["conv3_1"]

    preds, _ = jax.jit(model.apply)(params, x, state)
    qpreds, qstate = jax.jit(qmodel.apply)(qparams, x, state)
    for a, b in zip(preds, qpreds):
        assert a.shape == b.shape
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert err < 0.25, err  # random-init net; real nets calibrate tighter
    assert qstate is not None


def test_percentile_calibration_tightens_scales():
    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.125)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 50)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
    s_max = calibrate_act_scales(model, params, x)
    s_p99 = calibrate_act_scales(model, params, x, percentile=99.0)
    assert set(s_p99) == set(VGG_CONV_CHAIN)
    # Percentile scales are <= max scales everywhere, strictly on dense inputs.
    assert all(s_p99[k] <= s_max[k] + 1e-6 for k in s_max)
    assert s_p99["conv1_1"] < s_max["conv1_1"]


def test_scales_roundtrip(tmp_path):
    from tdrn_tpu.utils.quantize import load_act_scales, save_act_scales

    scales = {k: float(i + 1) for i, k in enumerate(VGG_CONV_CHAIN)}
    p = str(tmp_path / "scales.json")
    save_act_scales(p, scales)
    assert load_act_scales(p) == scales
    bad = dict(scales)
    del bad["conv3_2"]
    save_act_scales(p, bad)
    with pytest.raises(ValueError):
        load_act_scales(p)


def test_int8_streaming_detector():
    """The quantized model serves through StreamingDetector (the serve.py /
    temporal-eval path): per-frame detect with carried state, sane outputs."""
    from tdrn_tpu.inference import StreamingDetector

    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.125)
    rng = np.random.RandomState(3)
    calib = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), calib,
                                 model.zero_state(2))
    qmodel, qparams = apply_int8_backbone(model, params, calib)
    det = StreamingDetector(qmodel, qparams, num_streams=1)
    for _ in range(2):
        frame = rng.randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
        out = det.detect(frame)
        assert np.isfinite(np.asarray(out.scores)).all()
        assert np.asarray(out.boxes).shape[0] == 1


def test_int8_tcb_end_to_end():
    """tcb=True also quantizes the pyramid convs: int8 kernels under
    params['tcb'], signed L2Norm-input calibration for the shallow scales,
    sow-ed fused-input calibration for conv3, outputs within PTQ error."""
    from tdrn_tpu.utils.quantize import quantize_backbone_params

    model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                           width_mult=0.25)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(6), x, None)

    scales = calibrate_act_scales(model, params, x, tcb=True)
    assert {f"tcb{k}/conv{i}" for k in range(4) for i in (1, 2, 3)} <= set(scales)
    qmodel, qparams = (model.clone(quant=True, quant_tcb=True),
                       quantize_backbone_params(params, scales))
    assert qparams["params"]["tcb"]["tcb0"]["conv1"]["kernel"].dtype == jnp.int8
    assert "xscale" in qparams["params"]["tcb"]["tcb3"]["conv3"]
    # deconv stays unquantized
    assert "xscale" not in qparams["params"]["tcb"]["tcb0"]["deconv"]

    preds, _ = jax.jit(model.apply)(params, x, None)
    qpreds, _ = jax.jit(qmodel.apply)(qparams, x, None)
    for a, b in zip(preds, qpreds):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert err < 0.35, err  # random-init net; looser than backbone-only


def test_int8_resnet_backbone():
    """ResNet-101 int8: full calibration chain (stem + every bottleneck
    conv/proj + extras), int8 kernels in the nested tree, scales-file
    round-trip through the resnet validation path, output within PTQ error."""
    from tdrn_tpu.models.resnet import resnet_conv_chain
    from tdrn_tpu.utils.quantize import (
        load_act_scales, quantize_backbone_params, save_act_scales,
    )

    model = build_detector(TINY_64, backbone="resnet101", temporal=False,
                           tcb_channels=32, width_mult=0.125)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(3), x, None)

    scales = calibrate_act_scales(model, params, x)
    assert set(scales) == set(resnet_conv_chain(101))
    assert scales["stem"] == pytest.approx(float(jnp.abs(x).max()), rel=1e-6)
    # block-0 shortcut reads the same input as conv1
    assert scales["stage2_0/proj"] == scales["stage2_0/conv1"]

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.json")
        save_act_scales(p, scales)
        loaded = load_act_scales(p)
    assert loaded.keys() == scales.keys()

    qmodel, qparams = apply_int8_backbone(model, params, act_scales=loaded)
    bb = qparams["params"]["backbone"]
    assert bb["stem"]["kernel"].dtype == jnp.int8
    assert bb["stage1_0"]["proj"]["kernel"].dtype == jnp.int8
    assert bb["stage3_5"]["conv2"]["kernel"].dtype == jnp.int8
    assert "proj" not in bb["stage1_1"]  # non-0 blocks have no shortcut conv
    assert bb["stage1_0"]["bn1"]["scale"].dtype != jnp.int8  # norms untouched

    preds, _ = jax.jit(model.apply)(params, x, None)
    qpreds, _ = jax.jit(qmodel.apply)(qparams, x, None)
    for a, b in zip(preds, qpreds):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert err < 0.35, err  # ~110 serial int8 convs on a random-init net


def test_int8_resnet_with_tcb():
    """tcb=True on the resnet backbone: deep TCB scales calibrate off the
    C5 / extra-stage activations (quantize.py deep_src), full key union,
    quantized tree has int8 kernels in both subtrees."""
    from tdrn_tpu.models.resnet import resnet_conv_chain
    from tdrn_tpu.utils.quantize import quantize_backbone_params

    model = build_detector(TINY_64, backbone="resnet101", temporal=False,
                           tcb_channels=32, width_mult=0.125)
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(5), x, None)

    scales = calibrate_act_scales(model, params, x, tcb=True)
    want = set(resnet_conv_chain(101)) | {
        f"tcb{k}/conv{i}" for k in range(4) for i in (1, 2, 3)
    }
    assert set(scales) == want
    qmodel, qparams = (model.clone(quant=True, quant_tcb=True),
                       quantize_backbone_params(params, scales))
    assert qparams["params"]["backbone"]["stage2_1"]["conv3"]["kernel"].dtype == jnp.int8
    assert qparams["params"]["tcb"]["tcb2"]["conv1"]["kernel"].dtype == jnp.int8

    preds, _ = jax.jit(model.apply)(params, x, None)
    qpreds, _ = jax.jit(qmodel.apply)(qparams, x, None)
    for a, b in zip(preds, qpreds):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert err < 0.4, err


def test_int8_resnet_missing_scales_rejected():
    """apply_int8_backbone validates loaded scales against the model's
    expected conv set (a truncated resnet scales file must not silently
    leave convs fp32)."""
    model = build_detector(TINY_64, backbone="resnet101", temporal=False,
                           tcb_channels=32, width_mult=0.125)
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), x, None)
    scales = calibrate_act_scales(model, params, x)
    scales.pop("stage4_1/conv2")
    with pytest.raises(ValueError, match="missing convs"):
        apply_int8_backbone(model, params, act_scales=scales)


@pytest.mark.parametrize("cell", ["convgru", "light", "hybrid"])
def test_int8_gru_cells(cell):
    """gru=True quantizes the temporal-cell convs: sow-ed concat-input
    calibration (scale floored at 1.0 — |h| <= 1), int8 kernels under
    params['temporal'], multi-step recurrence stays within PTQ error."""
    from tdrn_tpu.utils.quantize import quantize_backbone_params

    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.25, temporal_cell=cell)
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(7), x, model.zero_state(2)
    )

    scales = calibrate_act_scales(model, params, x, gru=True)
    from tdrn_tpu.models.temporal import cell_kind

    gates = {
        k: ("gates" if cell_kind(cell, k) == "convgru" else "gate")
        for k in range(4)
    }
    gate = gates[0]
    assert {f"gru{k}/{g}" for k, g in gates.items()} <= set(scales)
    assert {f"gru{k}/cand" for k in range(4)} <= set(scales)
    assert all(scales[k] >= 1.0 for k in scales if k.startswith("gru"))

    qmodel = model.clone(quant=True, quant_gru=True)
    qparams = quantize_backbone_params(params, scales)
    tsub = qparams["params"]["temporal"]["gru0"]
    assert tsub[gate]["kernel"].dtype == jnp.int8
    assert tsub["cand"]["kernel"].dtype == jnp.int8
    if cell_kind(cell, 0) == "light":  # depthwise conv stays unquantized
        assert "xscale" not in tsub["dw"]
    if cell == "hybrid":  # deeper scales carry the full convgru convs
        assert qparams["params"]["temporal"]["gru1"]["gates"][
            "kernel"
        ].dtype == jnp.int8

    # 3 recurrent steps: quantization error must not blow up through the carry
    step = jax.jit(model.apply)
    qstep = jax.jit(qmodel.apply)
    st, qst = model.zero_state(2), model.zero_state(2)
    for _ in range(3):
        preds, st = step(params, x, st)
        qpreds, qst = qstep(qparams, x, qst)
    for a, b in zip(preds, qpreds):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert err < 0.35, (cell, err)
    for h, qh in zip(st, qst):
        assert float(np.abs(np.asarray(qh, np.float32)).max()) <= 1.0 + 1e-5


def test_int8_calibration_on_chunked_model():
    """apply_int8_backbone on a chunk>1 streaming clone (device_bench --int8
    --chunk N): calibration internally drops to chunk=1 (review fix)."""
    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.125).clone(chunk=2)
    rng = np.random.RandomState(7)
    calib = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32) * 30)
    base = model.clone(chunk=1)
    params = jax.jit(base.init)(jax.random.PRNGKey(5), calib[:2],
                                base.zero_state(2))
    qmodel, qparams = apply_int8_backbone(model, params, calib)
    assert qmodel.chunk == 2
    assert qparams["params"]["backbone"]["conv1_1"]["kernel"].dtype == jnp.int8


def test_int8_rejects_poly_fused_stems():
    for stem in ("poly", "fused"):
        model = build_detector(TINY_64, temporal=False, tcb_channels=32,
                               width_mult=0.125, stem=stem)
        with pytest.raises(ValueError):
            apply_int8_backbone(model, {},
                                np.zeros((1, 64, 64, 3), np.float32))


def test_int8_s2d_stem_end_to_end():
    """The fast serving profile (s2d stem + light cell) composes with the
    full int8 pyramid: s2d is a value-preserving reshape, so conv1_1
    calibrates off the frame max exactly like the conv stem (round-4 fix —
    utils/quantize.py previously refused the combination)."""
    model = build_detector(TINY_64, temporal=True, tcb_channels=32,
                           width_mult=0.25, stem="s2d", temporal_cell="light")
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    state = model.zero_state(2)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x, state)

    scales = calibrate_act_scales(model, params, x, tcb=True, gru=True)
    assert scales["conv1_1"] == pytest.approx(float(jnp.abs(x).max()),
                                              rel=1e-6)
    qmodel, qparams = apply_int8_backbone(model, params, x, tcb=True,
                                          gru=True)
    bb = qparams["params"]["backbone"]
    assert bb["conv1_1"]["kernel"].dtype == jnp.int8
    assert bb["conv1_1"]["kernel"].shape[2] == 12  # s2d: 4x input channels
    preds, _ = jax.jit(model.apply)(params, x, state)
    qpreds, qstate = jax.jit(qmodel.apply)(qparams, x, state)
    for a, b in zip(preds, qpreds):
        assert a.shape == b.shape
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert err < 0.25, err
    assert qstate is not None


def test_gru_scales_cell_kind_mismatch_rejected():
    """A scales file calibrated on one temporal cell applied to a model with
    a different cell kind at that scale (e.g. convgru 'gru0/gates' fed to a
    hybrid model whose scale 0 is a LightGRU) raises a descriptive
    ValueError instead of an opaque KeyError inside cell init (ADVICE r4)."""
    src = build_detector(TINY_64, temporal=True, tcb_channels=32,
                         width_mult=0.25, temporal_cell="convgru")
    rng = np.random.RandomState(33)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 40)
    params = jax.jit(src.init)(jax.random.PRNGKey(6), x, src.zero_state(2))
    scales = calibrate_act_scales(src, params, x, tcb=True, gru=True)
    assert "gru0/gates" in scales  # convgru naming

    dst = build_detector(TINY_64, temporal=True, tcb_channels=32,
                         width_mult=0.25, temporal_cell="hybrid")
    dparams = jax.jit(dst.init)(jax.random.PRNGKey(6), x, dst.zero_state(2))
    with pytest.raises(ValueError, match="different cell kind"):
        apply_int8_backbone(dst, dparams, act_scales=scales)

    # Same-kind scales stay accepted (the validator is not over-eager).
    qmodel, _ = apply_int8_backbone(src, params, act_scales=scales)
    assert qmodel.quant_gru
