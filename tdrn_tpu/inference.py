"""Streaming / batch inference pipelines.

TPU-native re-design of the reference's test-phase forward + live demo
(SURVEY.md §2 #20, #24, §3.3). The reference's per-frame loop round-trips
host<->device twice per frame (cv2 preprocess in, boxes out) and runs Detect on
the host. Here ONE jitted step function consumes a raw uint8 frame and the
HBM-resident temporal state and returns fixed-shape (boxes, scores, classes)
plus the new state; the state argument is donated, so streaming video holds its
recurrent features in HBM with zero copies (BASELINE.json north-star).

``StreamingDetector`` also supports continuous batching: S independent streams
share one compiled step with a (S, ...) batch axis and per-stream reset masks —
a new stream slots into a batch lane by zeroing that lane's state.
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdrn_tpu.config import DetectorConfig
from tdrn_tpu.models.detector import TDRN
from tdrn_tpu.ops.detection import detect_topk
from tdrn_tpu.ops.nms import TopDetections
from tdrn_tpu.ops.preprocess import preprocess_batch
from tdrn_tpu.ops.priors import prior_boxes

Array = jnp.ndarray
State = List[Array]


class StreamingDetector:
    """Stateful per-frame detector over S concurrent streams.

    detect(frames_u8) -> (boxes (S,K,4) in [0,1] xyxy, scores (S,K), classes (S,K)).
    """

    def __init__(
        self,
        model: TDRN,
        params: Any,
        num_streams: int = 1,
        top_k: Optional[int] = None,
        prefilter: Optional[int] = None,
        chunk: int = 1,
        prefilter_recall: Optional[float] = None,
    ):
        """prefilter: image-wide anchor cap before per-class NMS for the
        streaming path (cfg.prefilter_anchors; exact whenever fewer anchors
        clear conf_thresh — see ops/detection._prefilter). None keeps the
        config's setting; eval paths construct with the exact default.

        chunk: frames per stream per step (pipelined streaming). chunk=2
        batches the state-independent model across 2 consecutive frames
        (models/detector.py TDRN.chunk), trading one frame of latency for
        near-batched throughput on a single stream; detect() then takes
        (chunk, S, H, W, 3) and returns (chunk, S, ...) detections."""
        import dataclasses

        self.chunk = int(chunk)
        if self.chunk > 1:
            model = model.clone(chunk=self.chunk)
        self.model = model
        self.cfg = model.cfg
        if prefilter is not None:
            self.cfg = dataclasses.replace(
                model.cfg, prefilter_anchors=int(prefilter)
            )
        if prefilter_recall is not None:
            # < 1.0 = genuinely approximate anchor selection
            # (config.prefilter_recall; quality-gate before serving).
            self.cfg = dataclasses.replace(
                self.cfg, prefilter_recall=float(prefilter_recall)
            )
        self.params = params
        self.num_streams = num_streams
        self.top_k = top_k or model.cfg.top_k
        import threading

        self._reset_lock = threading.Lock()
        self._pending_reset: set = set()
        self._state = model.zero_state(num_streams) if model.temporal else None
        self._step = self._build_step()

    def _build_step(self):
        model, cfg, top_k = self.model, self.cfg, self.top_k
        chunk, streams = self.chunk, self.num_streams

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, state, frames_u8, reset, active):
            if chunk > 1:
                # (chunk, S, H, W, 3) frame-major -> (chunk*S, H, W, 3); the
                # reset/active masks apply once at the chunk boundary.
                frames_u8 = frames_u8.reshape(
                    chunk * streams, *frames_u8.shape[2:]
                )
            x = preprocess_batch(frames_u8, cfg, model.dtype, model.fold_mean)
            if state is not None:
                # Per-stream reset: zero this lane's carried features.
                state = [
                    s * (1.0 - reset[:, None, None, None]).astype(s.dtype)
                    for s in state
                ]
            preds, new_state = model.apply(params, x, state)
            if state is not None:
                # Inactive lanes (no frame this step, e.g. serving micro-
                # batches) keep their post-reset state untouched.
                a = active[:, None, None, None]
                new_state = [
                    jnp.where(a > 0, ns, s).astype(s.dtype)
                    for ns, s in zip(new_state, state)
                ]
            priors = prior_boxes(cfg)
            det = detect_topk(preds, priors, cfg, top_k)
            if chunk > 1:
                det = jax.tree.map(
                    lambda a: a.reshape(chunk, streams, *a.shape[1:]), det
                )
            return new_state, det

        return step

    def reset(self, stream_ids: Optional[List[int]] = None):
        """Mark streams for state reset at the next frame (clip boundary).

        Thread-safe vs a concurrent detect(): the serving runtime calls this
        from client threads while the dispatcher thread is in detect() — the
        pending set is mutated under a lock so a reset enqueued mid-step is
        applied on the NEXT step rather than silently dropped."""
        if stream_ids is None:
            stream_ids = list(range(self.num_streams))
        with self._reset_lock:
            self._pending_reset |= set(stream_ids)

    def detect(
        self, frames_u8: np.ndarray, active: Optional[np.ndarray] = None
    ) -> TopDetections:
        """frames_u8: (S, H, W, 3) uint8 RGB — or (chunk, S, H, W, 3) when
        constructed with chunk>1 (pipelined streaming; detections come back
        with the matching leading (chunk, S) axes). Returns fixed-shape
        detections.

        active: optional (S,) 0/1 mask — lanes with 0 do not advance their
        temporal state this step (their detections are garbage; callers that
        pass ``active`` must ignore those lanes' outputs).
        """
        with self._reset_lock:
            pending = self._pending_reset
            self._pending_reset = set()
        reset = np.zeros((self.num_streams,), np.float32)
        for i in pending:
            reset[i] = 1.0
        if active is None:
            active_arr = jnp.ones((self.num_streams,), jnp.float32)
        else:
            active_arr = jnp.asarray(active, jnp.float32)
        try:
            self._state, det = self._step(
                self.params, self._state, jnp.asarray(frames_u8),
                jnp.asarray(reset), active_arr,
            )
        except Exception:
            # A failed step (e.g. wrong frame shape) must not swallow queued
            # clip-boundary resets — re-merge them for the next attempt
            # (ADVICE round 2).
            with self._reset_lock:
                self._pending_reset |= pending
            raise
        return det


class LoadedModel(NamedTuple):
    model: TDRN
    params: Any
    cfg: DetectorConfig
    step: int
    meta: dict


def load_inference_model(
    checkpoint_dir: str,
    *,
    dataset: Optional[str] = None,
    backbone: Optional[str] = None,
    temporal: Optional[bool] = None,
    stem: Optional[str] = None,
    temporal_cell: Optional[str] = None,
    tcb_channels: Optional[int] = None,
    backbone_norm: Optional[str] = None,
    dtype=jnp.float32,
    precision: Optional[str] = None,
    int8_scales: Optional[str] = None,
    random_init: bool = False,
    seed: int = 0,
    verbose: bool = True,
    dataset_fallback: str = "voc_320",
) -> LoadedModel:
    """Build a detector for inference from a train checkpoint directory.

    Model-construction flags default to the ``model_meta.json`` the trainer
    persisted next to the checkpoints (so a --stem s2d / --temporal_cell light
    checkpoint evaluates without re-passing those flags); explicit keyword
    arguments override the meta. Params are restored subtree-tolerantly
    (checkpoint.restore_params): a clip-trained (temporal) checkpoint loads
    into a non-temporal eval model and vice versa — the extra/missing temporal
    subtree is reported, not fatal.

    precision="bf16" converts to the resident-bf16 inference profile after
    restore (utils/precision.py): bf16 feature-pyramid weights + carry, fp32
    ARM/ODM heads and detect. The checkpoint itself stays fp32.

    precision="int8" composes the quantized backbone (utils/quantize.py) on
    the bf16 profile; it requires ``int8_scales`` — a json of activation
    scales calibrated offline with ``eval.py --precision int8 --save_scales``.
    """
    import json
    import os

    from tdrn_tpu.config import get_config
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.train.checkpoint import META_FILENAME, CheckpointManager

    # Read meta without constructing the orbax manager: random_init callers
    # (e.g. serve.py --random_init smoke tests) must not mkdir checkpoint
    # trees as a side effect.
    meta_path = os.path.join(checkpoint_dir, META_FILENAME)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    def pick(cli, key, default):
        return cli if cli is not None else meta.get(key, default)

    cfg = get_config(pick(dataset, "dataset", dataset_fallback))
    backbone_name = pick(backbone, "backbone", "vgg16")
    # FrozenBN and GroupNorm resnets have identical param trees (per-channel
    # scale/bias, same shapes), so a wrong norm restores silently and produces
    # wrong activations — surface the ambiguity instead (ADVICE round 2).
    if (
        backbone_name == "resnet101"
        and backbone_norm is None
        and "backbone_norm" not in meta
    ):
        print(
            "WARNING: resnet checkpoint meta lacks 'backbone_norm'; assuming "
            "'frozen'. A GroupNorm-trained checkpoint restores into a FrozenBN "
            "model without error but computes garbage — pass backbone_norm "
            "explicitly (CLI --backbone_norm) if this checkpoint used "
            "--backbone_norm group."
        )
    model = build_detector(
        cfg,
        backbone=backbone_name,
        temporal=bool(pick(temporal, "temporal", True)),
        stem=pick(stem, "stem", "conv"),
        temporal_cell=pick(temporal_cell, "temporal_cell", "convgru"),
        tcb_channels=int(pick(tcb_channels, "tcb_channels", 256)),
        backbone_norm=pick(backbone_norm, "backbone_norm", "frozen"),
        width_mult=float(meta.get("width_mult", 1.0)),
        dtype=dtype,
    )
    x = jnp.zeros((1, cfg.size, cfg.size, 3), model.dtype)
    state = model.zero_state(1) if model.temporal else None
    template = jax.jit(model.init)(jax.random.PRNGKey(seed), x, state)
    from tdrn_tpu.utils.precision import apply_inference_precision

    def apply_precision(model, params):
        if precision in ("int8",):
            if int8_scales is None:
                raise ValueError(
                    "precision='int8' needs int8_scales (calibrate offline: "
                    "eval.py --precision int8 --save_scales <path>)"
                )
            from tdrn_tpu.utils.quantize import (
                apply_int8_backbone,
                load_act_scales,
            )

            model, params = apply_inference_precision(model, params, "bf16")
            return apply_int8_backbone(
                model, params, act_scales=load_act_scales(int8_scales)
            )
        return apply_inference_precision(model, params, precision)

    if random_init:
        model, template = apply_precision(model, template)
        return LoadedModel(model, template, cfg, 0, meta)
    mgr = CheckpointManager(checkpoint_dir)
    out = mgr.restore_params(template)
    if out is None:
        raise FileNotFoundError(f"no checkpoint found in {checkpoint_dir}")
    params, missing, extra = out
    # Only the temporal subtree may legitimately stay at init (clip-trained
    # <-> single-frame eval). Anything else fresh means the model was built
    # with the wrong geometry (e.g. a pre-meta vid checkpoint evaluated with
    # the voc fallback: mismatched head shapes) — randomly-initialized heads
    # silently producing garbage is worse than an error.
    bad = [m for m in missing if "/temporal" not in m]
    if bad:
        raise ValueError(
            f"checkpoint/model mismatch: {len(bad)} non-temporal subtree(s) "
            f"absent or shape-mismatched in {checkpoint_dir}: {bad[:6]} — "
            "pass the matching --dataset/--backbone (or fix model_meta.json)"
        )
    if verbose and (missing or extra):
        print(
            f"restore: {len(missing)} template subtree(s) kept at init "
            f"{missing[:4]}, {len(extra)} checkpoint subtree(s) unused {extra[:4]}"
        )
    model, params = apply_precision(model, params)
    return LoadedModel(model, params, cfg, mgr.latest_step() or 0, meta)


def make_clip_forward(model: TDRN, top_k: Optional[int] = None):
    """Jitted whole-clip inference: (T, B, H, W, 3) uint8 -> per-frame detections.

    The scan carries the temporal state in HBM across the clip (config 3 of
    BASELINE.json); detections come back with a leading time axis.
    """
    cfg = model.cfg
    k = top_k or cfg.top_k

    @jax.jit
    def run(params, frames_u8):
        batch = frames_u8.shape[1]
        init = model.zero_state(batch) if model.temporal else None
        priors = prior_boxes(cfg)

        def step(state, x_t):
            x = preprocess_batch(x_t, cfg, model.dtype, model.fold_mean)
            preds, new_state = model.apply(params, x, state)
            return new_state, detect_topk(preds, priors, cfg, k)

        _, dets = jax.lax.scan(step, init, frames_u8)
        return dets

    return run


def make_single_image_forward(
    model: TDRN, top_k: Optional[int] = None, prefilter: Optional[int] = None,
    prefilter_recall: Optional[float] = None,
):
    """Jitted single-image detect (config 1/2 of BASELINE.json)."""
    import dataclasses

    cfg = model.cfg
    if prefilter is not None:
        cfg = dataclasses.replace(cfg, prefilter_anchors=int(prefilter))
    if prefilter_recall is not None:
        cfg = dataclasses.replace(cfg, prefilter_recall=float(prefilter_recall))
    k = top_k or cfg.top_k

    @jax.jit
    def run(params, images_u8):
        x = preprocess_batch(images_u8, cfg, model.dtype, model.fold_mean)
        state = model.zero_state(images_u8.shape[0]) if model.temporal else None
        preds, _ = model.apply(params, x, state)
        return detect_topk(preds, prior_boxes(cfg), cfg, k)

    return run
