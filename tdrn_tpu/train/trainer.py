"""Training loop machinery.

TPU-native re-design of the reference's ``train.py`` (SURVEY.md §2 #21, §3.1):
SGD with momentum 0.9 / weight decay 5e-4, warmup + step-decay LR schedule,
periodic checkpointing with resume. The differences are structural:

  * the whole step — matching, loss, backward, optimizer — is ONE jitted
    program; there is no per-image host matching loop;
  * data parallelism is a named-mesh sharding (parallel/mesh.py), not
    ``nn.DataParallel``; the gradient all-reduce is inserted by XLA;
  * VID clip training runs ``lax.scan`` over the time axis carrying the
    temporal state (truncated-BPTT over the clip, SURVEY.md §5.7), instead of
    a Python loop over frames;
  * checkpoints capture params + optimizer state + step (orbax), so resume is
    exact (the reference restarts optimizer momentum, SURVEY.md §5.4).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from tdrn_tpu.config import DetectorConfig
from tdrn_tpu.models.detector import TDRN
from tdrn_tpu.ops.detection import RawPredictions
from tdrn_tpu.ops.priors import prior_boxes
from tdrn_tpu.train.loss import Targets, refine_multibox_loss

Array = jnp.ndarray


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array  # scalar int32


def make_lr_schedule(
    base_lr: float = 1e-3,
    warmup_steps: int = 500,
    milestones: Sequence[int] = (80_000, 100_000),
    gamma: float = 0.1,
):
    """Linear warmup then step decay at milestones (reference schedule)."""
    decay = optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )

    def schedule(step):
        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, decay(step))

    return schedule


def make_optimizer(
    base_lr: float = 1e-3,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    warmup_steps: int = 500,
    milestones: Sequence[int] = (80_000, 100_000),
    gamma: float = 0.1,
    grad_clip_norm: float = 10.0,
) -> optax.GradientTransformation:
    """SGD+momentum with the reference schedule. grad_clip_norm adds global-norm
    clipping (0 disables) — guards against rare loc-target spikes from extreme
    crops; the reference trains unclipped but is also babysat by humans."""
    parts = []
    if grad_clip_norm and grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(
        optax.sgd(
            make_lr_schedule(base_lr, warmup_steps, milestones, gamma),
            momentum=momentum,
        )
    )
    return optax.chain(*parts)


def init_train_state(
    model: TDRN, rng: jax.Array, optimizer: optax.GradientTransformation, batch: int = 1
) -> TrainState:
    x = jnp.zeros((batch, model.cfg.size, model.cfg.size, 3), model.dtype)
    state = model.zero_state(batch) if model.temporal else None
    params = jax.jit(model.init)(rng, x, state)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def _clip_loss(model: TDRN, params, frames: Array, targets: Targets, priors, cfg,
               remat: bool = False):
    """Scan the model over a (T, B, H, W, 3) clip, summing per-frame losses.

    remat=True checkpoints each frame's forward: the backward recomputes
    per-frame activations instead of keeping T copies alive in HBM — the
    standard memory/FLOPs trade for truncated BPTT over long clips."""
    batch = frames.shape[1]
    init = model.zero_state(batch)
    apply_fn = model.apply
    if remat:
        apply_fn = jax.checkpoint(model.apply)

    def step(state, xs):
        x_t, boxes_t, labels_t, valid_t = xs
        preds, new_state = apply_fn(params, x_t, state)
        loss, metrics = refine_multibox_loss(
            preds, priors, Targets(boxes_t, labels_t, valid_t), cfg
        )
        return new_state, (loss, metrics)

    _, (losses, metrics) = jax.lax.scan(
        step, init, (frames, targets.boxes, targets.labels, targets.valid)
    )
    return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)


def _image_loss(model: TDRN, params, images: Array, targets: Targets, priors, cfg):
    state = model.zero_state(images.shape[0]) if model.temporal else None
    preds, _ = model.apply(params, images, state)
    return refine_multibox_loss(preds, priors, targets, cfg)


def make_train_step(
    model: TDRN,
    optimizer: optax.GradientTransformation,
    clip_mode: bool = False,
    remat: bool = False,
    compute_dtype: Optional[Any] = None,
    qat_scales: Optional[Dict[str, float]] = None,
):
    """Build the jitted train step.

    clip_mode=False: images (B, H, W, 3), targets (B, G, ...).
    clip_mode=True:  frames (T, B, H, W, 3), targets (T, B, G, ...) — TDRN
    truncated-BPTT over the clip. remat checkpoints per-frame forwards.

    compute_dtype=jnp.bfloat16 enables mixed-precision training: the
    feature-pyramid params are cast bf16 ONCE per step — hoisted outside the
    clip scan, unlike flax ``dtype=bf16`` on an fp32 tree, which re-casts
    every weight inside each scan iteration — while the ARM/ODM heads, the
    loss, the optimizer state, and the master params all stay fp32 (the same
    fp32-heads split as the resident-bf16 inference profile, so train and
    serve precision match). Grads flow through the cast back to the fp32
    masters; bf16 keeps fp32's exponent range, so no loss scaling is needed.

    qat_scales: calibrated activation scales (utils/quantize) — the loss
    forward fake-quantizes the int8-profile convs on the serving grids with
    straight-through gradients (utils/quantize.apply_qat). Masters, optimizer
    state, and checkpoints stay plain fp32; the TRAIN model passed in is
    unchanged (composes with compute_dtype like the serving profiles do).
    """
    cfg = model.cfg
    loss_model = model
    cast_in = None
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        from tdrn_tpu.utils.precision import cast_params_bf16

        assert jnp.dtype(compute_dtype) == jnp.bfloat16, compute_dtype
        loss_model = model.clone(dtype=compute_dtype, head_dtype=jnp.float32)
        cast_in = cast_params_bf16
    if qat_scales:
        from tdrn_tpu.utils.quantize import apply_qat

        loss_model = apply_qat(loss_model, qat_scales)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(ts: TrainState, batch_images: Array, targets: Targets):
        priors = prior_boxes(cfg)

        def loss_fn(params):
            if cast_in is not None:
                params = cast_in(params)
            if clip_mode:
                return _clip_loss(loss_model, params, batch_images, targets, priors, cfg, remat)
            return _image_loss(loss_model, params, batch_images, targets, priors, cfg)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, ts.step + 1), metrics

    return train_step
