"""Fused Pallas kernel for the ARM->ODM anchor-refinement cascade.

BASELINE.json north star: "the ARM->ODM anchor-refinement cascade (coarse
anchor regression feeding the object detection module) becomes fused Pallas
kernels". This kernel computes, in ONE VMEM-resident pass over the anchors:

    ARM decode (priors -> refined anchors, center form)
 -> ODM decode (refined anchors -> final boxes, corner form)
 -> ODM softmax over classes
 -> ARM negative-anchor filter (background prob > thresh silences the anchor)
 -> background-column + padded-anchor masking

replacing the XLA elementwise-fusion chain plus the (B, P, C) -> (B, C, P)
transpose XLA materializes before the per-class NMS sort (scores are emitted
class-major directly). Layout: anchors on the 128-lane axis, classes/coords
on sublanes; the whole anchor set (P <= ~16K padded to 128) is one block, so
the grid is just (batch,).

Reference semantics: ops/detection.py `decode_two_stage` (itself the rebuild
of the reference Detect's two-stage decode, SURVEY.md §2 #20); equivalence is
asserted in tests/test_cascade_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cascade_kernel(
    arm_loc_ref, arm_conf_ref, odm_loc_ref, odm_conf_ref, priors_ref,
    boxes_ref, scores_ref, *, v0, v1, arm_thresh, num_anchors,
):
    pr = priors_ref[:]  # (4, TP)
    pcx, pcy, pw, ph = pr[0:1], pr[1:2], pr[2:3], pr[3:4]
    al = arm_loc_ref[0]
    acx = pcx + al[0:1] * v0 * pw
    acy = pcy + al[1:2] * v0 * ph
    aw = pw * jnp.exp(al[2:3] * v1)
    ah = ph * jnp.exp(al[3:4] * v1)
    ol = odm_loc_ref[0]
    cx = acx + ol[0:1] * v0 * aw
    cy = acy + ol[1:2] * v0 * ah
    w = aw * jnp.exp(ol[2:3] * v1)
    h = ah * jnp.exp(ol[3:4] * v1)
    boxes_ref[0] = jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=0
    )

    oc = odm_conf_ref[0]  # (C, TP)
    m = jnp.max(oc, axis=0, keepdims=True)
    e = jnp.exp(oc - m)
    sm = e / jnp.sum(e, axis=0, keepdims=True)

    ac = arm_conf_ref[0]  # (2, TP)
    mb = jnp.maximum(ac[0:1], ac[1:2])
    e0 = jnp.exp(ac[0:1] - mb)
    e1 = jnp.exp(ac[1:2] - mb)
    bg = e0 / (e0 + e1)

    c, tp = oc.shape
    cls_row = jax.lax.broadcasted_iota(jnp.int32, (c, tp), 0)
    anchor = jax.lax.broadcasted_iota(jnp.int32, (c, tp), 1)
    keep = (bg <= arm_thresh) & (cls_row > 0) & (anchor < num_anchors)
    scores_ref[0] = jnp.where(keep, sm, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_refine_cascade(preds, priors, cfg, interpret=False):
    """preds: RawPredictions (B, P, ·); priors (P, 4) center form.

    Returns (boxes (B, P, 4) xyxy, scores_cm (B, C, P) softmax, filtered) —
    scores are CLASS-MAJOR, ready for the per-class NMS without a transpose.
    """
    b, p, _ = preds.arm_loc.shape
    c = preds.odm_conf.shape[-1]
    tp = -(-p // 128) * 128  # pad anchors to the 128-lane grain

    def prep(x):  # (B, P, D) -> (B, D, TP)
        x = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - p)))

    priors_t = jnp.pad(
        jnp.swapaxes(priors.astype(jnp.float32), 0, 1), ((0, 0), (0, tp - p)),
        constant_values=0.5,  # benign center/size for padded anchors
    )

    kern = functools.partial(
        _cascade_kernel,
        v0=float(cfg.variance[0]), v1=float(cfg.variance[1]),
        arm_thresh=float(cfg.arm_filter_thresh), num_anchors=p,
    )
    boxes_t, scores_cm = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b, 4, tp), jnp.float32),
            jax.ShapeDtypeStruct((b, c, tp), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, tp), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tp), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tp), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tp), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, tp), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tp), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        prep(preds.arm_loc), prep(preds.arm_conf), prep(preds.odm_loc),
        prep(preds.odm_conf), priors_t,
    )
    boxes = jnp.swapaxes(boxes_t, 1, 2)[:, :p]  # (B, P, 4) xyxy
    return boxes, scores_cm[:, :, :p]
