"""Scan-chained device-side micro-benchmark.

One `lax.scan` program runs N streaming steps (uint8 -> preprocess -> model ->
decode -> NMS -> top-k) with the temporal state as carry: ONE dispatch and ONE
fetch regardless of N, so total/N is true per-frame device time even when the
axon tunnel's per-step dispatch latency dominates wall-clock (see BENCH.md
methodology; this is the cross-check tool referenced there).

    python tools/device_bench.py --batch 1 --frames 100
    python tools/device_bench.py --batch 1 --no_detect   # model-only ablation
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--config", default="vid_320")
    ap.add_argument("--backbone", default="vgg16", choices=["vgg16", "resnet101"])
    ap.add_argument("--stem", default="conv", choices=["conv", "poly", "poly2", "s2d", "fused", "fused2"])
    ap.add_argument("--cell", default="convgru", choices=["convgru", "light", "hybrid"])
    ap.add_argument("--no_detect", action="store_true",
                    help="skip decode/NMS/top-k (model-only ablation)")
    ap.add_argument("--no_temporal", action="store_true")
    ap.add_argument("--fused_cascade", action="store_true",
                    help="Pallas ARM->ODM cascade (ops/cascade_pallas.py)")
    ap.add_argument("--prefilter_recall", type=float, default=None,
                    help="with --prefilter: < 1.0 = approximate anchor "
                         "selection (lax.approx_max_k partial reduction)")
    ap.add_argument("--prefilter", type=int, default=0,
                    help="image-wide anchor cap before per-class NMS (0=off)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 backbone (models/layers.QConv, s8xs8->s32 MXU "
                         "convs): calibrated on this bench's own random "
                         "frames — perf-only; quality gates via eval.py "
                         "--precision int8 on the fidelity harness")
    ap.add_argument("--int8_tcb", action="store_true",
                    help="with --int8: also quantize the TCB pyramid convs")
    ap.add_argument("--int8_gru", action="store_true",
                    help="with --int8: also quantize the temporal-cell convs "
                         "(needs the temporal model)")
    ap.add_argument("--bf16_weights", action="store_true",
                    help="resident-bf16 inference profile: cast feature-"
                         "pyramid weights to bf16 once (fp32 heads/detect; "
                         "utils/precision.py) — distinct from --dtype "
                         "bfloat16, which re-casts fp32 weights every step")
    ap.add_argument("--chunk", type=int, default=1,
                    help="pipelined streaming: frames per stream per step "
                         "(TDRN.chunk micro-batching; latency +chunk-1 "
                         "frames, throughput -> batched roofline)")
    ap.add_argument("--fold_mean", action="store_true",
                    help="fold the preprocess mean-subtract into conv1_1 "
                         "(raw rgb+ones input; utils/precision.py)")
    ap.add_argument("--pad_stem", type=int, default=0,
                    help="zero-pad the stem input+kernel to N channels "
                         "(exact; XLA small-C conv rewrite experiment)")
    ap.add_argument("--approx_topk", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="override cfg.approx_topk (A/B the approx_max_k vs "
                         "lax.top_k candidate selection)")
    args = ap.parse_args()
    if (args.int8_tcb or args.int8_gru) and not args.int8:
        # ADVICE r4: silently ignoring the sub-flags would mislabel the row.
        ap.error("--int8_tcb/--int8_gru require --int8")

    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)

    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import get_config
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.ops.detection import detect_topk
    from tdrn_tpu.ops.preprocess import preprocess_batch
    from tdrn_tpu.ops.priors import prior_boxes

    cfg = get_config(args.config)
    if (args.fused_cascade or args.prefilter or args.approx_topk is not None
            or args.prefilter_recall is not None):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, fused_cascade=args.fused_cascade,
            prefilter_anchors=args.prefilter,
            approx_topk=(cfg.approx_topk if args.approx_topk is None
                         else args.approx_topk),
            prefilter_recall=(cfg.prefilter_recall
                              if args.prefilter_recall is None
                              else args.prefilter_recall),
        )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_detector(
        cfg, backbone=args.backbone, temporal=not args.no_temporal, dtype=dtype,
        stem=args.stem, temporal_cell=args.cell,
    )
    if args.chunk > 1:
        model = model.clone(chunk=args.chunk)
    b = args.batch
    ch = args.chunk
    x0 = jnp.zeros((ch * b, cfg.size, cfg.size, 3), dtype)
    state0 = model.zero_state(b) if not args.no_temporal else None
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, state0)
    if args.fold_mean:
        from tdrn_tpu.utils.precision import apply_fold_mean

        model, params = apply_fold_mean(model, params)
    if args.pad_stem:
        from tdrn_tpu.utils.precision import apply_pad_stem

        model, params = apply_pad_stem(model, params, args.pad_stem)
    if args.bf16_weights:
        from tdrn_tpu.utils.precision import apply_inference_precision

        model, params = apply_inference_precision(model, params, "bf16")
        state0 = model.zero_state(b) if not args.no_temporal else None
    if args.int8:
        from tdrn_tpu.utils.quantize import apply_int8_backbone

        calib = preprocess_batch(
            jnp.asarray(np.random.RandomState(1).randint(
                0, 255, (min(ch * b, 8), cfg.size, cfg.size, 3), dtype=np.uint8
            )), cfg, model.dtype, model.fold_mean,
        )
        model, params = apply_int8_backbone(model, params, calib,
                                            tcb=args.int8_tcb,
                                            gru=args.int8_gru)
    priors = prior_boxes(cfg)

    # DISTINCT frame per step: with a loop-invariant frame XLA hoists the whole
    # state-independent backbone/ARM/TCB out of the scan and the number lies.
    steps = max(args.frames // ch, 1)
    frames = jnp.asarray(
        np.random.RandomState(0).randint(
            0, 255, (steps, ch * b, cfg.size, cfg.size, 3), dtype=np.uint8
        )
    )

    @jax.jit
    def run_clip(params, state, frames):
        def step(state, frame):
            x = preprocess_batch(frame, cfg, model.dtype, model.fold_mean)
            preds, new_state = model.apply(params, x, state)
            if args.no_detect:
                out = (preds.odm_loc.sum(), preds.odm_conf.sum())
            else:
                det = detect_topk(preds, priors, cfg)
                out = (det.scores.sum(), det.boxes.sum())
            # keep a data dependency frame->frame even without temporal state
            if new_state is None:
                new_state = state
            return new_state, out
        state, outs = jax.lax.scan(step, state, frames)
        return jax.tree.map(lambda o: o[-1], outs)

    # temporal state chains steps; without it, chain via dummy carry
    carry0 = state0 if state0 is not None else jnp.zeros((1,), model.dtype)
    out = run_clip(params, carry0, frames)
    jax.tree.map(np.asarray, out)  # compile + sync

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = run_clip(params, carry0, frames)
        jax.tree.map(np.asarray, out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    per = best / (steps * ch)
    print(json.dumps({
        "ms_per_frame": round(per * 1e3, 4),
        "frames_per_sec_per_chip": round(b / per, 1),
        "batch": b,
        "dtype": args.dtype,
        "bf16_weights": args.bf16_weights,
        "int8": args.int8,
        "fold_mean": args.fold_mean,
        "pad_stem": args.pad_stem,
        "chunk": ch,
        "stem": args.stem,
        "cell": args.cell,
        "backbone": args.backbone,
        "config": args.config,
        "detect": not args.no_detect,
        "fused_cascade": args.fused_cascade,
        "prefilter": args.prefilter,
        "temporal": not args.no_temporal,
        "frames": args.frames,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
