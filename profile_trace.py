"""Profiling entry point (CLI).

Rebuild of the reference's tracing story (SURVEY.md §5.1 — wall-clock FPS
prints) as real observability: capture a ``jax.profiler`` trace of the
streaming step (viewable in TensorBoard / Perfetto) plus a wall-clock stage
breakdown with proper device fencing.

Example:
    python profile_trace.py --out /tmp/tdrn_trace --frames 20
    tensorboard --logdir /tmp/tdrn_trace
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="Capture a profiler trace of streaming inference")
    ap.add_argument("--config", default="vid_320")
    ap.add_argument("--backbone", default="vgg16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--stem", default="conv", choices=["conv", "poly", "poly2", "s2d", "fused", "fused2"])
    ap.add_argument("--cell", default="convgru",
                    choices=["convgru", "light", "hybrid"])
    ap.add_argument("--prefilter", type=int, default=0)
    ap.add_argument("--int8", action="store_true",
                    help="int8 PTQ backbone (random-frame calibration — "
                         "timing-representative, not serving-representative)")
    ap.add_argument("--int8_tcb", action="store_true")
    ap.add_argument("--int8_gru", action="store_true")
    ap.add_argument("--bf16_weights", action="store_true",
                    help="resident-bf16 serving profile (utils/precision.py)")
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default="/tmp/tdrn_trace")
    args = ap.parse_args()
    if (args.int8_tcb or args.int8_gru) and not args.int8:
        # ADVICE r4: silently ignoring the sub-flags would mislabel the trace.
        ap.error("--int8_tcb/--int8_gru require --int8")

    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)

    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import get_config
    from tdrn_tpu.inference import StreamingDetector
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.utils.logging import Timer, profile_trace

    cfg = get_config(args.config)
    model = build_detector(cfg, backbone=args.backbone, temporal=True,
                           stem=args.stem, temporal_cell=args.cell)
    x = jnp.zeros((args.batch, cfg.size, cfg.size, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, model.zero_state(args.batch))
    if args.bf16_weights:
        from tdrn_tpu.utils.precision import apply_inference_precision

        model, params = apply_inference_precision(model, params, "bf16")
    if args.int8:
        from tdrn_tpu.ops.preprocess import preprocess_batch
        from tdrn_tpu.utils.quantize import apply_int8_backbone

        calib = preprocess_batch(
            jnp.asarray(np.random.RandomState(1).randint(
                0, 255, (min(args.batch, 8), cfg.size, cfg.size, 3),
                dtype=np.uint8,
            )), cfg, model.dtype, model.fold_mean,
        )
        model, params = apply_int8_backbone(model, params, calib,
                                            tcb=args.int8_tcb,
                                            gru=args.int8_gru)
    det = StreamingDetector(model, params, num_streams=args.batch,
                            prefilter=args.prefilter or None, chunk=args.chunk)
    shape = (args.batch, cfg.size, cfg.size, 3)
    if args.chunk > 1:
        shape = (args.chunk,) + shape
    frames = jax.device_put(
        np.random.RandomState(0).randint(0, 255, shape, dtype=np.uint8)
    )
    out = det.detect(frames)
    jax.tree.map(np.asarray, out)  # compile + sync

    timer = Timer()
    with timer.time("warm_steps", fence=None):
        for _ in range(args.frames):
            out = det.detect(frames)
        jax.tree.map(np.asarray, out)
    per = timer.times["warm_steps"] / args.frames
    print(f"steady-state: {per * 1e3:.2f} ms/step ({args.batch / per:.0f} frames/s)")

    try:
        with profile_trace(args.out):
            for _ in range(args.frames):
                out = det.detect(frames)
            jax.tree.map(np.asarray, out)
        print(f"trace written to {args.out}")
    except Exception as e:  # some remote transports don't support tracing
        print(f"profiler trace unavailable on this backend: {e}")


if __name__ == "__main__":
    main()
