"""Benchmark harness: streaming TDRN-VGG16 @320 per-frame inference on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (hard-won, see BENCH.md): on the axon TPU tunnel
``jax.block_until_ready`` returns at dispatch, not completion, so naive timing
measures the Python dispatch rate. Here:
  * throughput — N pipelined steps then ONE host materialization. The
    temporal state chains every step into a dependency sequence, so the final
    fetch forces the device to have executed all N steps; total/N is true
    steady-state device throughput.
  * latency — separate loop with a full host materialization per frame
    (includes one tunnel round-trip, the worst case for a remote client).

Metric: frames/sec/chip for streaming 320x320 video inference (BASELINE.json
headline). Baseline: the reference TDRN runs "real-time" (>20 FPS) on a
1080Ti-class GPU (BASELINE.md); vs_baseline = our_fps / 20.0. Binding target
is vs_baseline >= 4.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 20.0  # reference TDRN real-time claim (BASELINE.md, TDRN paper)


def materialize(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a), tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16, help="concurrent streams")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--config", default="vid_320", help="detector config name")
    ap.add_argument("--backbone", default="vgg16", choices=["vgg16", "resnet101"])
    ap.add_argument("--stem", default="conv", choices=["conv", "poly", "poly2", "s2d", "fused", "fused2"])
    ap.add_argument("--cell", default="convgru", choices=["convgru", "light", "hybrid"])
    ap.add_argument("--prefilter", type=int, default=512,
                    help="streaming-profile anchor cap before per-class NMS "
                         "(0 = exact reference-parity Detect; eval.py always "
                         "uses the exact path)")
    ap.add_argument("--bf16_weights", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="resident-bf16 feature-pyramid weights + carry, fp32 "
                         "heads/detect (utils/precision.py) — the streaming "
                         "serving profile default; --no-bf16_weights reverts "
                         "to full fp32")
    ap.add_argument("--int8", action="store_true",
                    help="int8 backbone on top of the bf16 profile "
                         "(utils/quantize.py; calibrated on this bench's "
                         "random frames — perf only, quality gates via "
                         "eval.py --precision int8)")
    ap.add_argument("--int8_tcb", action="store_true",
                    help="with --int8: also quantize the TCB pyramid convs")
    ap.add_argument("--int8_gru", action="store_true",
                    help="with --int8: also quantize the temporal-cell convs "
                         "(needs the temporal model)")
    args = ap.parse_args()
    if (args.int8_tcb or args.int8_gru) and not args.int8:
        # ADVICE r4: silently ignoring the sub-flags would mislabel the row.
        ap.error("--int8_tcb/--int8_gru require --int8")

    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)

    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import get_config
    from tdrn_tpu.inference import StreamingDetector
    from tdrn_tpu.models import build_detector

    cfg = get_config(args.config)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_detector(
        cfg, backbone=args.backbone, temporal=True, dtype=dtype,
        stem=args.stem, temporal_cell=args.cell,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch, cfg.size, cfg.size, 3), dtype)
    params = model.init(rng, x, model.zero_state(args.batch))
    if args.bf16_weights:
        from tdrn_tpu.utils.precision import apply_inference_precision

        model, params = apply_inference_precision(model, params, "bf16")
    if args.int8:
        from tdrn_tpu.ops.preprocess import preprocess_batch
        from tdrn_tpu.utils.quantize import apply_int8_backbone

        calib = preprocess_batch(
            jnp.asarray(np.random.RandomState(1).randint(
                0, 255, (8, cfg.size, cfg.size, 3), dtype=np.uint8
            )), cfg, model.dtype,
        )
        model, params = apply_int8_backbone(model, params, calib,
                                            tcb=args.int8_tcb,
                                            gru=args.int8_gru)

    det = StreamingDetector(model, params, num_streams=args.batch,
                            prefilter=args.prefilter or None)
    frame_rng = np.random.RandomState(0)
    # Pre-upload the frame batch: we benchmark the chip, not the dev tunnel's
    # host->device bandwidth (a co-located production host pays ~us for this
    # copy; the axon tunnel pays ~40ms). StreamingDetector accepts
    # device-resident frames transparently.
    frames = jax.device_put(
        frame_rng.randint(0, 255, (args.batch, cfg.size, cfg.size, 3), dtype=np.uint8)
    )

    for _ in range(args.warmup):
        out = det.detect(frames)
    materialize(out)

    # Throughput: pipelined steps; the carried temporal state chains them, so
    # the single final fetch forces execution of the whole sequence.
    t0 = time.perf_counter()
    for _ in range(args.frames):
        out = det.detect(frames)
    materialize(out)
    total = time.perf_counter() - t0
    fps = args.frames * args.batch / total

    # Latency: full per-frame round trip (device step + tunnel fetch).
    lat = []
    for _ in range(max(args.frames // 4, 10)):
        s = time.perf_counter()
        materialize(det.detect(frames))
        lat.append(time.perf_counter() - s)

    result = {
        "metric": f"streaming_{args.config}_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "p50_roundtrip_latency_ms": round(float(np.percentile(lat, 50) * 1e3), 3),
        "step_ms": round(total / args.frames * 1e3, 3),
        "batch": args.batch,
        "dtype": args.dtype,
        "bf16_weights": args.bf16_weights,
        "int8": args.int8,
        "backbone": args.backbone,
        "stem": args.stem,
        "cell": args.cell,
        "prefilter": args.prefilter,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
