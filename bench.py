"""Benchmark harness: streaming TDRN-VGG16 @320 per-frame inference on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/sec/chip for streaming 320x320 video inference (BASELINE.json
headline). Baseline: the reference TDRN runs "real-time" (>20 FPS) on a
1080Ti-class GPU (BASELINE.md); vs_baseline = our_fps / 20.0. The binding
target is vs_baseline >= 4.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 20.0  # reference TDRN real-time claim (BASELINE.md, TDRN paper)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16, help="concurrent streams (16 = throughput sweet spot on v5e; see BENCH.md)")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tdrn_tpu.config import VID_320
    from tdrn_tpu.inference import StreamingDetector
    from tdrn_tpu.models import build_detector

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_detector(VID_320, temporal=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch, 320, 320, 3), dtype)
    params = model.init(rng, x, model.zero_state(args.batch))

    det = StreamingDetector(model, params, num_streams=args.batch)
    frame_rng = np.random.RandomState(0)
    frames = frame_rng.randint(0, 255, (args.batch, 320, 320, 3), dtype=np.uint8)

    # Warmup (compile + cache).
    for _ in range(args.warmup):
        out = det.detect(frames)
    jax.block_until_ready(out)

    # Timed run: per-frame latency distribution + throughput.
    lat = []
    t0 = time.perf_counter()
    for _ in range(args.frames):
        s = time.perf_counter()
        out = det.detect(frames)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - s)
    total = time.perf_counter() - t0

    fps = args.frames * args.batch / total
    p50_ms = float(np.percentile(lat, 50) * 1e3)
    result = {
        "metric": "streaming_vid320_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "p50_latency_ms": round(p50_ms, 3),
        "batch": args.batch,
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
