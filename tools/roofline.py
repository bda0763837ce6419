"""Analytic roofline for a serving profile: per-conv FLOPs/bytes and the
speed-of-light step time on TPU v5e.

Walks the ACTUAL model (shape-only: ``jax.eval_shape`` with
``capture_intermediates`` — no device, no compute) pairing every conv kernel
parameter with its output activation shape, then reports per-layer

    flops      = out_elems * kh * kw * cin * 2
    bytes      = in_act + kernel + out_act   (at the layer's serving dtype)
    sol_ms     = max(flops / peak_flops, bytes / peak_bw)

and the model-total SOL against the measured device step (BENCH.md) — the
honest "how far from the light" number that guided the int8/poly work. The
MXU peaks are the published v5e numbers; fp32 conv throughput on the MXU is
approximated as half the bf16 rate.

Usage:
    python tools/roofline.py --batch 8                 # default vgg320 bf16
    python tools/roofline.py --batch 8 --int8 --int8_tcb --int8_gru
    python tools/roofline.py --config vid_512 --backbone resnet101 --batch 4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# TPU v5e (v5 lite) published peaks.
PEAK = {"bf16": 197e12, "int8": 394e12, "fp32": 98.5e12}
HBM_BW = 819e9  # bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="vid_320")
    ap.add_argument("--backbone", default="vgg16", choices=["vgg16", "resnet101"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cell", default="convgru", choices=["convgru", "light"])
    ap.add_argument("--no_temporal", action="store_true")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--int8", action="store_true",
                    help="backbone convs at the int8 MXU rate")
    ap.add_argument("--int8_tcb", action="store_true")
    ap.add_argument("--int8_gru", action="store_true")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--measured_ms", type=float, default=None,
                    help="measured device step (ms) to compare against")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tdrn_tpu.config import get_config
    from tdrn_tpu.models import build_detector

    cfg = get_config(args.config)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = build_detector(
        cfg, backbone=args.backbone, temporal=not args.no_temporal,
        dtype=dtype, temporal_cell=args.cell, head_dtype=jnp.float32,
    )
    b = args.batch
    x = jax.ShapeDtypeStruct((b, cfg.size, cfg.size, 3), dtype)
    state_t = (
        jax.eval_shape(lambda: model.zero_state(b)) if model.temporal else None
    )
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(x.shape, x.dtype),
                           model.zero_state(b) if model.temporal else None)
    )
    _, mods = jax.eval_shape(
        lambda v, f, s: model.apply(v, f, s, capture_intermediates=True),
        params, x, state_t,
    )
    inter = mods["intermediates"]

    def walk_outputs(tree, prefix=""):
        """Flatten captured module outputs: path -> output ShapeDtypeStruct."""
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if k == "__call__":
                leaf = v[0]
                if isinstance(leaf, (tuple, list)):
                    leaf = leaf[0]
                if hasattr(leaf, "shape"):
                    out[prefix] = leaf
            elif isinstance(v, dict):
                out.update(walk_outputs(v, p))
        return out

    outs = walk_outputs(inter)

    def walk_kernels(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                if "kernel" in v and hasattr(v["kernel"], "shape") and \
                        len(v["kernel"].shape) == 4:
                    out[p] = v["kernel"].shape
                out.update(walk_kernels(v, p))
        return out

    kernels = walk_kernels(params["params"])

    def rate_for(path):
        if args.int8 and (
            path.startswith("backbone")
            or (args.int8_tcb and path.startswith("tcb"))
            or (args.int8_gru and path.startswith("temporal"))
        ):
            return "int8"
        return args.dtype

    rows = []
    for path, kshape in kernels.items():
        o = outs.get(path)
        if o is None or len(o.shape) != 4:
            continue
        kh, kw, cin, cout = kshape
        if o.shape[-1] != cout:
            continue
        oe = int(np.prod(o.shape))
        flops = oe * kh * kw * cin * 2
        prec = rate_for(path)
        act_bytes = 1 if prec == "int8" else (2 if args.dtype == "bf16" else 4)
        w_bytes = 1 if prec == "int8" else act_bytes
        in_elems = oe // cout * cin  # same spatial grid approx (stride folds)
        bytes_ = in_elems * act_bytes + kh * kw * cin * cout * w_bytes + oe * 2
        sol = max(flops / PEAK[prec], bytes_ / HBM_BW)
        rows.append((path, prec, flops, bytes_, sol))

    rows.sort(key=lambda r: -r[4])
    tf = sum(r[2] for r in rows)
    tb = sum(r[3] for r in rows)
    ts = sum(r[4] for r in rows)
    print(f"profile: {args.config} {args.backbone} b{b} {args.dtype}"
          f"{' +int8' if args.int8 else ''}"
          f"{' +tcb' if args.int8_tcb else ''}"
          f"{' +gru' if args.int8_gru else ''}")
    print(f"conv total: {tf/1e9:.1f} GFLOP  {tb/1e6:.1f} MB  "
          f"SOL {ts*1e3:.3f} ms ({len(rows)} convs)")
    print(f"{'layer':42s} {'prec':5s} {'GFLOP':>8s} {'MB':>8s} {'SOL ms':>8s}")
    for path, prec, flops, bytes_, sol in rows[: args.top]:
        print(f"{path:42s} {prec:5s} {flops/1e9:8.2f} {bytes_/1e6:8.1f} "
              f"{sol*1e3:8.3f}")
    if args.measured_ms:
        print(f"measured {args.measured_ms:.2f} ms -> "
              f"{100 * ts * 1e3 / args.measured_ms:.0f}% of conv-SOL "
              f"(gap = non-conv ops, layout copies, serial depth, detect)")


if __name__ == "__main__":
    main()
