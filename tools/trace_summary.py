"""Aggregate a jax.profiler trace into per-category / per-op device time.

The trace-driven optimization loop (BENCH.md round 2/3): capture with
``profile_trace.py --out DIR``, then

    python tools/trace_summary.py DIR [--steps N] [--top 25]

walks ``DIR/plugins/profile/*/``'s ``*.trace.json.gz``, keeps device-lane
complete events (the ones carrying an ``hlo_category`` arg on this backend),
and prints total duration by category plus the top ops by summed duration —
with per-step values when --steps is given. This is how the round-2 detect
hotspots and the round-3 "formatting copies" were localized.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}/plugins/profile/*/")
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=0,
                    help="divide durations by N steps for per-step ms")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--category", default=None,
                    help="only list ops of this hlo_category")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_cat = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        cat = (e.get("args") or {}).get("hlo_category")
        if cat is None:
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "?")
        by_cat[cat] += dur
        if args.category is None or cat == args.category:
            by_op[name] += dur
            op_cat[name] = cat

    div = max(args.steps, 1)
    unit = "ms/step" if args.steps else "ms total"
    print(f"== by hlo_category ({unit})")
    total = sum(by_cat.values())
    for cat, dur in by_cat.most_common():
        print(f"  {dur / 1e3 / div:8.3f}  {100 * dur / total:5.1f}%  {cat}")
    print(f"  {total / 1e3 / div:8.3f}  total")
    print(f"== top {args.top} ops ({unit})")
    for name, dur in by_op.most_common(args.top):
        print(f"  {dur / 1e3 / div:8.3f}  [{op_cat[name]}] {name[:110]}")


if __name__ == "__main__":
    main()
