"""Structured metrics logging + profiling helpers.

Rebuild of the reference's observability (SURVEY.md §5.1/§5.5): the reference
prints per-iteration losses and optionally plots to visdom; tracing is ad-hoc
wall-clock prints. Here: a structured JSONL metrics logger (host-side, cheap),
an optional TensorBoard writer (tf.summary, gated on tensorflow presence), and
``jax.profiler`` trace capture around training/bench windows.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics log + console echo, TB optional."""

    def __init__(self, log_dir: str, tensorboard: bool = False, echo_every: int = 10):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.echo_every = echo_every
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
        if self.echo_every and step % self.echo_every == 0:
            parts = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        self._f.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed window (no-op if dir None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock stage timer with block_until_ready fencing."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def time(self, name: str, fence: Any = None):
        start = time.perf_counter()
        yield
        if fence is not None:
            import jax

            jax.block_until_ready(fence)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - start
