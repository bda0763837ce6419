"""Persistent XLA compilation cache for the CLI surfaces.

The reference lineage pays its (small) CUDA kernel-selection cost per process
implicitly; on TPU the analogous cost is explicit and much larger — jitting
the full streaming/train program takes minutes on a remote-compile transport
(NOTES.md: ~2–5 min per big variant) and XLA recompiles from scratch in every
new process. JAX ships a persistent compilation cache keyed on (HLO, compile
options, backend version) that serializes compiled executables to disk; wiring
it into every entry point turns serve/live/bench/train cold-starts into a
disk read whenever the same program shape was compiled before.

Enabled by default in the CLIs (serve.py, live.py, bench.py, eval.py,
test.py, train.py, tools/*bench*). Opt out with TDRN_COMPILE_CACHE=0 or
relocate with TDRN_COMPILE_CACHE=/path. Safe everywhere: backends whose PJRT
client cannot serialize executables simply miss the cache (JAX raises nothing
unless jax_raise_persistent_cache_errors is set, which we leave False).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "tdrn_tpu",
    "xla",
)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Must run before the first jit compilation (imports are fine; config
    updates apply lazily). Returns the directory in use, or None when
    disabled via TDRN_COMPILE_CACHE=0. An explicit ``cache_dir`` argument
    wins over the env var entirely (callers like tools/tpu_checks.py probe a
    specific directory regardless of the user's opt-out).
    """
    if cache_dir is None:
        env = os.environ.get("TDRN_COMPILE_CACHE")
        if env == "0":
            return None
        cache_dir = env if env else _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_enable_compilation_cache", True)
    # Big programs only by default would skip our tiny test graphs; cache
    # anything that took >=1s so CLI-scale programs always land.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
