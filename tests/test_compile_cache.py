"""Persistent compilation cache wiring (utils/compile_cache.py)."""

import os

import jax
import jax.numpy as jnp

from tdrn_tpu.utils.compile_cache import enable_compile_cache


def test_cache_writes_and_hits(tmp_path, monkeypatch):
    monkeypatch.delenv("TDRN_COMPILE_CACHE", raising=False)
    d = enable_compile_cache(str(tmp_path))
    assert d == str(tmp_path)
    # The CLI default (>=1s compiles) would skip this tiny graph; lower the
    # floor so the test exercises an actual write.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        f = jax.jit(lambda x: (x @ x).sum() * 3)
        f(jnp.ones((64, 64))).block_until_ready()
        entries = os.listdir(tmp_path)
        assert entries, "no cache entry written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", None)


def test_opt_out(monkeypatch, tmp_path):
    monkeypatch.setenv("TDRN_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
    # An explicit directory (e.g. the tpu_checks probe) overrides the opt-out.
    try:
        assert enable_compile_cache(str(tmp_path)) == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_redirect(monkeypatch, tmp_path):
    monkeypatch.setenv("TDRN_COMPILE_CACHE", str(tmp_path / "alt"))
    try:
        assert enable_compile_cache() == str(tmp_path / "alt")
        assert (tmp_path / "alt").is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
