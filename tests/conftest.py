"""Test env: force the JAX CPU backend with 8 virtual devices so sharding tests
run without a real TPU slice (SURVEY.md §4 "fake-device tests").

Note: this environment presets JAX_PLATFORMS=axon (a remote TPU tunnel) and
the axon plugin wins platform selection even when the env var says cpu, so we
must use the config API — it is authoritative — before any backend is
initialized. jax_num_cpu_devices replaces the legacy
--xla_force_host_platform_device_count flag in this jax version."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
