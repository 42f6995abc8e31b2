"""Pytest configuration: force the JAX CPU backend with 8 virtual devices.

Multi-chip sharding tests run single-process on a virtual device mesh
(SURVEY.md section 4 "multi-chip tests runnable via device count override");
the real-TPU benchmark path is exercised separately by bench.py.

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so the env var alone is not enough -- jax.config must be updated
after import, before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The pair-backend programs take minutes of XLA CPU compile time on a
# small host; persist compiles so repeat suite runs skip them.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
