"""Pytest configuration: force the JAX CPU backend with 8 virtual devices.

Multi-chip sharding tests run single-process on a virtual device mesh
(SURVEY.md section 4 "multi-chip tests runnable via device count override");
the real-TPU benchmark path is exercised separately by bench.py.
Must run before the first ``import jax`` anywhere in the test session.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
