"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests are hermetic and CPU-only; the real-TPU paths are exercised by
bench.py and __graft_entry__.py.

The axon TPU plugin (sitecustomize on PYTHONPATH) registers itself at
interpreter start and rewrites jax_platforms, so overriding the env var is
not enough — override the config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
