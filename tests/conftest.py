"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding code is exercised without TPU hardware by emulating
8 XLA host devices (SURVEY.md section 4: multi-device tests via XLA CPU-device
emulation). Must run before the first `import jax` anywhere in the test
process.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the one-chip
# TPU tunnel) and a sitecustomize imports jax before pytest loads this
# conftest — so plain env vars are too late; use jax.config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
