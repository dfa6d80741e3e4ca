"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native analog of multi-node testing without a cluster — the
sharding/collective code paths compile and execute on 8 virtual CPU devices
exactly as they would on a v5e-8 slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
