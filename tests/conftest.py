"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native analog of multi-node testing without a cluster — the
sharding/collective code paths compile and execute on 8 virtual CPU devices
exactly as they would on a v5e-8 slice.
"""

import os

# The environment presets JAX_PLATFORMS=axon (the real TPU tunnel); tests must
# run on the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and programmatically
# sets jax_platforms="axon,cpu" (overriding the env var) — override it back.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Per-op eager dispatch costs ~0.4 s/op to compile on this 1-core host; tests
# must jit whole model calls, and the persistent cache makes reruns cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
