"""Test config: run everything on a virtual 8-device CPU mesh (the standard
way to test pod code without a pod — SURVEY.md §4) with x64 enabled for
numerical-parity asserts against closed forms."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The image's sitecustomize force-registers the axon TPU plugin and overrides
# JAX_PLATFORMS; re-assert CPU here (before any backend init) so tests run on
# the virtual 8-device CPU mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# jit compiles dominate suite wall-clock (hundreds of NUTS/ChEES/scan
# programs); the persistent compilation cache makes repeat runs ~compile-free
jax.config.update("jax_compilation_cache_dir", "/tmp/gaplac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
