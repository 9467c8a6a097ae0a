"""Test env: force a virtual 8-device CPU platform before any test imports jax.

This is the JAX-native "fake backend" for exercising pjit/shard_map multi-chip
code paths without TPU hardware (see SURVEY.md §4).

Note: this image's axon sitecustomize registers the TPU backend and sets the
``jax_platforms`` config directly in every python process, so the JAX_PLATFORMS
env var alone does NOT stick — the jax.config update below is required.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: repeat suite runs skip recompiling the many
# tiny jitted programs (the dominant cost of the CPU test backend)
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
