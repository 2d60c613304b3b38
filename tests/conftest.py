"""Test configuration: force an 8-device virtual CPU mesh before any JAX
computation (the axon TPU plugin otherwise preempts JAX_PLATFORMS=cpu).

Tests exercise the multi-chip sharding paths (shard_map over a Mesh)
without real TPU hardware, mirroring the driver's dryrun_multichip
validation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite re-jits the same programs
# every run (and this host has a single vCPU, so compiles dominate the
# wall clock).  Cache survives across pytest invocations.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
