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

import pytest  # noqa: E402

# ---- test tiers -----------------------------------------------------------
# The full suite is compile-dominated (~40-60 min cold on a 1-vCPU
# host).  Files whose tests drive multi-batch pipelines, the 8-device
# mesh, or end-to-end visits are marked `slow`; the quick tier
#
#     pytest -m "not slow" tests/
#
# covers every module's unit physics in a few minutes and is the
# pre-commit gate; the full suite runs at milestones (the reference
# splits the same way: unit tests vs its CI visit drives).
_SLOW_FILES = {
    "test_mesh_visit.py",
    "test_mesh_sizes.py",
    "test_golden_visit.py",
    "test_multidet.py",
    "test_end_to_end.py",
    "test_config_pipeline.py",
    "test_fft_pass.py",
    "test_flat_skycat.py",
    "test_bf_quantitative.py",
    "test_wavefront_sensors.py",
    "test_multihost.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-batch / mesh / end-to-end drives "
        "(excluded by the quick tier: -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
