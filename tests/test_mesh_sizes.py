"""Mesh-size generality for the driver's multi-chip gate.

The driver validates sharding with dryrun_multichip(N) on N virtual
CPU devices; the in-process suite always runs the 8-device mesh
(conftest).  This drives the same entry point at OTHER mesh sizes via
its subprocess path (which re-execs with its own
--xla_force_host_platform_device_count), proving the (ccd, phot)
factorization, the shard_map layouts, and the flux assertions hold for
non-power-of-two and larger meshes — the live pod slices the design
targets (SURVEY.md §2c; reference per-CCD fan-out is an arbitrary
`output.nproc`, imsim/lsst_image.py).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.parametrize("n_devices", [6, 16])
def test_dryrun_other_mesh_sizes(n_devices):
    import __graft_entry__ as g

    # Subprocess path: the child pins JAX_PLATFORMS=cpu and its own
    # device count, so the parent's 8-device mesh doesn't constrain it.
    env_flag = os.environ.pop("_IMSIM_TPU_DRYRUN_CHILD", None)
    try:
        g.dryrun_multichip(n_devices)
    finally:
        if env_flag is not None:
            os.environ["_IMSIM_TPU_DRYRUN_CHILD"] = env_flag
