"""Dev-tool analogs (reference devel-tools/): mosaic assembly,
tree-ring parameter refitting, raytraced vignetting profile."""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imsim_tpu.electronics.camera import get_camera  # noqa: E402
from imsim_tpu.io import fits as tfits  # noqa: E402

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def test_refit_tree_rings_roundtrip(tmp_path):
    """Refit a profile generated from known parameters; the refit model
    must reproduce the displacement curve and the emitted block must
    parse through read_tree_ring_parameters."""
    sys.path.insert(0, TOOLS)
    from refit_tree_rings import (format_block, model_displacement,
                                  refit_profile)

    from imsim_tpu.sensor.treerings import read_tree_ring_parameters

    rng = np.random.default_rng(7)
    nf = 6
    cf = rng.uniform(100.0, 600.0, nf)
    cp = rng.uniform(0, 2 * np.pi, nf)
    sf = cf.copy()
    sp = rng.uniform(0, 2 * np.pi, nf)
    A, B = 1.2, 1.1e-16
    r = np.linspace(0.0, 6000.0, 4000)
    dr = model_displacement(r, A, B, cf, cp, sf, sp)

    fit = refit_profile(r, dr, numfreqs=10)
    model = model_displacement(r, *fit)
    rms = np.sqrt(np.mean((model - dr) ** 2))
    sig = np.sqrt(np.mean(dr**2))
    assert rms < 0.25 * sig, (rms, sig)

    block = format_block("R22_S11", (-100.0, -80.0), *fit)
    path = tmp_path / "tr.txt"
    path.write_text(block)
    models = read_tree_ring_parameters(str(path), numfreqs=10)
    assert "R22_S11" in models
    m = models["R22_S11"]
    # writer subtracts / reader re-adds the 2048.5 pixel offset
    assert abs(m.center[0] - (-100.0)) < 1e-6
    assert abs(m.center[1] - (-80.0)) < 1e-6
    got = m.radial_displacement(r[: 2000])
    want = model[: 2000]
    assert np.sqrt(np.mean((got - want) ** 2)) < 0.3 * sig


def test_eimage_mosaic(tmp_path):
    sys.path.insert(0, TOOLS)
    from eimage_mosaic import build_mosaic

    cam = get_camera("LsstCamSim")
    paths = []
    for det, level in [("R22_S11", 100.0), ("R01_S02", 300.0)]:
        img = np.full((4004, 4096), level, np.float32)
        p = tmp_path / f"eimage_{det}.fits"
        tfits.write_fits(str(p), [tfits.HDU(
            data=img, is_primary=True, header={"DET_NAME": det})])
        paths.append(str(p))
    mosaic, placed = build_mosaic(paths, bin_factor=64)
    assert sorted(placed) == ["R01_S02", "R22_S11"]
    # the center detector covers the mosaic midpoint at its level
    n = mosaic.shape[0]
    assert abs(mosaic[n // 2, n // 2] - 100.0) < 1.0
    assert mosaic.max() > 290.0


def test_fit_vignetting_profile():
    sys.path.insert(0, TOOLS)
    from fit_vignetting import raytraced_profile

    r_mm, frac = raytraced_profile(nfield=8, nrays=1500, max_deg=2.2)
    assert frac[0] == 1.0
    # monotone-ish falloff: the edge is well below the center
    assert frac[-1] < 0.7
    assert np.all(np.diff(r_mm) > 0)


def test_tools_cli_help():
    """Each tool is runnable as a script."""
    for tool in ["eimage_mosaic.py", "refit_tree_rings.py",
                 "fit_vignetting.py"]:
        out = subprocess.run(
            [sys.executable, os.path.join(TOOLS, tool), "--help"],
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr


def test_det_list_job_splitting():
    """output.njobs/output.job (the galsim CLI -n/-j cluster fan-out):
    jobs partition the detector list evenly and disjointly."""
    class _Cam:
        det_names = [f"D{i}" for i in range(10)]

    class _Ctx:
        camera = _Cam()

        def __init__(self, njobs, job):
            self.cfg = {"output": {"njobs": njobs, "job": job}}

    from imsim_tpu.config.runner import _det_list

    parts = [_det_list(_Ctx(3, j)) for j in (1, 2, 3)]
    got = sorted(d for p in parts for d in p)
    assert got == list(range(10))
    assert all(len(p) in (3, 4) for p in parts)
    assert _det_list(_Ctx(1, 1)) == list(range(10))
