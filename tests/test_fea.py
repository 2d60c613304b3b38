"""FEA / active-optics perturbation tests (the LSSTBuilder.with_* config
surface of imsim/telescope_loader.py:26-118, modeled bending-mode basis)
and per-detector z offsets (DetectorTelescope, :354-415).
"""
import numpy as np
import pytest

from imsim_tpu.optics.fea import fea_instructions, parse_angle
from imsim_tpu.optics.loader import load_telescope
from imsim_tpu.optics.opd import annular_zernikes


def _zk(tel, jmax=22):
    return np.asarray(annular_zernikes(tel, 0.0, 0.0, 622.0, jmax=jmax,
                                       nx=65))


def test_parse_angle_units():
    assert abs(parse_angle("30 deg") - np.radians(30)) < 1e-12
    assert abs(parse_angle("3600 arcsec") - np.radians(1)) < 1e-12
    assert abs(parse_angle(0.5) - 0.5) < 1e-15
    assert abs(parse_angle("0.5 rad") - 0.5) < 1e-15


def test_m1m3_gravity_perturbs_opd_and_vanishes_at_zenith():
    base = load_telescope()
    g30 = load_telescope(fea={"m1m3_gravity": {"zenith": "30 deg"}})
    g0 = load_telescope(fea={"m1m3_gravity": {"zenith": 0.0}})
    z_base = _zk(base.fiducial)
    z_g30 = _zk(g30.fiducial)
    z_g0 = _zk(g0.fiducial)
    # build orientation (zenith = 0) -> no print-through
    np.testing.assert_allclose(z_g0, z_base, atol=1e-12)
    # at 30 deg the OPD measurably changes (>= 10 nm rms somewhere)
    diff = np.abs(z_g30 - z_base)
    assert diff.max() > 10e-9, diff.max()


def test_m1m3_lut_cancels_gravity():
    g = load_telescope(fea={"m1m3_gravity": {"zenith": "45 deg"}})
    comp = load_telescope(fea={"m1m3_gravity": {"zenith": "45 deg"},
                               "m1m3_lut": {"zenith": "45 deg"}})
    base = load_telescope()
    assert np.abs(_zk(comp.fiducial) - _zk(base.fiducial)).max() < 1e-12
    # with actuator errors the cancellation is imperfect but close
    noisy = load_telescope(fea={"m1m3_gravity": {"zenith": "45 deg"},
                                "m1m3_lut": {"zenith": "45 deg",
                                             "error": 0.05, "seed": 3}})
    resid = np.abs(_zk(noisy.fiducial) - _zk(base.fiducial)).max()
    full = np.abs(_zk(g.fiducial) - _zk(base.fiducial)).max()
    assert 0 < resid < 0.25 * full


def test_temperature_terms_scale_linearly():
    t1 = load_telescope(fea={"m1m3_temperature": {"m1m3_TBulk": 0.1}})
    t2 = load_telescope(fea={"m1m3_temperature": {"m1m3_TBulk": 0.2}})
    base = load_telescope()
    d1 = _zk(t1.fiducial) - _zk(base.fiducial)
    d2 = _zk(t2.fiducial) - _zk(base.fiducial)
    # rtol bounded by the numerical Zernike-fit noise of the OPD probe
    np.testing.assert_allclose(d2, 2 * d1, rtol=1e-3, atol=1e-10)


def test_aos_dof_rigid_body_and_bending():
    dof = np.zeros(50)
    dof[0] = 10.0           # M2 dz, microns
    t = load_telescope(fea={"aos_dof": {"dof": dof}})
    base = load_telescope()
    # M2 despace mostly produces defocus (Noll j=4)
    d = _zk(t.fiducial) - _zk(base.fiducial)
    assert abs(d[3]) > 0.5 * np.abs(d).max() > 0
    # bending mode
    dof2 = np.zeros(50)
    dof2[10] = 1.0
    t2 = load_telescope(fea={"aos_dof": {"dof": dof2}})
    assert np.abs(_zk(t2.fiducial) - _zk(base.fiducial)).max() > 10e-9
    with pytest.raises(ValueError):
        fea_instructions({"aos_dof": {"dof": [0.0] * 10}})


def test_unknown_fea_term_raises():
    with pytest.raises(ValueError):
        fea_instructions({"m9_gravity": {"zenith": 0.1}})


def test_legacy_fea_zernike_lists_still_work():
    t = load_telescope(fea={"M2": [50e-9, 0, 0]})
    base = load_telescope()
    assert np.abs(_zk(t.fiducial) - _zk(base.fiducial)).max() > 1e-9


def test_per_detector_z_offset_changes_focus():
    from imsim_tpu.electronics.camera import get_camera

    cam = get_camera("LsstCamSim")
    # LsstCamSim science sensors sit exactly in the focal plane (zero
    # height error — parity with the reference's simulated camera);
    # the wavefront pairs carry the real +-1.5 mm intra/extra offsets.
    assert all(cam[d].height_mm == 0.0
               for d in ("R22_S11", "R01_S00", "R11_S22"))
    full = get_camera("LsstCam")          # 205-det camera has the WF pairs
    assert full["R00_SW0"].height_mm == -1.5
    assert full["R00_SW1"].height_mm == 1.5
    tel = load_telescope()
    t0 = tel.for_detector("R22_S11", z_offset=0.0)
    t1 = tel.for_detector("R22_S11", z_offset=20e-6)
    assert abs(t0.det_z - t1.det_z - (-20e-6)) < 1e-12 or \
        abs(t1.det_z - t0.det_z - 20e-6) < 1e-12


def test_runner_uses_detector_height(tmp_path):
    """render_one_ccd must trace through the per-detector telescope:
    the detector z the photons land on equals fiducial + height."""
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.optics.wcs_factory import make_wcs_factory

    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    wcs_a = fac.get_wcs(ccd, z_offset=10e-6)    # explicit 10 um defocus
    wcs_b = fac.get_wcs(ccd, z_offset=0.0)      # explicitly fiducial
    # a ~10 um defocus shifts the plate solution measurably but slightly
    ra_a, dec_a = wcs_a.xy_to_radec(3000.0, 3000.0)
    ra_b, dec_b = wcs_b.xy_to_radec(3000.0, 3000.0)
    sep = np.hypot((ra_a - ra_b) * np.cos(dec_a), dec_a - dec_b)
    assert sep > 0, "z offset had no effect on the WCS"
    assert sep < 1e-5                            # < 2 arcsec


def test_measured_fea_modes_roundtrip(tmp_path):
    """Measured-mode drop-in (the IMSIM_TPU_DATA_DIR pattern): write
    mode tables in the documented fea/ npz exchange format, and verify
    every fea: term reproduces the FILE's shapes — gravity sin/cos
    composition, LUT cancellation against the same measured table,
    temperature rows in M1M3_TEMP_KEYS order, bending modes under
    aos_dof, camera scalars — with the file's own Noll start index.
    Without the files the modeled basis remains the fallback (pinned
    by the tests above)."""
    import numpy as np

    from imsim_tpu.optics.fea import (M1M3_TEMP_KEYS, fea_instructions,
                                      load_measured_fea)

    rng = np.random.default_rng(7)
    nj = 12
    jmin = 4
    d = tmp_path / "fea"
    d.mkdir()
    m13 = dict(jmin=jmin,
               m1_gravity=rng.normal(size=(2, nj)) * 1e-7,
               m3_gravity=rng.normal(size=(2, nj)) * 1e-7,
               m1_temp=rng.normal(size=(5, nj)) * 1e-8,
               m3_temp=rng.normal(size=(5, nj)) * 1e-8,
               m1_bending=rng.normal(size=(20, nj)),
               m3_bending=rng.normal(size=(20, nj)))
    m2 = dict(jmin=jmin,
              m2_gravity=rng.normal(size=(2, nj)) * 1e-7,
              m2_temp=rng.normal(size=(2, nj)) * 1e-8,
              m2_bending=rng.normal(size=(20, nj)))
    np.savez(d / "m1m3_modes.npz", **m13)
    np.savez(d / "m2_modes.npz", **m2)
    np.savez(d / "camera.npz", gravity_lat_m=3e-6, gravity_ax_m=1e-6,
             temp_dz_m_per_C=2e-6)

    meas = load_measured_fea(str(tmp_path))
    assert meas is not None and meas["m1m3"] is not None

    z = np.radians(30.0)
    inst = fea_instructions({"m1m3_gravity": {"zenith": "30 deg"}},
                            measured=meas)
    want_m1 = np.sin(z) * m13["m1_gravity"][0] \
        + (np.cos(z) - 1.0) * m13["m1_gravity"][1]
    got = {s: (c, j) for _, s, c, j in inst}
    np.testing.assert_allclose(got["M1"][0], want_m1, rtol=1e-12)
    assert got["M1"][1] == jmin and got["M3"][1] == jmin

    # LUT cancels the measured gravity exactly at error=0
    both = fea_instructions({"m1m3_gravity": {"zenith": "30 deg"},
                             "m1m3_lut": {"zenith": "30 deg"}},
                            measured=meas)
    tot = sum(c for op, s, c, j in both if s == "M1")
    np.testing.assert_allclose(tot, 0.0, atol=1e-18)

    # temperature rows follow M1M3_TEMP_KEYS order
    args = {k: v for k, v in zip(M1M3_TEMP_KEYS, (0.5, 0, 0, 0, 0.2))}
    inst = fea_instructions({"m1m3_temperature": args}, measured=meas)
    want = 0.5 * m13["m3_temp"][0] + 0.2 * m13["m3_temp"][4]
    got = {s: c for _, s, c, _ in inst}
    np.testing.assert_allclose(got["M3"], want, rtol=1e-12)

    # aos_dof bending modes use the measured tables (um amplitudes)
    dof = np.zeros(50)
    dof[10] = 1.0     # first M1M3 bending mode, 1 um
    dof[30] = -2.0    # first M2 bending mode, -2 um
    inst = fea_instructions({"aos_dof": {"dof": list(dof)}},
                            measured=meas)
    zs = {s: c for op, s, c, *r in inst if op == "zern"}
    np.testing.assert_allclose(zs["M1"], m13["m1_bending"][0] * 1e-6,
                               rtol=1e-12)
    np.testing.assert_allclose(zs["M2"], -2.0 * m2["m2_bending"][0] * 1e-6,
                               rtol=1e-12)

    # camera scalars from the file
    inst = fea_instructions({"camera_gravity": {"zenith": "60 deg"},
                             "camera_temperature": {"camera_TBulk": 0.5}},
                            measured=meas)
    shifts = [v for op, s, v in inst if op == "shift"]
    assert abs(np.hypot(shifts[0][0], shifts[0][1])
               - 3e-6 * np.sin(np.radians(60))) < 1e-12
    assert abs(shifts[1][2] - 1e-6) < 1e-12

    # absent dir -> None (modeled fallback)
    assert load_measured_fea(str(tmp_path / "nope")) is None


def test_shipped_fea_tables_match_sensitivity_matrix():
    """The package-default mode tables are DERIVED from the reference's
    measured AOS sensitivity matrix (imsim/optical_system.py:223-224):
    pin each bending mode's total surface shape to the field-center
    wavefront response / 2 (tools/derive_fea_from_sensitivity.py)."""
    import os

    from imsim_tpu.optics.fea import load_measured_fea

    meas = load_measured_fea()          # default: shipped package tables
    assert meas is not None and meas["m1m3"] is not None, \
        "shipped fea/ tables missing"
    m13, m2 = meas["m1m3"], meas["m2"]
    assert int(m13["jmin"]) == 4
    assert m13["m1_bending"].shape == (20, 19)

    matrix = "/root/reference/data/optics_data/sensitivity_matrix.txt"
    if not os.path.isfile(matrix):
        pytest.skip("reference sensitivity matrix not available")
    from imsim_tpu.optics.aos import load_sensitivity_matrix

    senM = load_sensitivity_matrix(matrix)
    total = m13["m1_bending"] + m13["m3_bending"]      # monolith total
    np.testing.assert_allclose(total, senM[0, :, 10:30].T / 2.0 * 1e-6,
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(m2["m2_bending"],
                               senM[0, :, 30:50].T / 2.0 * 1e-6,
                               rtol=1e-12, atol=0)
    # 0.7/0.3 monolith split
    np.testing.assert_allclose(m13["m1_bending"], 0.7 * total, rtol=1e-12)
    # gravity rows are unit-RMS measured shapes at the documented scales
    g_tot = m13["m1_gravity"] + m13["m3_gravity"]
    np.testing.assert_allclose(np.sqrt((g_tot ** 2).sum(axis=1)),
                               0.4e-6, rtol=1e-9)
    np.testing.assert_allclose(
        np.sqrt((m2["m2_gravity"] ** 2).sum(axis=1)), 0.15e-6, rtol=1e-9)
