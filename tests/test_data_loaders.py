"""Measured-data drop-in loader tests: the reference's actual file
formats for tree rings (imsim/treerings.py:100-195), cosmic-ray span
catalogs (imsim/cosmic_rays.py:112-185), camera electronics JSON
(imsim/camera.py:120-201), rubin_sim throughput files + per-detector
ECSV QE (imsim/bandpass.py:60-185), and FITS binary tables.
"""
import json
import os

import numpy as np
import pytest

from imsim_tpu.io.fits import (HDU, BinTableHDU, read_bintable,
                               read_fits, write_fits)


def test_bintable_roundtrip(tmp_path):
    path = str(tmp_path / "t.fits")
    cols = dict(
        fp_id=np.arange(5, dtype=np.int32),
        x0=np.array([1, 2, 3, 4, 5], np.int16),
        val=np.linspace(0, 1, 5).astype(np.float64),
        spans=[np.arange(k + 1, dtype=np.int32) * 10 for k in range(5)],
    )
    write_fits(path, [BinTableHDU(cols, name="TEST",
                                  header={"EXPTIME": 99.5})])
    hdus = read_fits(path)
    hdr, payload = hdus[-1]
    assert hdr["EXTNAME"] == "TEST"
    assert hdr["EXPTIME"] == 99.5
    tab = read_bintable(hdr, payload)
    np.testing.assert_array_equal(tab["fp_id"], cols["fp_id"])
    np.testing.assert_array_equal(tab["x0"], cols["x0"])
    np.testing.assert_allclose(tab["val"], cols["val"])
    for got, want in zip(tab["spans"], cols["spans"]):
        np.testing.assert_array_equal(got, want)


def test_cosmic_ray_fits_catalog_roundtrip(tmp_path):
    from imsim_tpu.image.cosmic_rays import (CosmicRayCatalog,
                                             paint_cosmic_rays)

    cat = CosmicRayCatalog.synthesize(n=20, seed=3)
    path = str(tmp_path / "crs.fits")
    cat.write_catalog_fits(path, exptime=100.0)
    cat2, rate = CosmicRayCatalog.read_catalog_fits(path)
    assert len(cat2) == 20
    assert abs(rate - 20 / 100.0) < 1e-9
    # total charge preserved (pixels quantized to spans, values int32)
    q1 = sum(f[2].sum() for f in cat.footprints)
    q2 = sum(f[2].sum() for f in cat2.footprints)
    assert abs(q1 - q2) < 0.001 * q1 + 20
    # painting from the loaded catalog works
    img = np.zeros((256, 256))
    out = paint_cosmic_rays(img, 30.0, seed=1, ccd_rate=5.0,
                            catalog=cat2)
    assert out.sum() > 0


def test_tree_ring_parameters_file(tmp_path):
    from imsim_tpu.sensor.treerings import TreeRings

    rng = np.random.default_rng(0)
    nfreq = 20
    path = tmp_path / "tree_ring_parameters.txt"
    with open(path, "w") as f:
        for det in (("2", "2", "1", "1"), ("0", "1", "0", "0")):
            f.write("Rx Ry Sx Sy data\n")
            f.write("%s %s %s %s -300.0 4600.0 0.8 1.2e-15\n" % det)
            f.write("cfreq cphase sfreq sphase\n")
            for _ in range(nfreq):
                f.write("%.3f %.3f %.3f %.3f\n" % (
                    rng.uniform(100, 200), rng.uniform(0, 6.28),
                    rng.uniform(100, 200), rng.uniform(0, 6.28)))
    tr = TreeRings(file_name=str(path))
    m = tr.get("R22_S11")
    assert m.center == (-300.0 + 2048.5, 4600.0 + 2048.5)
    # analytic wave table matches the dense profile at sample radii
    r = np.array([1000.0, 3000.0, 5000.0])
    a, b, norm = m.env
    wave = sum(amp * np.sin(w * r + p) for w, p, amp in m.waves)
    dr = norm * (a + b * r**4) * wave
    np.testing.assert_allclose(m.radial_displacement(r), dr, atol=2e-3)
    # silicon params consume the measured model
    from imsim_tpu.sensor.silicon import SiliconParams

    sp = SiliconParams.make(treering_model=m)
    assert sp.tr_waves.shape == (2 * nfreq, 3)
    with pytest.raises(KeyError):
        tr.get("R99_S99")


def test_camera_overrides_json(tmp_path):
    from imsim_tpu.electronics.camera import Camera

    ov = {"R22_S11": {"gains": {"C00": 2.5}, "read_noise": {"C01": 9.0},
                      "full_well": 123456.0,
                      "xtalk": np.full((16, 16), 1e-5).tolist()}}
    path = tmp_path / "ov.json"
    path.write_text(json.dumps(ov))
    cam = Camera("LsstCamSim", overrides_file=str(path))
    ccd = cam["R22_S11"]
    assert ccd["C00"].gain == 2.5
    assert ccd["C01"].read_noise == 9.0
    assert ccd.full_well == 123456.0
    assert abs(ccd.xtalk[0, 1] - 1e-5) < 1e-12
    # other detectors untouched (synthesized)
    assert cam["R22_S12"]["C00"].gain != 2.5


@pytest.fixture()
def throughputs_dir(tmp_path):
    base = tmp_path / "throughputs" / "baseline"
    os.makedirs(base)
    w = np.linspace(300, 1100, 801)
    filt = np.where((w > 550) & (w < 690), 0.95, 0.0)
    np.savetxt(base / "filter_r.dat", np.column_stack([w, filt]))
    for part in ("m1", "m2", "m3", "lens1", "lens2", "lens3"):
        np.savetxt(base / f"{part}.dat",
                   np.column_stack([w, np.full_like(w, 0.98)]))
    np.savetxt(base / "hardware_r.dat",
               np.column_stack([w, filt * 0.98**6 * 0.9]))
    np.savetxt(base / "total_r.dat",
               np.column_stack([w, filt * 0.98**6 * 0.9 * 0.8]))
    atm = tmp_path / "throughputs" / "atmos"
    os.makedirs(atm)
    for X in (10, 12, 15, 20):
        t = np.exp(-0.1 * X / 10.0) * np.ones_like(w)
        np.savetxt(atm / f"atmos_{X}_aerosol.dat",
                   np.column_stack([w, t]))
    # per-detector QE ecsv
    det = tmp_path / "throughputs" / "lsstCam" / "transmission_sensor" \
        / "r22_s11"
    os.makedirs(det)
    with open(det / "qe.ecsv", "w") as f:
        f.write("# %ECSV 1.0\n# ---\n# delimiter: ','\n")
        f.write("amp_name,wavelength,efficiency\n")
        for amp, qe in (("C00", 80.0), ("C01", 90.0)):
            for wv in (300.0, 700.0, 1100.0):
                f.write(f"{amp},{wv},{qe}\n")
    return str(tmp_path / "throughputs")


def test_rubin_bandpass_from_files(throughputs_dir):
    from imsim_tpu.catalog.bandpass import rubin_bandpass_from_files

    bp_tot = rubin_bandpass_from_files("r", throughputs_dir)
    assert 550 < bp_tot.effective_wavelength < 690
    bp_atm = rubin_bandpass_from_files("r", throughputs_dir, airmass=1.3)
    assert bp_atm.zeropoint > 0
    # airmass extinction reduces throughput vs X=1.0
    bp_lo = rubin_bandpass_from_files("r", throughputs_dir, airmass=1.0)
    assert bp_atm.throughput.max() < bp_lo.throughput.max()
    # per-detector QE path: mean amp QE = 85%
    bp_det = rubin_bandpass_from_files("r", throughputs_dir, airmass=1.0,
                                       camera="LsstCamSim",
                                       det_name="R22_S11")
    mid = np.argmin(np.abs(bp_det.wave - 620))
    mid_lo = np.argmin(np.abs(bp_lo.wave - 620))
    ratio = bp_det.throughput[mid] / bp_lo.throughput[mid_lo]
    assert abs(ratio - 0.85 / 0.9) < 0.02


def test_optics_data_loaders(tmp_path):
    """Measured AOS optics_data files (imsim/optical_system.py:221-224):
    sensitivity matrix with '#' structure comments, closed-loop results
    table, transposed Zemax nominal coefficients."""
    from imsim_tpu.optics.aos import (N_DOF, N_FIELD, N_ZK,
                                      OpticalZernikes,
                                      load_aos_deviation_scales,
                                      load_nominal_coeff,
                                      load_sensitivity_matrix)

    rng = np.random.default_rng(7)
    M = rng.normal(0, 1e-2, (N_FIELD, N_ZK, N_DOF))
    sm = tmp_path / "sensitivity_matrix.txt"
    with open(sm, "w") as f:
        f.write(f"# senM size: {N_FIELD} x {N_ZK} x {N_DOF}\n")
        for i in range(N_FIELD):
            f.write(f"# field No. {i + 1} --------\n")
            for j in range(N_ZK):
                f.write(f"# field No. {i + 1}, Z{j + 4} ---\n")
                f.write(" ".join(f"{v:.6e}" for v in M[i, j]) + "\n")
    got = load_sensitivity_matrix(str(sm))
    np.testing.assert_allclose(got, M, rtol=1e-5)

    res = rng.normal(0, [1.0] * 25 + [5.0] * 25, (7, N_DOF)).T
    ar = tmp_path / "aos_sim_results.txt"
    with open(ar, "w") as f:
        f.write(" ".join(f"iter{k + 1}" for k in range(7)) + "\n")
        for row in res:
            f.write(" ".join(str(v) for v in row) + "\n")
    scales = load_aos_deviation_scales(str(ar))
    np.testing.assert_allclose(scales, np.std(res, axis=1))
    assert scales[30:].mean() > scales[:20].mean()

    nom = rng.normal(0, 5.0, (N_FIELD, N_ZK))
    nc = tmp_path / "annular_nominal_coeff.txt"
    np.savetxt(nc, nom.T)
    np.testing.assert_allclose(load_nominal_coeff(str(nc)), nom,
                               rtol=1e-6)

    oz = OpticalZernikes(seed=3, data_dir=str(tmp_path))
    # deviations drawn at the per-DOF measured scales; nominal added
    expect = oz.sensitivity @ oz.deviations + nom
    np.testing.assert_allclose(oz.field_coefs, expect, rtol=1e-6)
    c = oz.coefficients(0.5, -0.3)
    assert c.shape == (N_ZK,)


import os as _os


@pytest.mark.skipif(
    not _os.path.isdir("/root/reference/data/optics_data"),
    reason="reference optics_data not present")
def test_optics_data_reference_files():
    from imsim_tpu.optics.aos import (OpticalZernikes,
                                      load_sensitivity_matrix)

    d = "/root/reference/data/optics_data"
    M = load_sensitivity_matrix(_os.path.join(d,
                                              "sensitivity_matrix.txt"))
    assert M.shape == (35, 19, 50)
    oz = OpticalZernikes(seed=1, data_dir=d)
    c = oz.coefficients(0.0, 0.0)
    # wavefront residuals should be sub-micron-scale, nonzero
    assert 0 < np.abs(c).max() < 5000.0
