"""Parametric AOS optics model tests (imsim/optical_system.py analog:
tests/test_optical_zernikes.py)."""
import numpy as np

from imsim_tpu.optics.aos import (OpticalZernikes, hexapolar_field_points,
                                  mock_deviations, synth_sensitivity_matrix)


def test_sensitivity_structure():
    M = synth_sensitivity_matrix()
    assert M.shape == (35, 19, 50)
    # deterministic
    np.testing.assert_array_equal(M, synth_sensitivity_matrix())
    # every DOF couples to at least one Zernike somewhere in the field
    assert np.all(np.abs(M).max(axis=(0, 1)) > 0)


def test_mock_deviations_seeded():
    d1 = mock_deviations(7)
    d2 = mock_deviations(7)
    d3 = mock_deviations(8)
    np.testing.assert_array_equal(d1, d2)
    assert not np.array_equal(d1, d3)
    assert d1.shape == (50,)


def test_optical_zernikes_field_interp():
    oz = OpticalZernikes(seed=3)
    pts = hexapolar_field_points()
    # at a sample point the interpolation ~ reproduces the sample
    c_center = oz.coefficients(0.0, 0.0)
    assert c_center.shape == (19,)
    # wavefront amplitudes in a plausible range (tens of nm rms)
    rms = np.sqrt(np.mean(oz.field_coefs ** 2))
    assert 1.0 < rms < 500.0, rms
    # smooth field variation: nearby points give nearby coefficients
    c1 = oz.coefficients(0.5, 0.0)
    c2 = oz.coefficients(0.52, 0.0)
    assert np.linalg.norm(c1 - c2) < 0.3 * (np.linalg.norm(c1) + 1e-9)


def test_aos_perturbs_telescope_psf():
    """Applying the AOS wavefront to the telescope changes the OPD by
    the injected amount."""
    from imsim_tpu.optics.loader import load_telescope
    from imsim_tpu.optics.opd import annular_zernikes

    base = load_telescope(band="r")
    zk0 = annular_zernikes(base.fiducial, 0.0, 0.0, jmax=15, nx=65)

    pert = load_telescope(band="r")
    oz = OpticalZernikes(seed=11)
    oz.apply_to(pert)
    zk1 = annular_zernikes(pert.fiducial, 0.0, 0.0, jmax=15, nx=65)
    dz = zk1 - zk0
    # injected mirror-figure error is half the wavefront; double pass
    # returns approximately the wavefront coefficients
    inj = oz.coefficients(0.0, 0.0)
    # compare the dominant injected mode
    j_star = int(np.argmax(np.abs(inj[:11 - 3]))) + 4
    assert abs(dz[j_star - 1]) > 0.3 * abs(inj[j_star - 4]), \
        (j_star, dz[j_star - 1], inj[j_star - 4])
