"""SED pipeline tests: CCM89 extinction values, internal (rest-frame)
dust applied pre-redshift, Milky Way dust post-redshift.

The reference parses int_av/int_rv but leaves application as a TODO
(imsim/instcat.py:404); this build applies it in the rest frame, so
these tests pin both the curve and the order of operations.
"""
import numpy as np
import pytest

from imsim_tpu.catalog.sed import SED, build_object_sed, ccm89_extinction


@pytest.fixture()
def flat_sed_dir(tmp_path):
    # flat f_lambda SED over 90-2000 nm (normalizable at 500 nm)
    w = np.linspace(90.0, 2000.0, 1912)
    f = np.ones_like(w)
    p = tmp_path / "flat.sed"
    np.savetxt(p, np.column_stack([w, f]))
    return str(tmp_path)


def test_ccm89_known_values():
    # CCM89/O'Donnell A_lambda/A_V for Rv=3.1: ~1 at V (551 nm),
    # ~1.32 at B (440 nm), < 0.3 in K-ish NIR
    def alam_over_av(w):
        return -2.5 * np.log10(ccm89_extinction(np.array([w]), 1.0, 3.1))[0]

    assert abs(alam_over_av(551.0) - 1.0) < 0.02
    assert abs(alam_over_av(440.0) - 1.32) < 0.05
    assert alam_over_av(2200.0) < 0.15
    # more dust -> more extinction, multiplicative in magnitudes
    e1 = ccm89_extinction(np.array([440.0]), 1.0)
    e2 = ccm89_extinction(np.array([440.0]), 2.0)
    assert abs(e2[0] - e1[0] ** 2) < 1e-10


def test_internal_dust_applied_rest_frame(flat_sed_dir):
    z = 0.5
    plain = build_object_sed("flat.sed", z, 0.0, 3.1, (flat_sed_dir,))
    dusty = build_object_sed("flat.sed", z, 0.0, 3.1, (flat_sed_dir,),
                             int_av=1.0, int_rv=3.1)
    # attenuation at observer wavelength w must equal the CCM factor at
    # the REST wavelength w/(1+z)
    w_obs = np.array([650.0, 800.0, 1000.0])
    ratio = dusty.resample(w_obs) / plain.resample(w_obs)
    expect = ccm89_extinction(w_obs / (1 + z), 1.0, 3.1)
    np.testing.assert_allclose(ratio, expect, rtol=1e-4)
    # and NOT the observer-frame factor (order of operations matters)
    wrong = ccm89_extinction(w_obs, 1.0, 3.1)
    assert np.all(np.abs(ratio - wrong) > 0.01)


def test_mw_dust_applied_observer_frame(flat_sed_dir):
    z = 0.5
    plain = build_object_sed("flat.sed", z, 0.0, 3.1, (flat_sed_dir,))
    mw = build_object_sed("flat.sed", z, 0.7, 3.1, (flat_sed_dir,))
    w_obs = np.array([500.0, 700.0, 900.0])
    ratio = mw.resample(w_obs) / plain.resample(w_obs)
    expect = ccm89_extinction(w_obs, 0.7, 3.1)
    np.testing.assert_allclose(ratio, expect, rtol=1e-4)


def test_dusty_galaxy_photon_spectrum_shifts_red(flat_sed_dir):
    """Internal dust removes blue photons: the wavelength-CDF mean of a
    dusty galaxy must be redder than the dust-free one."""
    from imsim_tpu.catalog.bandpass import rubin_bandpass
    from imsim_tpu.image.scene import _wavelength_icdf

    bp = rubin_bandpass("g")
    z = 0.3
    plain = build_object_sed("flat.sed", z, 0.0, 3.1, (flat_sed_dir,))
    dusty = build_object_sed("flat.sed", z, 0.0, 3.1, (flat_sed_dir,),
                             int_av=2.0)
    icdf_p = _wavelength_icdf(plain, bp)
    icdf_d = _wavelength_icdf(dusty, bp)
    assert icdf_d.mean() > icdf_p.mean() + 0.5


def test_build_scene_consumes_int_av(flat_sed_dir):
    """int_av in the ObjectTable must change the realized photon budget
    (flux drops) — the column is consumed, not just parsed."""
    from imsim_tpu.catalog.bandpass import rubin_bandpass
    from imsim_tpu.catalog.instcat import ObjectTable
    from imsim_tpu.image.scene import build_scene

    n = 2
    kw = dict(
        ra=np.zeros(n), dec=np.zeros(n), x=np.full(n, 100.0),
        y=np.full(n, 100.0), magnorm=np.full(n, 22.0),
        sed_name=["flat.sed"] * n, redshift=np.zeros(n),
        obj_type=np.zeros(n, int), p0=np.zeros(n), p1=np.ones(n),
        p2=np.ones(n), p3=np.zeros(n), g1=np.zeros(n), g2=np.zeros(n),
        mu=np.ones(n), mw_av=np.zeros(n), mw_rv=np.full(n, 3.1),
        int_av=np.array([0.0, 2.0]), int_rv=np.full(n, 3.1),
    )
    table = ObjectTable(**{k: v for k, v in kw.items()
                           if k in ObjectTable.__dataclass_fields__})
    bp = rubin_bandpass("r")
    host = build_scene(table, bp, [flat_sed_dir])
    assert host.nominal_flux[1] < 0.5 * host.nominal_flux[0]


def test_wl_cheb_fit_accuracy(flat_sed_dir):
    """The per-object Chebyshev inverse-CDF rows (the pooled path's
    gather-free wavelength sampler) must reproduce the piecewise-linear
    ICDF table to ~1 nm for realistic SED x bandpass shapes."""
    from imsim_tpu.catalog.bandpass import rubin_bandpass
    from imsim_tpu.image.scene import WL_CDF_K, _wavelength_icdf, fit_wl_cheb
    from imsim_tpu.catalog.sed import SED

    bp = rubin_bandpass("r")
    w = np.linspace(300, 1150, 600)
    rng = np.random.default_rng(0)
    rows = []
    # flat, blue power-law, red power-law, redshifted bumpy galaxy
    for fl in [np.ones_like(w), (w / 500.0) ** -2.0, (w / 500.0) ** 1.5,
               1.0 + 0.5 * np.sin(w / 40.0) * rng.uniform(0.5, 1.0)]:
        sed = SED(w.copy(), np.clip(fl, 1e-3, None))
        rows.append(_wavelength_icdf(sed, bp))
    table = np.stack(rows)                       # (4, K)
    coefs = fit_wl_cheb(table.astype(np.float64))
    u = np.linspace(0, 1, WL_CDF_K)
    x = np.arcsin(np.clip(2 * u - 1, -1, 1)) * (2 / np.pi)
    T = np.polynomial.chebyshev.chebvander(x, coefs.shape[1] - 1)
    recon = coefs @ T.T                          # (4, K)
    err = np.abs(recon - table)
    assert err.max() < 0.2, err.max()            # nm
    assert err.mean() < 0.02
