"""Photon-shooting profile sampler tests with analytic oracles
(the reference's pure-unit physics test style, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from imsim_tpu.photons import profiles as P
from imsim_tpu.utils.rng import stream

N = 200_000


def _r(dx, dy):
    return np.hypot(np.asarray(dx), np.asarray(dy))


def test_gaussian_sampler():
    dx, dy = P.sample_gaussian(stream(1, "g"), N, 2.0)
    r = _r(dx, dy)
    # median radius of 2D gaussian = sigma * sqrt(2 ln 2)
    assert np.median(r) == pytest.approx(2.0 * 1.17741, rel=0.01)


def test_radial_cdf_gaussian_identity():
    tab = P.radial_cdf_from_mtf(lambda k: np.exp(-0.5 * k**2),
                                r_max=6.0, k_max=40.0)
    dx, dy = P.sample_radial(stream(2, "gi"), N, tab)
    assert np.median(_r(dx, dy)) == pytest.approx(1.17741, rel=0.01)


def test_kolmogorov_hlr():
    # GalSim: HLR = 0.554 lam/r0 = 0.5677 FWHM
    tab = P.kolmogorov_cdf()
    dx, dy = P.sample_radial(stream(3, "k"), N, tab)
    assert np.median(_r(dx, dy)) == pytest.approx(0.5677, rel=0.02)


def test_vonkarman_structure_function_kolmogorov_limit():
    r0 = 0.15
    for rho in (0.01, 0.1):
        D = P.vonkarman_structure(rho, r0, 1e6)[0]
        assert D == pytest.approx(6.88 * (rho / r0) ** (5 / 3), rel=0.01)


def test_vonkarman_narrower_than_kolmogorov():
    tv = P.vonkarman_cdf(622.0, 0.15, 25.0)
    dx, dy = P.sample_radial(stream(4, "v"), N, tv)
    r50 = np.median(_r(dx, dy))
    kolm_r50 = 0.5677 * 0.9758834 * 622e-9 / 0.15 / 4.84813681e-6
    assert r50 < kolm_r50
    assert r50 > 0.5 * kolm_r50


def test_sersic_hlr_exponential_and_devauc():
    for n_s, hlr in [(1.0, 2.0), (4.0, 1.5)]:
        dx, dy = P.sample_sersic(stream(5, f"s{n_s}"), N,
                                 jnp.full((N,), n_s), jnp.full((N,), hlr))
        assert np.median(_r(dx, dy)) == pytest.approx(hlr, rel=0.02)


def test_ellipse_preserves_area_and_rotates():
    dx, dy = P.sample_gaussian(stream(6, "e"), N, 1.0)
    ex, ey = P.apply_ellipse(jnp.asarray(dx), jnp.asarray(dy), q=0.25,
                             beta=0.0)
    # major axis along x: std_x/std_y = 1/q
    sx, sy = np.std(np.asarray(ex)), np.std(np.asarray(ey))
    assert sx / sy == pytest.approx(4.0, rel=0.05)
    assert sx * sy == pytest.approx(1.0, rel=0.05)  # area preserved


def test_shear_mag_flux_area_scaling():
    dx, dy = P.sample_gaussian(stream(7, "m"), N, 1.0)
    mx, my = P.apply_shear_mag(jnp.asarray(dx), jnp.asarray(dy),
                               g1=0.0, g2=0.0, mu=4.0)
    assert np.std(np.asarray(mx)) == pytest.approx(2.0, rel=0.02)


def test_double_gaussian_mixture():
    dx, dy = P.sample_double_gaussian(stream(8, "dg"), N, 1.0, 3.0, 0.8)
    r = _r(dx, dy)
    s1 = 1.0 / 2.3548
    # inner fraction: photons inside ~2.5 sigma1 dominated by comp 1
    frac = np.mean(r < 2.5 * s1)
    assert 0.6 < frac < 0.9
