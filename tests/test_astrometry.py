"""Astrometry chain invariants (the erfa-replacement,
imsim/batoid_wcs.py:118-243 analog checks)."""
import numpy as np

from imsim_tpu.optics.astrometry import (Observation, apply_refraction,
                                         gmst, refraction_coefs,
                                         undo_refraction)

DEG = np.pi / 180


def test_refraction_roundtrip_and_magnitude():
    k1, k2 = refraction_coefs(622.0)
    # ~1 arcmin at z=45 deg for standard conditions at 2.6 km altitude
    alt = 45 * DEG
    refr = apply_refraction(alt, k1, k2) - alt
    assert 30 < refr / DEG * 3600 < 80
    # blue refracts more
    k1b, k2b = refraction_coefs(370.0)
    refr_b = apply_refraction(alt, k1b, k2b) - alt
    assert refr_b > refr
    # inverse
    alt_obs = apply_refraction(alt, k1, k2)
    back = undo_refraction(alt_obs, k1, k2)
    assert abs(back - alt) < 1e-9


def test_icrf_observed_roundtrip():
    obs = Observation(30 * DEG, -20 * DEG, mjd=60674.2)
    rng = np.random.default_rng(0)
    ra = 30 * DEG + rng.uniform(-0.02, 0.02, 50)
    dec = -20 * DEG + rng.uniform(-0.02, 0.02, 50)
    az, alt = obs.icrf_to_observed(ra, dec)
    ra2, dec2 = obs.observed_to_icrf(az, alt)
    # round trip limited by the first-order aberration inverse:
    # O(v^2/c^2) ~ 1e-8 rad (~2 mas) — far below the pixel scale
    sep = np.hypot((ra2 - ra) * np.cos(dec), dec2 - dec)
    assert sep.max() < 2e-8, sep.max()


def test_gmst_rate():
    """Sidereal day: GMST advances 360.9856 deg per solar day."""
    d = (gmst(60674.0 + 1.0) - gmst(60674.0)) % (2 * np.pi)
    assert abs(d / DEG - 0.9856) < 1e-3


def test_parallactic_angle_sign():
    """A target west of the meridian in the south: q > 0 (zenith is
    toward the east of north through the pole for southern observers...
    pinned empirically: q changes sign crossing the meridian)."""
    # choose mjd so the target transits: HA ~ 0 => q ~ 0 or pi
    obs1 = Observation(30 * DEG, -20 * DEG, mjd=60674.0)
    obs2 = Observation(30 * DEG, -20 * DEG, mjd=60674.0 + 2.0 / 24.0)
    q1 = obs1.parallactic_angle()
    q2 = obs2.parallactic_angle()
    assert q1 != q2           # rotates with hour angle
    assert np.isfinite(q1) and np.isfinite(q2)


def test_aberration_scale():
    """Annual aberration shifts positions by up to ~20.5 arcsec; the
    chain must include a shift of that order relative to a no-velocity
    observation."""
    obs = Observation(30 * DEG, -20 * DEG, mjd=60674.2)
    v = np.linalg.norm(obs.vel)
    assert 0.8e-4 < v < 1.1e-4      # ~v/c of Earth's orbit
