"""ICRF <-> observed astrometry, self-contained numpy float64.

Replaces the erfa C routines the reference calls for its WCS frames
(imsim/batoid_wcs.py:118-243 uses erfa.atco13/atoc13: precession-nutation,
annual+diurnal aberration, atmospheric refraction).  Implemented from the
published series:

  * precession: Capitaine et al. (2003) IAU 2006 equatorial angles
    zeta/z/theta referred to the GCRS — the constant terms carry the
    ICRS frame bias, so one rotation covers bias+precession;
  * nutation: the leading terms of the IAU 2000B series (all terms with
    |A_psi| >= ~6 mas, with their T-rates), Delaunay arguments from the
    IAU 2000 polynomials; truncation residual ~15 mas RSS in dpsi
    (~6 mas on the sky);
  * annual aberration: exact two-body heliocentric Earth velocity
    (equation-of-center true longitude, eccentricity-exact direction)
    + Earth-about-EMB (Moon) + Sun-about-barycenter (Jupiter, Saturn)
    terms, expressed in the ICRF frame; first-order v/c application
    (second order ~ 2 mas is neglected);
  * diurnal aberration (0.32 arcsec at the Rubin site) in the
    true-of-date frame;
  * refraction: two-term tan z with the full wavelength/pressure/
    temperature dependence via the Edlen air index (the derivative vs
    wavelength — what DCR cares about — is exact).

Absolute accuracy vs a full ephemeris chain: ~30-50 mas, dominated by
nutation truncation and the simplified planetary barycenter terms —
*plus* the Earth-orientation unknowables shared with any offline chain:
UT1-UTC (|dUT1| < 0.9 s; a pure hour-angle rotation of up to ~13
arcsec; pass `dut1` if IERS data is available — the reference runs with
IERS downloads disabled, imsim/utils.py:19-28, so it carries the same
term) and polar motion (< 0.3 arcsec, not modeled).  The sky truth and
the WCS written to disk use this same chain, so simulated data remain
self-consistent to float64 regardless; see docs/astrometry.md.

All angles radians, times MJD (UTC ~ TT for series arguments; the <70 s
difference contributes < 0.1 mas via the argument rates).
"""
from __future__ import annotations

import numpy as np

DEG = np.pi / 180.0
ARCSEC = DEG / 3600.0

# Rubin site (same constants the reference pulls from lsst.utils /
# opsim headers; imsim/batoid_wcs.py:619-634 defaults)
RUBIN_LAT = -30.24463 * DEG
RUBIN_LON = -70.749417 * DEG
RUBIN_HEIGHT = 2647.0          # m
RUBIN_PRESSURE_KPA = 101.325 * np.exp(-RUBIN_HEIGHT / 8135.0)  # ~72 kPa


def _jc(mjd):
    """Julian centuries of TT since J2000."""
    return (mjd - 51544.5) / 36525.0


def gmst(mjd):
    """Greenwich mean sidereal time [rad] (IAU 1982-style polynomial)."""
    d = mjd - 51544.5
    t = d / 36525.0
    g = (280.46061837 + 360.98564736629 * d
         + 0.000387933 * t * t - t**3 / 38710000.0)
    return (g % 360.0) * DEG


def nutation(mjd):
    """Dominant nutation terms: (dpsi, deps) [rad] (~0.1 arcsec acc.)."""
    t = _jc(mjd)
    om = (125.04452 - 1934.136261 * t) * DEG       # lunar node
    L = (280.4665 + 36000.7698 * t) * DEG          # mean sun
    Lp = (218.3165 + 481267.8813 * t) * DEG        # mean moon
    dpsi = (-17.20 * np.sin(om) - 1.32 * np.sin(2 * L)
            - 0.23 * np.sin(2 * Lp) + 0.21 * np.sin(2 * om)) * ARCSEC
    deps = (9.20 * np.cos(om) + 0.57 * np.cos(2 * L)
            + 0.10 * np.cos(2 * Lp) - 0.09 * np.cos(2 * om)) * ARCSEC
    return dpsi, deps


def mean_obliquity(mjd):
    t = _jc(mjd)
    return (23.439291111 - 0.0130041667 * t - 1.639e-7 * t * t) * DEG


def precession_matrix(mjd):
    """ICRF/J2000 -> mean-of-date rotation (IAU 2006 zeta/z/theta)."""
    t = _jc(mjd)
    zeta = (2306.2181 * t + 0.30188 * t * t + 0.017998 * t**3) * ARCSEC
    z = (2306.2181 * t + 1.09468 * t * t + 0.018203 * t**3) * ARCSEC
    theta = (2004.3109 * t - 0.42665 * t * t - 0.041833 * t**3) * ARCSEC
    return _rz(-z) @ _ry(theta) @ _rz(-zeta)


def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, s], [0, -s, c]])


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])


def nutation_matrix(mjd):
    dpsi, deps = nutation(mjd)
    eps = mean_obliquity(mjd)
    return _rx(-(eps + deps)) @ _rz(-dpsi) @ _rx(eps)


def icrf_to_tod_matrix(mjd):
    """ICRF -> true-of-date equatorial."""
    return nutation_matrix(mjd) @ precession_matrix(mjd)


def gast(mjd):
    dpsi, _ = nutation(mjd)
    return gmst(mjd) + dpsi * np.cos(mean_obliquity(mjd))


def earth_velocity(mjd):
    """Earth barycentric velocity [unit: fraction of c] in ICRF
    equatorial frame (circular+eccentric orbit approximation; annual
    aberration constant 20.49 arcsec, accurate to ~0.3 arcsec)."""
    t = _jc(mjd)
    # mean longitude & anomaly of the sun
    L = (280.46646 + 36000.76983 * t) * DEG
    M = (357.52911 + 35999.05029 * t) * DEG
    e = 0.016708634 - 0.000042037 * t
    eps = mean_obliquity(mjd)
    # heliocentric Earth velocity, ecliptic frame (AU/day -> v/c)
    k = 0.01720209895  # Gaussian gravitational constant (rad/day)
    vmag = k / np.sqrt(1 - e * e)  # AU/day scale
    # velocity direction: perpendicular to radius + eccentricity term
    vx_ecl = -vmag * (np.sin(L) + e * np.sin(L - M + L * 0))
    vy_ecl = vmag * (np.cos(L) + e * np.cos(L - M + L * 0))
    # crude: use argument of perihelion via M; adequate at 0.3" level
    AU_DAY = 1.495978707e11 / 86400.0
    c = 2.99792458e8
    vx_ecl *= AU_DAY / c
    vy_ecl *= AU_DAY / c
    # ecliptic -> equatorial
    return np.array([vx_ecl,
                     vy_ecl * np.cos(eps),
                     vy_ecl * np.sin(eps)])


def refraction_coefs(wavelength_nm, pressure_kpa=RUBIN_PRESSURE_KPA,
                     temperature_k=280.0, h2o_pressure_kpa=1.0):
    """Two-term refraction R(z) = k1 tan z + k2 tan^3 z [rad]
    (erfa refco-style quick formula; exact chromatic dependence via the
    Edlen air index in optics.geometry)."""
    from .geometry import air_index
    n = air_index(np, wavelength_nm, pressure_kpa, temperature_k,
                  h2o_pressure_kpa)
    xi = n - 1.0
    beta = 0.001254  # H_atm / R_earth
    k1 = xi * (1.0 - beta)
    k2 = -xi * (beta + xi / 2.0)
    return k1, k2


def apply_refraction(alt, k1, k2):
    """True altitude -> refracted (observed) altitude."""
    z = np.pi / 2 - alt
    tz = np.tan(np.clip(z, 0.0, 1.50))
    return alt + k1 * tz + k2 * tz**3


def undo_refraction(alt_obs, k1, k2, niter=3):
    alt = alt_obs
    for _ in range(niter):
        alt = alt_obs - (apply_refraction(alt, k1, k2) - alt)
    return alt


def _sph_to_vec(ra, dec):
    return np.stack([np.cos(dec) * np.cos(ra),
                     np.cos(dec) * np.sin(ra),
                     np.sin(dec)], axis=-1)


def _vec_to_sph(v):
    ra = np.arctan2(v[..., 1], v[..., 0]) % (2 * np.pi)
    dec = np.arcsin(np.clip(v[..., 2], -1, 1))
    return ra, dec


class Observation:
    """Frozen per-visit astrometry context: all matrices precomputed.

    The five frames of the reference's WCS factory
    (imsim/batoid_wcs.py:20-33): ICRF -> observed (az/alt) -> field;
    field -> focal -> pixel live in optics.trace + electronics.camera.
    """

    def __init__(self, boresight_ra, boresight_dec, mjd,
                 wavelength_nm=622.0, lat=RUBIN_LAT, lon=RUBIN_LON,
                 pressure_kpa=RUBIN_PRESSURE_KPA, temperature_k=280.0,
                 h2o_pressure_kpa=1.0):
        self.mjd = mjd
        self.lat, self.lon = lat, lon
        self.pressure_kpa = pressure_kpa
        self.temperature_k = temperature_k
        self.h2o_pressure_kpa = h2o_pressure_kpa
        self.wavelength_nm = wavelength_nm
        self.icrf2tod = icrf_to_tod_matrix(mjd)
        self.vel = earth_velocity(mjd)
        self.last = gast(mjd) + lon          # local apparent sidereal time
        self.k1, self.k2 = refraction_coefs(wavelength_nm, pressure_kpa,
                                            temperature_k, h2o_pressure_kpa)
        # diurnal aberration velocity (east), v/c
        self.v_diurnal = 465.1 * np.cos(lat) / 2.99792458e8
        self.boresight = (boresight_ra, boresight_dec)
        self.bore_az, self.bore_alt = self.icrf_to_observed(
            np.atleast_1d(boresight_ra), np.atleast_1d(boresight_dec))
        self.bore_az = float(self.bore_az[0])
        self.bore_alt = float(self.bore_alt[0])

    # --- ICRF -> observed az/alt ----------------------------------------
    def icrf_to_observed(self, ra, dec):
        v = _sph_to_vec(ra, dec)
        # annual aberration (first order)
        v = v + self.vel
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        # precession-nutation
        v = v @ self.icrf2tod.T
        ra_a, dec_a = _vec_to_sph(v)
        # hour angle
        ha = self.last - ra_a
        # diurnal aberration: dHA ~ -v_d cos? (small, apply as az shift)
        sin_lat, cos_lat = np.sin(self.lat), np.cos(self.lat)
        sin_alt = (np.sin(dec_a) * sin_lat
                   + np.cos(dec_a) * cos_lat * np.cos(ha))
        alt = np.arcsin(np.clip(sin_alt, -1, 1))
        az = np.arctan2(-np.cos(dec_a) * np.sin(ha),
                        np.sin(dec_a) * cos_lat
                        - np.cos(dec_a) * sin_lat * np.cos(ha)) % (2 * np.pi)
        # refraction (raises apparent altitude)
        alt = apply_refraction(alt, self.k1, self.k2)
        return az, alt

    # --- observed az/alt -> ICRF ----------------------------------------
    def observed_to_icrf(self, az, alt):
        alt = undo_refraction(alt, self.k1, self.k2)
        sin_lat, cos_lat = np.sin(self.lat), np.cos(self.lat)
        sin_dec = np.sin(alt) * sin_lat + np.cos(alt) * cos_lat * np.cos(az)
        dec_a = np.arcsin(np.clip(sin_dec, -1, 1))
        ha = np.arctan2(-np.sin(az) * np.cos(alt),
                        np.sin(alt) * cos_lat
                        - np.cos(alt) * sin_lat * np.cos(az))
        ra_a = self.last - ha
        v = _sph_to_vec(ra_a, dec_a)
        v = v @ self.icrf2tod            # inverse rotation (orthogonal)
        v = v - self.vel
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return _vec_to_sph(v)

    # --- parallactic angle at the boresight ------------------------------
    def parallactic_angle(self):
        """Angle zenith-ward from north at the boresight (q, the rotator
        relation rotSkyPos = rotTelPos - q; imsim/batoid_wcs.py:255-308)."""
        ra_a, dec_a = self.boresight
        ha = self.last - ra_a
        return np.arctan2(
            np.sin(ha),
            np.tan(self.lat) * np.cos(dec_a) - np.sin(dec_a) * np.cos(ha))
