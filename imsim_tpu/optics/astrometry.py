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
# opsim headers; imsim/batoid_wcs.py:619-634 defaults).  The pressure
# default must match the reference's barometric polynomial at its
# h=2715 m Cerro Pachon figure (imsim/batoid_wcs.py:625-630) — a 0.7%
# pressure difference shifts every refracted position ~150 mas
# zenith-ward at zd~30 deg.
RUBIN_LAT = -30.24463 * DEG
RUBIN_LON = -70.749417 * DEG
RUBIN_HEIGHT = 2715.0          # m
RUBIN_PRESSURE_KPA = 101.325 * (1 - 2.25577e-5 * RUBIN_HEIGHT) ** 5.25588


def load_iers_finals(path):
    """(mjd, xp_arcsec, yp_arcsec, dut1_s) arrays from an IERS
    finals2000A.all file (the fixed-column standard; the reference
    ships a 2019 snapshot, data/19-10-30-finals2000A.all).  Rows with
    no measured/predicted values (far-future padding) are dropped."""
    mjds, xps, yps, duts = [], [], [], []
    with open(path) as f:
        for ln in f:
            try:
                mjd = float(ln[7:15])
                xp = float(ln[18:27])
                yp = float(ln[37:46])
                du = float(ln[58:68])
            except (ValueError, IndexError):
                continue
            mjds.append(mjd)
            xps.append(xp)
            yps.append(yp)
            duts.append(du)
    if not mjds:
        raise ValueError(f"no usable EOP rows in {path}")
    return (np.asarray(mjds), np.asarray(xps), np.asarray(yps),
            np.asarray(duts))


_EOP_CACHE: dict = {}


def eop_for_mjd(eop, mjd_utc):
    """(xp_arcsec, yp_arcsec, dut1_s) at mjd_utc.  `eop` is a finals
    file path or a preloaded (mjd, xp, yp, dut1) tuple.  Linear
    interpolation; epochs outside the table clamp to the nearest end
    (the honest choice without a prediction model — polar motion
    wanders +-0.3 arcsec, so an out-of-range epoch keeps only the
    order of magnitude)."""
    if isinstance(eop, (str, bytes)):
        tab = _EOP_CACHE.get(eop)
        if tab is None:
            tab = _EOP_CACHE[eop] = load_iers_finals(eop)
    else:
        tab = eop
    mjds, xp, yp, du = tab
    return (float(np.interp(mjd_utc, mjds, xp)),
            float(np.interp(mjd_utc, mjds, yp)),
            float(np.interp(mjd_utc, mjds, du)))


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


def delaunay_args(mjd):
    """Fundamental lunisolar (Delaunay) arguments l, l', F, D, Om [rad]
    (IAU 2000 polynomials, linear + quadratic terms)."""
    t = _jc(mjd)
    l = (134.96340251 + (1717915923.2178 * t + 31.8792 * t * t)
         / 3600.0) * DEG
    lp = (357.52910918 + (129596581.0481 * t - 0.5532 * t * t)
          / 3600.0) * DEG
    F = (93.27209062 + (1739527262.8478 * t - 12.7512 * t * t)
         / 3600.0) * DEG
    D = (297.85019547 + (1602961601.2090 * t - 6.3706 * t * t)
         / 3600.0) * DEG
    om = (125.04455501 + (-6962890.5431 * t + 7.4722 * t * t)
          / 3600.0) * DEG
    return l, lp, F, D, om


# IAU 2000B nutation series, leading terms (|A_psi| >~ 6 mas).
# Columns: l, l', F, D, Om multipliers; A_psi, A_psi*T [mas, mas/cy];
# B_eps, B_eps*T.  Truncation residual ~15 mas RSS in dpsi.
_NUT_TERMS = np.array([
    # l  l'  F  D  Om      A_psi     A_psi_t   B_eps     B_eps_t
    (0,  0,  0,  0,  1, -17206.4161, -17.4666, 9205.2331,  0.9086),
    (0,  0,  2, -2,  2,  -1317.0906,  -0.1675,  573.0336, -0.3015),
    (0,  0,  2,  0,  2,   -227.6413,  -0.0234,   97.8459, -0.0485),
    (0,  0,  0,  0,  2,    207.4554,   0.0207,  -89.7492,  0.0470),
    (0,  1,  0,  0,  0,    147.5877,  -0.3633,    7.3871, -0.0184),
    (0,  1,  2, -2,  2,    -51.6821,   0.1226,   22.4386, -0.0677),
    (1,  0,  0,  0,  0,     71.1159,   0.0073,   -0.6750,  0.0000),
    (0,  0,  2,  0,  1,    -38.7298,  -0.0367,   20.0728,  0.0018),
    (1,  0,  2,  0,  2,    -30.1461,  -0.0036,   12.9025, -0.0063),
    (0, -1,  2, -2,  2,     21.5829,  -0.0494,   -9.5929,  0.0299),
    (0,  0,  2, -2,  1,     12.8227,   0.0137,   -6.8982, -0.0009),
    (-1, 0,  2,  0,  2,     12.3457,   0.0011,   -5.3311,  0.0032),
    (-1, 0,  0,  2,  0,     15.6994,   0.0010,   -0.1235,  0.0000),
    (1,  0,  0,  0,  1,      6.3110,   0.0063,   -3.3228,  0.0000),
    (-1, 0,  0,  0,  1,     -5.7976,  -0.0063,    3.1429,  0.0000),
    (-1, 0,  2,  2,  2,     -5.9641,  -0.0011,    2.5543, -0.0011),
    (1,  0,  2,  0,  1,     -5.1613,  -0.0042,    2.6366,  0.0000),
    (-2, 0,  2,  0,  1,      4.5893,   0.0050,   -2.4236, -0.0010),
    (0,  0,  0,  2,  0,      6.3384,   0.0011,   -0.1220,  0.0000),
    (0,  0,  2,  2,  2,     -3.8571,  -0.0001,    1.6452, -0.0011),
], dtype=np.float64)


def nutation(mjd):
    """IAU 2000B leading-terms nutation: (dpsi, deps) [rad]."""
    t = _jc(mjd)
    args = np.array(delaunay_args(mjd))
    mult = _NUT_TERMS[:, :5]
    phase = mult @ args
    dpsi = np.sum((_NUT_TERMS[:, 5] + _NUT_TERMS[:, 6] * t)
                  * np.sin(phase))
    deps = np.sum((_NUT_TERMS[:, 7] + _NUT_TERMS[:, 8] * t)
                  * np.cos(phase))
    MAS = ARCSEC / 1000.0
    return dpsi * MAS, deps * MAS


def mean_obliquity(mjd):
    """IAU 2006 mean obliquity of the ecliptic [rad]."""
    t = _jc(mjd)
    return ((84381.406 - 46.836769 * t - 0.0001831 * t * t
             + 0.00200340 * t**3) * ARCSEC)


def precession_matrix(mjd):
    """ICRS/GCRS -> mean-of-date rotation.

    Capitaine et al. (2003) IAU 2006 equatorial precession angles
    referred to the GCRS: the +-2.650545 arcsec constant terms carry the
    ICRS frame bias, so this single rotation is bias+precession."""
    t = _jc(mjd)
    zeta = (2.650545 + 2306.083227 * t + 0.2988499 * t * t
            + 0.01801828 * t**3) * ARCSEC
    z = (-2.650545 + 2306.077181 * t + 1.0927348 * t * t
         + 0.01826837 * t**3) * ARCSEC
    theta = (2004.191903 * t - 0.4294934 * t * t
             - 0.04182264 * t**3) * ARCSEC
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
    """Earth barycentric velocity / c in the *equatorial-of-date* frame.

    Three components (erfa epv00 analog, simplified):
      1. heliocentric EMB velocity: exact two-body ellipse — true
         longitude from the equation of center, direction carries the
         eccentricity term via the longitude of perihelion (exact in e
         for a Kepler orbit; Meeus ch. 25 elements);
      2. Earth about the Earth-Moon barycenter (12.4 m/s, ~8.6 mas);
      3. Sun about the solar-system barycenter: Jupiter and Saturn
         reflex terms (12.5 + 2.8 m/s, ~10 mas combined).
    Residual vs a full ephemeris ~3 mas (lunar eccentricity, Uranus/
    Neptune/Venus reflex, planetary perturbations of the EMB orbit).

    Rotate by icrf2tod.T for the ICRF components used in aberration.
    """
    t = _jc(mjd)
    C_LIGHT = 2.99792458e8

    # --- heliocentric EMB: exact ellipse -----------------------------
    L = (280.46646 + 36000.76983 * t) * DEG       # sun mean longitude
    M = (357.52911 + 35999.05029 * t) * DEG       # sun mean anomaly
    e = 0.016708634 - 0.000042037 * t
    # equation of center -> true longitude of the sun; Earth = sun+180
    C = ((1.914602 - 0.004817 * t) * np.sin(M)
         + (0.019993 - 0.000101 * t) * np.sin(2 * M)
         + 0.000289 * np.sin(3 * M)) * DEG
    lam_e = L + C + np.pi                          # Earth true longitude
    pi_e = (L - M) * 1.0 + np.pi                   # Earth perihelion lon
    kgauss = 0.01720209895                         # rad/day (a = 1 AU)
    AU_DAY = 1.495978707e11 / 86400.0
    vfac = kgauss / np.sqrt(1 - e * e) * AU_DAY / C_LIGHT
    vx = -vfac * (np.sin(lam_e) + e * np.sin(pi_e))
    vy = vfac * (np.cos(lam_e) + e * np.cos(pi_e))

    # --- Earth about EMB (opposite the Moon's motion) ----------------
    lam_m = (218.3165 + 481267.8813 * t) * DEG     # moon mean longitude
    v_moon = 1.023e3 / C_LIGHT                     # mean lunar speed / c
    f_m = 0.0121505856                             # m_moon/(m_e + m_m)
    vx += f_m * v_moon * np.sin(lam_m)
    vy += -f_m * v_moon * np.cos(lam_m)

    # --- Sun about the barycenter (Jupiter + Saturn reflex) ----------
    for lam0, rate, v_p, mratio in (
            (34.351484, 3034.9056746, 13.0697e3, 1.0 / 1047.3486),
            (50.077471, 1222.1137943, 9.6724e3, 1.0 / 3497.898)):
        lam = (lam0 + rate * t) * DEG
        vx += mratio * (v_p / C_LIGHT) * np.sin(lam)
        vy += -mratio * (v_p / C_LIGHT) * np.cos(lam)

    # ecliptic-of-date -> equatorial-of-date
    eps = mean_obliquity(mjd)
    return np.array([vx, vy * np.cos(eps), vy * np.sin(eps)])


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
                 h2o_pressure_kpa=1.0, dut1=None, time_scale="tai",
                 eop=None):
        # Rubin MJDs (opsim, phosim headers) are TAI (the reference
        # constructs astropy Time(..., scale='tai'),
        # imsim/batoid_wcs.py:607-612).  Earth rotation needs UT1
        # (= UTC + dut1; TAI-UTC = 37 s since 2017-01, valid for all
        # contemporary survey epochs) and the precession/nutation/
        # aberration series need TT (= TAI + 32.184 s).
        if time_scale == "tai":
            mjd_utc = mjd - 37.0 / 86400.0
            mjd_tt = mjd + 32.184 / 86400.0
        elif time_scale == "utc":
            mjd_utc = mjd
            mjd_tt = mjd + (37.0 + 32.184) / 86400.0
        else:
            raise ValueError(f"unknown time_scale {time_scale!r}")
        # Earth-orientation parameters: `eop` is a finals2000A.all path
        # (or preloaded arrays) supplying measured UT1-UTC and polar
        # motion (the reference ships one: data/19-10-30-finals2000A.all,
        # though it runs with IERS lookups disabled, imsim/utils.py:19-28).
        # An explicit dut1 argument wins over the file.
        xp_as = yp_as = 0.0
        if eop is not None:
            xp_as, yp_as, dut1_file = eop_for_mjd(eop, mjd_utc)
            if dut1 is None:
                dut1 = dut1_file
        dut1 = 0.0 if dut1 is None else float(dut1)
        # Polar motion: first-order shift of the site's ASTRONOMICAL
        # coordinates from the CIP-vs-ITRF pole offset (classic
        # reduction; exact to << 1 mas for |xp|,|yp| < 0.4 arcsec):
        #   dphi    = xp cos(lon) - yp sin(lon)
        #   dlambda = (xp sin(lon) + yp cos(lon)) tan(phi)
        if xp_as or yp_as:
            lat = lat + (xp_as * np.cos(lon)
                         - yp_as * np.sin(lon)) * ARCSEC
            lon = lon + (xp_as * np.sin(lon)
                         + yp_as * np.cos(lon)) * np.tan(lat) * ARCSEC
        self.xp_as, self.yp_as, self.dut1 = xp_as, yp_as, dut1
        self.mjd = mjd
        self.mjd_tt = mjd_tt
        self.mjd_ut1 = mjd_utc + dut1 / 86400.0
        self.lat, self.lon = lat, lon
        self.pressure_kpa = pressure_kpa
        self.temperature_k = temperature_k
        self.h2o_pressure_kpa = h2o_pressure_kpa
        self.wavelength_nm = wavelength_nm
        self.icrf2tod = icrf_to_tod_matrix(mjd_tt)
        # barycentric Earth velocity: computed in the equatorial-of-date
        # frame, rotated to ICRF components (aberration is applied to
        # ICRF vectors; a frame mismatch here costs |v/c| * frame angle
        # ~ 0.1 arcsec)
        self.vel = self.icrf2tod.T @ earth_velocity(mjd_tt)
        # local apparent sidereal time from UT1 (equation of the
        # equinoxes evaluated at TT)
        self.last = (gmst(self.mjd_ut1)
                     + nutation(mjd_tt)[0] * np.cos(mean_obliquity(mjd_tt))
                     + lon)
        self.k1, self.k2 = refraction_coefs(wavelength_nm, pressure_kpa,
                                            temperature_k, h2o_pressure_kpa)
        # diurnal aberration: observer velocity / c, due east
        self.v_diurnal = 465.10 * np.cos(lat) / 2.99792458e8
        self.boresight = (boresight_ra, boresight_dec)
        self.bore_az, self.bore_alt = self.icrf_to_observed(
            np.atleast_1d(boresight_ra), np.atleast_1d(boresight_dec))
        self.bore_az = float(self.bore_az[0])
        self.bore_alt = float(self.bore_alt[0])

    def _diurnal_vec(self):
        """Observer velocity / c in the true-of-date frame (due east at
        local apparent sidereal time)."""
        return self.v_diurnal * np.array([-np.sin(self.last),
                                          np.cos(self.last), 0.0])

    # --- ICRF -> observed az/alt ----------------------------------------
    def icrf_to_observed(self, ra, dec):
        v = _sph_to_vec(ra, dec)
        # annual aberration (first order; v expressed in ICRF)
        v = v + self.vel
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        # bias-precession-nutation
        v = v @ self.icrf2tod.T
        # diurnal aberration (0.32 arcsec at the site), TOD frame
        v = v + self._diurnal_vec()
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        ra_a, dec_a = _vec_to_sph(v)
        # hour angle
        ha = self.last - ra_a
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

    # --- observed equatorial (rob, dob) ---------------------------------
    # The reference's WCS field frame lives in *observed* ra/dec (the
    # apparent, refracted position re-expressed as equatorial
    # coordinates of date: rob = LAST - hob; erfa atco13's rob/dob,
    # imsim/batoid_wcs.py:118-243).
    def icrf_to_observed_radec(self, ra, dec):
        az, alt = self.icrf_to_observed(ra, dec)
        return self.azalt_to_observed_radec(az, alt)

    def azalt_to_observed_radec(self, az, alt):
        sin_lat, cos_lat = np.sin(self.lat), np.cos(self.lat)
        sin_dec = np.sin(alt) * sin_lat + np.cos(alt) * cos_lat * np.cos(az)
        dob = np.arcsin(np.clip(sin_dec, -1, 1))
        hob = np.arctan2(-np.sin(az) * np.cos(alt),
                         np.sin(alt) * cos_lat
                         - np.cos(alt) * sin_lat * np.cos(az))
        rob = self.last - hob
        return rob, dob

    def observed_radec_to_icrf(self, rob, dob):
        ha = self.last - rob
        sin_lat, cos_lat = np.sin(self.lat), np.cos(self.lat)
        sin_alt = (np.sin(dob) * sin_lat
                   + np.cos(dob) * cos_lat * np.cos(ha))
        alt = np.arcsin(np.clip(sin_alt, -1, 1))
        az = np.arctan2(-np.cos(dob) * np.sin(ha),
                        np.sin(dob) * cos_lat
                        - np.cos(dob) * sin_lat * np.cos(ha)) % (2 * np.pi)
        return self.observed_to_icrf(az, alt)

    def parallactic_angle_observed(self):
        """Parallactic angle of the *observed* boresight (position angle
        of zenith from true north through east at the refracted apparent
        place) — erfa hd2pa(hob, dob, lat), the q of the reference's
        field frame (imsim/batoid_wcs.py:255-268)."""
        rob, dob = self.azalt_to_observed_radec(
            np.atleast_1d(self.bore_az), np.atleast_1d(self.bore_alt))
        hob = self.last - rob[0]
        dob = dob[0]
        return np.arctan2(
            np.sin(hob),
            np.tan(self.lat) * np.cos(dob) - np.sin(dob) * np.cos(hob))

    def pseudo_parallactic_angle(self):
        """Position angle of zenith measured from *ICRF* north through
        east at the boresight (the reference's `pq`,
        imsim/batoid_wcs.py:270-308): computed, like the reference, by
        mapping a point slightly zenith-ward of the boresight back to
        ICRF and taking its position angle.  Differs from
        parallactic_angle_observed() by the ICRS-vs-of-date north
        convergence (~0.1-0.2 deg at |dec|~35, epoch 2025)."""
        eps = 1e-4
        ra_z, dec_z = self.observed_to_icrf(
            np.atleast_1d(self.bore_az), np.atleast_1d(self.bore_alt + eps))
        ra0, dec0 = self.boresight
        dra = (float(ra_z[0]) - ra0 + np.pi) % (2 * np.pi) - np.pi
        return np.arctan2(dra * np.cos(dec0), float(dec_z[0]) - dec0)

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
        v = v - self._diurnal_vec()
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
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
