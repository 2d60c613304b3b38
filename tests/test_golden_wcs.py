"""WCS parity against the reference's own written WCS solutions.

Two independent oracles:
  * the golden eimage of visit 449053 / R22_S11
    (reference tests/data/eimage_00449053-1-r-R22_S11-det094.fits.gz)
    — a modern imSim batoid+erfa TAN-SIP solution;
  * the DC2 replay set (tests/data/wcs_466749.yaml, 189 detectors,
    different epoch/band/rotator/parallactic angle; carries the known
    DC2 extra-180-deg camera rotation, reference
    tests/test_batoid_wcs.py:226-233).

These pin the full chain: apparent-place astrometry, the observed-frame
field involution, the rotator sense, the EDCS->DVCS focal frame, the
raytraced plate scale, and the TAN-SIP fit.  For calibration context:
the reference's own validation against the DC2 set asserts mean sky
separation < 5 arcsec (tests/test_batoid_wcs.py:306-315); the golden
grid here agrees to well under 0.2 arcsec.
"""
import re

import numpy as np
import pytest

GOLDEN = "/root/reference/tests/data/eimage_00449053-1-r-R22_S11-det094.fits.gz"
DC2 = "/root/reference/tests/data/wcs_466749.yaml"
OPSIM = "/root/reference/tests/data/small_opsim_9683.db"

V1 = dict(ra=54.3712096044475, dec=-35.8373231129231,
          # snap-1 midpoint, matching the golden header MJD
          mjd=61017.0451099272 + (1 * (15 + 2) + 7.5) / 86400.0,
          band="r", wl=622.0, rtp=24.3157942276737)
V2 = dict(ra=65.50997516276744648, dec=-33.40601776620508190,
          mjd=60261.09014361110894242 - 15 / 86400.0,
          band="u", wl=365.49, rtp=42.8902454 + 180.0)   # DC2 quirk


def _golden_wcs():
    from imsim_tpu.io.fits import read_fits
    from imsim_tpu.optics.wcs import TanSipWCS, _poly_terms

    hdr = read_fits(GOLDEN)[0][0]
    # The reference fits in DM 0-based pixels and writes them into the
    # GS_XMIN=1 image unshifted, so stored CRPIX are 0-based (the
    # boresight lands exactly on the detector center only this way).
    crpix = np.array([hdr["CRPIX1"], hdr["CRPIX2"]])
    # textbook FITS convention, verbatim: axis 1 of the intermediate
    # world coords IS RA (increasing east), matching our internal cd
    cd = np.array([[hdr["CD1_1"], hdr["CD1_2"]],
                   [hdr["CD2_1"], hdr["CD2_2"]]])
    crval = np.array([hdr["CRVAL1"], hdr["CRVAL2"]]) * np.pi / 180
    order = int(hdr.get("A_ORDER", 0))
    _, pw = _poly_terms(np.zeros(1), np.zeros(1), order)
    a = np.array([hdr.get(f"A_{p}_{q}", 0.0) for p, q in pw])
    b = np.array([hdr.get(f"B_{p}_{q}", 0.0) for p, q in pw])
    return TanSipWCS(crpix, cd, crval, a, b, pw)


def _our_wcs(v, det="R22_S11"):
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.optics.wcs_factory import make_wcs_factory

    fac = make_wcs_factory(np.deg2rad(v["ra"]), np.deg2rad(v["dec"]),
                           v["mjd"], band=v["band"],
                           rotTelPos=np.deg2rad(v["rtp"]),
                           wavelength_nm=v["wl"])
    cam = get_camera("LsstCamSim")
    return fac.get_wcs(cam[det])


def _sep_mas(w1, w2, X, Y):
    r1, d1 = w1.xy_to_radec(X, Y)
    r2, d2 = w2.xy_to_radec(X, Y)
    dra = ((r2 - r1 + np.pi) % (2 * np.pi) - np.pi) * np.cos(d1)
    return np.hypot(dra, d2 - d1) * 180 / np.pi * 3.6e6


def test_golden_visit_wcs_grid():
    """Full-CCD grid against the golden header: boresight to < 10 mas,
    mean < 150 mas, worst corner < 300 mas (the residual is a
    ~0.02-deg twist + SIP differences; compare the reference's own
    5-arcsec DC2 criterion)."""
    gw = _golden_wcs()
    ow = _our_wcs(V1)
    xs = np.linspace(50, 4045, 9)
    ys = np.linspace(50, 3955, 9)
    X, Y = np.meshgrid(xs, ys)
    sep = _sep_mas(gw, ow, X.ravel(), Y.ravel())
    assert sep.mean() < 150.0, sep.mean()
    assert sep.max() < 300.0, sep.max()
    # boresight lands at the same pixel to sub-10-mas
    b = _sep_mas(gw, ow, np.array([2047.5]), np.array([2001.5]))
    assert b[0] < 10.0, b[0]


def test_golden_visit_wcs_scale_and_parity():
    gw = _golden_wcs()
    ow = _our_wcs(V1)
    # plate scale to 0.1%
    s_g = np.sqrt(abs(np.linalg.det(gw.cd)))
    s_o = np.sqrt(abs(np.linalg.det(ow.cd)))
    assert abs(s_o / s_g - 1) < 1e-3
    # same parity on the sky
    assert np.sign(np.linalg.det(gw.cd)) == np.sign(np.linalg.det(ow.cd))


def _dc2_cd(key_text):
    m2 = re.search(r"array\(\[\[([-0-9.e, ]+)\], \[([-0-9.e, ]+)\]\]\)",
                   key_text)
    # verbatim: GSFitsWCS's stored cd is the FITS CD (axis 1 = RA, east)
    return np.array([np.fromstring(m2.group(1), sep=","),
                     np.fromstring(m2.group(2), sep=",")])


def test_dc2_replay_orientation_all_rafts():
    """Against the DC2 set at a different q/epoch/band/rotator: the
    fitted position angle matches each stored WCS to < 0.6 deg (the
    DC2 WCSs are PhoSim-era solutions; the reference itself only
    matches them to ~arcsec positions).  This is the q-sensitivity
    check: any wrong sign or axis in the field involution shows up as
    2*(q1-q2) ~ 26 deg between this and the golden test."""
    import yaml

    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.optics.wcs_factory import make_wcs_factory

    wcss = yaml.safe_load(open(DC2))
    fac = make_wcs_factory(np.deg2rad(V2["ra"]), np.deg2rad(V2["dec"]),
                           V2["mjd"], band=V2["band"],
                           rotTelPos=np.deg2rad(V2["rtp"]),
                           wavelength_nm=V2["wl"])
    cam = get_camera("LsstCamSim")

    def pa(cd):
        return np.rad2deg(np.arctan2(cd[0, 1], cd[1, 1]))

    diffs = []
    for key in list(wcss)[::13]:          # 15 detectors across the plane
        det = key.split("-")[2] + "_" + key.split("-")[3]
        cd_dc2 = _dc2_cd(wcss[key])
        w = fac.get_wcs(cam[det])
        diffs.append((pa(w.cd) - pa(cd_dc2) + 180) % 360 - 180)
    diffs = np.array(diffs)
    assert np.all(np.abs(diffs) < 0.6), diffs
    assert abs(diffs.mean()) < 0.3, diffs.mean()


def test_opsim_449053_roundtrip_metadata():
    """The opsim row that produced the golden visit loads with our
    reader and reproduces the golden header's derived values."""
    import sqlite3

    from imsim_tpu.io.fits import read_fits

    hdr = read_fits(GOLDEN)[0][0]
    con = sqlite3.connect(OPSIM)
    row = con.execute(
        "SELECT fieldRA, fieldDec, observationStartMJD, filter, airmass"
        " FROM observations WHERE observationId=449053").fetchone()
    assert abs(row[0] - hdr["RATEL"]) < 1e-9
    assert abs(row[1] - hdr["DECTEL"]) < 1e-9
    assert abs(row[2] - hdr["MJD-OBS"]) < 1e-9
    assert row[3] == hdr["FILTER"]
    assert abs(row[4] - hdr["AMSTART"]) < 1e-9
