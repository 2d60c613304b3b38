"""Solve for the exact tangent->field frame matrix the reference's
written WCS solutions imply, instead of guessing conventions.

For a pixel grid p: the oracle gives sky_g(p); our chain with an
UNKNOWN frame G maps sky -> field = G @ t(sky) -> trace -> pixels.
Running our chain with the IDENTITY frame gives W0, so t0 = t(W0(p))
satisfies G @ t_g = t0 with t_g = t(sky_g(p)).  Least-squares G from
the grids, at both oracles; print G in angle form along with q and
rotTelPos so the convention law can be read off.
"""
import os
import re
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imsim_tpu.electronics.camera import get_camera
from imsim_tpu.io.fits import read_fits
from imsim_tpu.optics import wcs_factory as WF
from imsim_tpu.optics.wcs import TanSipWCS, _poly_terms
from imsim_tpu.utils.coords import gnomonic_project

DEG = np.pi / 180
GOLDEN = "/root/reference/tests/data/eimage_00449053-1-r-R22_S11-det094.fits.gz"
DC2 = "/root/reference/tests/data/wcs_466749.yaml"

V1 = dict(name="golden", ra=54.3712096044475, dec=-35.8373231129231,
          mjd=61017.0451099272 + (1 * (15 + 2) + 7.5) / 86400.0,
          band="r", wl=622.0, rtp=24.3157942276737)
V2 = dict(name="dc2", ra=65.50997516276744648, dec=-33.40601776620508190,
          mjd=60261.09014361110894242 - 15 / 86400.0,
          band="u", wl=365.49, rtp=42.8902454 + 180.0)


def golden_wcs_textbook():
    hdr = read_fits(GOLDEN)[0][0]
    crpix = np.array([hdr["CRPIX1"], hdr["CRPIX2"]])
    cd = np.array([[hdr["CD1_1"], hdr["CD1_2"]],
                   [hdr["CD2_1"], hdr["CD2_2"]]]) * DEG
    crval = np.array([hdr["CRVAL1"], hdr["CRVAL2"]]) * DEG
    order = int(hdr.get("A_ORDER", 0))
    _, pw = _poly_terms(np.zeros(1), np.zeros(1), order)
    a = np.array([hdr.get(f"A_{p}_{q}", 0.0) for p, q in pw])
    b = np.array([hdr.get(f"B_{p}_{q}", 0.0) for p, q in pw])
    return TanSipWCS(crpix, cd, crval, a, b, pw)


def dc2_wcs_textbook():
    txt = yaml.safe_load(open(DC2))["calexp_00466749-u-R22-S11-det094.fits"]
    m = re.search(r"array\(\[\[(.*?)\]\]\)", txt)
    cd = np.array([[float(x) for x in r.split(",")]
                   for r in m.group(1).split("], [")]) * DEG
    nums = re.search(r"array\(\[([-0-9.e]+), ([-0-9.e]+)\]\)", txt)
    crpix = np.array([float(nums.group(1)), float(nums.group(2))])
    angs = re.findall(r"coord.Angle\(([-0-9.e]+), coord.radians\)", txt)
    crval = np.array([float(angs[0]), float(angs[1])])
    return TanSipWCS(crpix, cd, crval)


def identity_frame(fac):
    def icrf_to_field(ra, dec):
        rob, dob = fac.obs.icrf_to_observed_radec(
            np.asarray(ra, float), np.asarray(dec, float))
        return gnomonic_project(rob, dob, fac._bore_rob, fac._bore_dob)

    def tangent_of_icrf(ra, dec):
        return icrf_to_field(ra, dec)

    def field_to_icrf(thx, thy):
        from imsim_tpu.utils.coords import gnomonic_deproject
        rob, dob = gnomonic_deproject(thx, thy, fac._bore_rob,
                                      fac._bore_dob)
        return fac.obs.observed_radec_to_icrf(rob, dob)

    fac.icrf_to_field = icrf_to_field
    fac.field_to_icrf = field_to_icrf
    return fac, tangent_of_icrf


def solve(v, oracle):
    fac = WF.make_wcs_factory(v["ra"] * DEG, v["dec"] * DEG, v["mjd"],
                              band=v["band"], rotTelPos=v["rtp"] * DEG,
                              wavelength_nm=v["wl"])
    fac, tangent = identity_frame(fac)
    ccd = get_camera("LsstCamSim")["R22_S11"]
    w0 = fac.get_wcs(ccd)

    xs = np.linspace(100, 3990, 7)
    X, Y = np.meshgrid(xs, np.linspace(100, 3900, 7))
    X, Y = X.ravel(), Y.ravel()
    ra_g, dec_g = oracle.xy_to_radec(X, Y)
    ra_0, dec_0 = w0.xy_to_radec(X, Y)
    tg = np.stack(tangent(ra_g, dec_g), -1)          # (N,2)
    t0 = np.stack(tangent(ra_0, dec_0), -1)
    # least squares G: t0 = G @ tg
    G, *_ = np.linalg.lstsq(tg, t0, rcond=None)
    G = G.T
    detG = np.linalg.det(G)
    scale = np.sqrt(abs(detG))
    Gn = G / scale
    q = float(fac.obs.parallactic_angle_observed()) / DEG
    if detG < 0:   # reflection [[c,s],[s,-c]] at angle a
        a = np.degrees(np.arctan2(0.5 * (Gn[0, 1] + Gn[1, 0]),
                                  0.5 * (Gn[0, 0] - Gn[1, 1])))
        kind = "Ref"
    else:          # rotation R(a)
        a = np.degrees(np.arctan2(0.5 * (Gn[1, 0] - Gn[0, 1]),
                                  0.5 * (Gn[0, 0] + Gn[1, 1])))
        kind = "Rot"
    resid = np.sqrt(np.mean(np.sum((tg @ G.T - t0) ** 2, -1))) / DEG * 3600
    print("%s: %s(%.4f deg) scale=%.6f q=%.4f rtp=%.4f resid=%.2f arcsec"
          % (v["name"], kind, a, scale, q, v["rtp"], resid))
    for (cb, lbl) in [(a - v["rtp"], "a-rtp"), (a + v["rtp"], "a+rtp"),
                      (a - q, "a-q"), (a + q, "a+q"),
                      (a - v["rtp"] - q, "a-rtp-q"),
                      (a - v["rtp"] + q, "a-rtp+q"),
                      (a + v["rtp"] - q, "a+rtp-q"),
                      (a + v["rtp"] + q, "a+rtp+q")]:
        print("   %-9s = %9.4f" % (lbl, cb % 360.0))


if __name__ == "__main__":
    solve(V1, golden_wcs_textbook())
    solve(V2, dc2_wcs_textbook())
