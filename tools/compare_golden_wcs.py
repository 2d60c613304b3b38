"""Compare our WCS chain against the reference's golden TAN-SIP.

The golden eimage (reference tests/data/eimage_00449053-1-r-R22_S11-
det094.fits.gz) carries the full batoid+erfa WCS solution the reference
wrote for visit 449053 / R22_S11 / r band.  This probe rebuilds the
same visit's WCS with our self-contained chain and maps the angular
separation across the CCD — the direct measurement of absolute
astrometry + raytrace + SIP-fit fidelity (VERDICT r3 missing #1/#4).

Usage: python tools/compare_golden_wcs.py [--mjd-shift SECONDS]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = "/root/reference/tests/data/eimage_00449053-1-r-R22_S11-det094.fits.gz"
OPSIM = "/root/reference/tests/data/small_opsim_9683.db"


def golden_wcs():
    from imsim_tpu.io.fits import read_fits
    from imsim_tpu.optics.wcs import TanSipWCS, _poly_terms

    hdr = read_fits(GOLDEN)[0][0]
    # The reference fits its WCS in DM 0-based pixel coords
    # (imsim/utils.py:42-59 focal_to_pixel) and writes them into the
    # GS_XMIN=1 eimage unshifted, so the stored CRPIX values are
    # 0-based coordinates: the boresight maps to exactly the detector
    # center (2047.5, 2001.5) only under this reading (measured here:
    # the 1-based reading leaves an exact (-1,-1)-pixel offset).
    crpix = np.array([hdr["CRPIX1"], hdr["CRPIX2"]])
    # textbook FITS convention, verbatim (axis 1 = RA, increasing east
    # — the same frame our internal cd uses)
    cd = np.array([[hdr["CD1_1"], hdr["CD1_2"]],
                   [hdr["CD2_1"], hdr["CD2_2"]]])
    crval = np.array([hdr["CRVAL1"], hdr["CRVAL2"]]) * np.pi / 180
    order = int(hdr.get("A_ORDER", 0))
    a, b, powers = [], [], []
    _, pw = _poly_terms(np.zeros(1), np.zeros(1), order)
    for (p, q) in pw:
        a.append(hdr.get(f"A_{p}_{q}", 0.0))
        b.append(hdr.get(f"B_{p}_{q}", 0.0))
        powers.append((p, q))
    return TanSipWCS(crpix, cd, crval, np.array(a), np.array(b),
                     powers), hdr


def our_wcs(mjd_shift_s=0.0, dut1=0.0):
    import sqlite3

    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.optics.wcs_factory import make_wcs_factory

    con = sqlite3.connect(OPSIM)
    row = con.execute(
        "SELECT fieldRA, fieldDec, observationStartMJD, rotTelPos,"
        " visitExposureTime, numExposures, visitTime"
        " FROM observations WHERE observationId=449053").fetchone()
    ra, dec, mjd0, rtp, vexp, nexp, vtime = row
    exptime = vexp / nexp
    readout = (vtime - vexp) / nexp
    snap = 1   # golden header MJD = start + snap*(exp+readout) + exp/2
    mjd = mjd0 + (snap * (exptime + readout) + exptime / 2) / 86400.0
    mjd += mjd_shift_s / 86400.0
    fac = make_wcs_factory(np.deg2rad(ra), np.deg2rad(dec), mjd,
                           band="r", rotTelPos=np.deg2rad(rtp), dut1=dut1)
    cam = get_camera("LsstCamSim")
    return fac.get_wcs(cam["R22_S11"]), fac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mjd-shift", type=float, default=0.0,
                    help="seconds added to the TAI mjd before use")
    ap.add_argument("--dut1", type=float, default=0.0)
    args = ap.parse_args()

    gw, hdr = golden_wcs()
    ow, fac = our_wcs(args.mjd_shift, args.dut1)

    # pixel grid across the CCD (FITS 1-based for the golden header)
    xs = np.linspace(50, 4045, 9)
    ys = np.linspace(50, 3955, 9)
    X, Y = np.meshgrid(xs, ys)
    gra, gdec = gw.xy_to_radec(X.ravel() - 1, Y.ravel() - 1)
    ora, odec = ow.xy_to_radec(X.ravel() - 1, Y.ravel() - 1)

    cosd = np.cos(gdec)
    dra = (ora - gra + np.pi) % (2 * np.pi) - np.pi
    sep = np.hypot(dra * cosd, odec - gdec) * 180 / np.pi * 3.6e6  # mas
    era = dra * cosd * 180 / np.pi * 3.6e6
    edec = (odec - gdec) * 180 / np.pi * 3.6e6

    print(f"separation mas: mean {sep.mean():9.2f}  max {sep.max():9.2f}"
          f"  min {sep.min():9.2f}")
    print(f"dRA*cos(dec) mas: mean {era.mean():9.2f} std {era.std():8.2f}")
    print(f"dDec        mas: mean {edec.mean():9.2f} std {edec.std():8.2f}")
    # decompose: offset removed -> rotation/scale residual
    r = np.stack([era - era.mean(), edec - edec.mean()])
    print(f"after removing mean offset: rms {np.hypot(*r).std():8.2f}"
          f" max {np.hypot(*r).max():8.2f}")
    # center-point diagnostics
    g0 = gw.xy_to_radec(2047.5, 2001.5)
    o0 = ow.xy_to_radec(2047.5, 2001.5)
    print("center golden RA,Dec deg:", np.rad2deg(g0))
    print("center ours   RA,Dec deg:", np.rad2deg(o0))


if __name__ == "__main__":
    main()
