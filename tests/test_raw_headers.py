"""Raw amp-file tests: DM keyword coverage (imsim/readout.py:208-299),
per-amp flipped SIP WCS (:479-526), and eimage reassembly from the raw
file (unsegment + de-bias + gain) — the reference's
test_raw_file_writing analog without golden files.
"""
import numpy as np

import jax.numpy as jnp

from imsim_tpu.electronics.camera import get_camera
from imsim_tpu.electronics.headers import (dayobs, mjd_to_isot,
                                           raw_primary_header)
from imsim_tpu.electronics.readout import CcdReadout, VENDOR_SPECS
from imsim_tpu.io.fits import read_fits
from imsim_tpu.utils.rng import stream


def test_mjd_iso_conversion():
    # 2024-01-01T00:00:00 is MJD 60310
    assert mjd_to_isot(60310.0).startswith("2024-01-01T00:00:00")
    assert mjd_to_isot(60310.5).startswith("2024-01-01T12:00:00")
    # DAYOBS rolls at local noon-ish (mjd - 0.5)
    assert dayobs(60310.2) == "20231231"
    assert dayobs(60310.7) == "20240101"


DM_REQUIRED = [
    "RUNNUM", "MJD", "DATE", "DAYOBS", "SEQNUM", "CONTRLLR", "EXPTIME",
    "DARKTIME", "TIMESYS", "LSST_NUM", "IMGTYPE", "OBSTYPE", "REASON",
    "ROTANGLE", "FILTER", "INSTRUME", "RAFTBAY", "CCDSLOT", "RA", "DEC",
    "ROTCOORD", "ROTPA", "TELESCOP", "TELCODE", "RASTART", "DECSTART",
    "ELSTART", "AZSTART", "OBSID", "MJD-OBS", "HASTART", "HAEND",
    "DATE-OBS", "DATE-END", "AMSTART", "AMEND", "ORIGIN", "IMSIMVER",
    "CHIPID", "FOCUSZ", "RADESYS", "TRACKSYS",
]


def _run_tiny_visit(tmp_path, det="R22_S11"):
    from imsim_tpu.config.runner import build_visit_context, render_one_ccd

    cfg = {
        "opsim_meta": {"fieldRA": 30.0, "fieldDec": -20.0,
                       "observationStartMJD": 60674.2, "band": "r",
                       "observationId": 7001, "seqnum": 42,
                       "exptime": 30.0},
        "image": {"sky_level": 0.0, "apply_fringing": False,
                  "nbatch": 1, "sensor": {"type": "none"}},
        "psf": {"type": "DoubleGaussianPSF", "fwhm1": 0.6},
        "stamp": {"fft_sb_thresh": 0.0},
        "output": {"dir": str(tmp_path), "camera": "LsstCamSim",
                   "only_dets": [det],
                   "file_name": "eimage.fits",
                   "readout": {"file_name": "amp.fits",
                               # user keywords with a $-eval, the
                               # reference's added_keywords surface
                               # (imsim/readout.py:574-585)
                               "added_keywords": {
                                   "TESTKEY1": "TESTVAL1",
                                   "SOMEMATH": "$1+2"}},
                   # eimage-header user extras
                   # (imsim/ccd.py LSST_CCDBuilder 'header')
                   "header": {"MYKEY": "myval"},
                   # presence of the section activates the extra
                   # output (GalSim extra-output semantics)
                   "opd": {"file_name": "opd.fits", "nx": 33,
                           "fields": [[0.0, 0.0]]},
                   "truth": {"enabled": False}},
    }
    ctx = build_visit_context(cfg)
    # a tiny synthetic scene: uniform low level so reassembly is testable
    res = render_one_ccd(ctx, ctx.camera.det_num(det), write=False)
    ccd = res["ccd"]
    ny, nx = res["eimage"].shape
    eimage = np.full((ny, nx), 300.0, np.float32)
    res["eimage"] = eimage
    from imsim_tpu.config.runner import write_outputs

    write_outputs(ctx, res)
    return ctx, ccd, eimage, str(tmp_path)


def test_raw_file_headers_and_roundtrip(tmp_path):
    import os

    ctx, ccd, eimage, outdir = _run_tiny_visit(tmp_path)
    # output.header extras reach the eimage header
    ehdr = read_fits(outdir + "/eimage.fits")[0][0]
    assert ehdr["MYKEY"] == "myval"
    # a configured output.opd section activates without enabled: true
    assert os.path.isfile(outdir + "/opd.fits")
    hdus = read_fits(outdir + "/amp.fits")
    phdr = hdus[0][0]
    for key in DM_REQUIRED:
        assert key in phdr, f"missing DM keyword {key}"
    assert phdr["OBSID"] == "MC_S_" + phdr["DAYOBS"] + "_000042"
    assert phdr["TESTKEY1"] == "TESTVAL1"
    assert int(phdr["SOMEMATH"]) == 3
    assert phdr["FILTER"] == "r_57"
    assert phdr["INSTRUME"] == "LSSTCamSim"
    assert phdr["RAFTBAY"] == "R22"
    assert phdr["CCDSLOT"] == "S11"

    # 16 amp HDUs with WCS + section keywords
    assert len(hdus) == 17
    spec = VENDOR_SPECS[ccd.vendor]
    pre, anx, any_ = spec["prescan"], spec["amp_nx"], spec["amp_ny"]
    recon = np.zeros_like(eimage)
    for k, aname in enumerate(ccd.amp_names):
        hdr, data = hdus[1 + k]
        amp = ccd[aname]
        assert hdr["EXTNAME"] == f"Segment{aname[1:]}"
        for w in ("DATASEC", "DETSEC", "DETSIZE", "CRPIX1", "CRPIX2",
                  "CD1_1", "CD2_2", "CTYPE1", "GAIN"):
            assert w in hdr, (aname, w)
        # de-bias, gain, unflip, place into detector frame
        sec = np.asarray(data[:any_, pre:pre + anx], np.float64)
        sec = (sec - amp.bias_level) * amp.gain
        if amp.raw_flip_x:
            sec = sec[:, ::-1]
        if amp.raw_flip_y:
            sec = sec[::-1, :]
        b = amp.bounds
        recon[b.ymin:b.ymax + 1, b.xmin:b.xmax + 1] = sec
    # reassembled image matches the eimage up to dark current, read
    # noise, crosstalk and CTE (all small vs the 300 e- level)
    diff = recon - eimage
    assert abs(np.median(diff)) < 5.0, np.median(diff)
    assert np.std(diff) < 25.0, np.std(diff)


def test_amp_wcs_consistency(tmp_path):
    """The per-amp WCS must map a raw-frame pixel to the same sky
    position as the detector WCS maps the corresponding eimage pixel
    (affine part; SIP terms carried unchanged)."""
    ctx, ccd, eimage, outdir = _run_tiny_visit(tmp_path)
    wcs = ctx.wcs_factory.get_wcs(ccd)
    hdus = read_fits(outdir + "/amp.fits")
    spec = VENDOR_SPECS[ccd.vendor]
    pre, anx, any_ = spec["prescan"], spec["amp_nx"], spec["amp_ny"]
    hdr, _ = hdus[1]  # C00: bottom row, raw_flip_x
    amp = ccd["C00"]
    # detector pixel of raw data pixel (col c, row r):
    c, rr = 100, 50
    det_x = amp.bounds.xmax - c if amp.raw_flip_x else \
        amp.bounds.xmin + c
    det_y = amp.bounds.ymax - rr if amp.raw_flip_y else \
        amp.bounds.ymin + rr
    raw_c = pre + c
    # affine TAN part evaluated by hand from the amp header
    du = raw_c + 1 - hdr["CRPIX1"]
    dv = rr + 1 - hdr["CRPIX2"]
    xi = hdr["CD1_1"] * du + hdr["CD1_2"] * dv
    eta = hdr["CD2_1"] * du + hdr["CD2_2"] * dv
    # same thing from the detector WCS header
    dcards = wcs.header_cards()
    du2 = det_x + 1 - dcards["CRPIX1"]
    dv2 = det_y + 1 - dcards["CRPIX2"]
    xi2 = dcards["CD1_1"] * du2 + dcards["CD1_2"] * dv2
    eta2 = dcards["CD2_1"] * du2 + dcards["CD2_2"] * dv2
    assert abs(xi - xi2) < 1e-9
    assert abs(eta - eta2) < 1e-9
