"""End-to-end slice test: instcat -> scene -> pooled photon render ->
photometry validation (the reference's test_image.py 4-sigma criterion,
SURVEY.md §4)."""
import os

import numpy as np
import pytest

from imsim_tpu.catalog.bandpass import rubin_bandpass
from imsim_tpu.catalog.instcat import read_instcat, object_flux, RUBIN_AREA
from imsim_tpu.image.ccd_render import RenderConfig, render_ccd
from imsim_tpu.image.scene import build_scene
from imsim_tpu.optics.wcs import TanSipWCS
from imsim_tpu.utils.coords import DEG

RA0, DEC0 = 30.0, -10.0  # deg


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    # flat-ish SED file (f_lambda constant)
    w = np.linspace(300, 1200, 91)
    np.savetxt(d / "flat_sed.txt", np.c_[w, np.ones_like(w)])
    return d


def _mk_wcs(xsize=512, ysize=512):
    scale = 0.2 / 3600.0  # deg/pix
    cd = np.array([[scale, 0.0], [0.0, scale]])
    return TanSipWCS(crpix=[xsize / 2, ysize / 2], cd=cd,
                     crval=[RA0 * DEG, DEC0 * DEG])


def _write_instcat(path, wcs, objects):
    """objects: list of (x, y, magnorm, typestr)"""
    lines = []
    for i, (x, y, mag, typ) in enumerate(objects):
        ra, dec = wcs.xy_to_radec(x, y)
        common = (f"object {i} {np.degrees(ra):.10f} {np.degrees(dec):.10f} "
                  f"{mag} flat_sed.txt 0 0 0 0 0 0")
        if typ == "point":
            lines.append(f"{common} point none CCM 0.02 3.1")
        elif typ == "sersic":
            lines.append(f"{common} sersic2d 1.2 0.8 30 1.0 none none")
        elif typ == "knots":
            lines.append(f"{common} knots 1.2 0.8 30 20 none none")
    path.write_text("\n".join(lines) + "\n")


def test_instcat_parsing(workdir):
    wcs = _mk_wcs()
    cat = workdir / "cat.txt"
    _write_instcat(cat, wcs, [
        (100, 100, 22.0, "point"),
        (300, 300, 21.0, "sersic"),
        (200, 400, 23.0, "knots"),
        (-500, -500, 20.0, "point"),   # off image -> culled
        (256, 256, 60.0, "point"),     # magnorm>=50 -> invalid
    ])
    tab = read_instcat(str(cat), wcs, xsize=512, ysize=512, edge_pix=50)
    assert len(tab) == 3
    # sorted brightest first
    assert tab.magnorm[0] == 21.0
    assert tab.obj_type[0] == 1  # sersic
    # image positions round-trip
    i = list(tab.magnorm).index(22.0)
    assert np.hypot(tab.x[i] - 100, tab.y[i] - 100) < 1e-6


def test_object_flux_scale():
    # mag 20 star in 30s through full aperture: O(10^4-10^5) photons/s scale
    f = object_flux(20.0, RUBIN_AREA, 30.0)
    assert 1e-8 * RUBIN_AREA * 30.0 * 0.9 < f < 1e-8 * RUBIN_AREA * 30.0 * 1.1


def test_end_to_end_photometry(workdir):
    wcs = _mk_wcs()
    cat = workdir / "cat2.txt"
    objs = [(128, 128, 22.0, "point"),
            (384, 384, 21.5, "point"),
            (128, 384, 21.0, "sersic"),
            (384, 128, 22.5, "knots")]
    _write_instcat(cat, wcs, objs)
    tab = read_instcat(str(cat), wcs, xsize=512, ysize=512)
    bp = rubin_bandpass("r", airmass=1.2)
    host = build_scene(tab, bp, [str(workdir)], exptime=30.0,
                       rng=np.random.default_rng(7))
    assert host.n_objects == 4
    # every object got a sensible photon budget
    assert (host.nominal_flux > 100).all()

    cfg = RenderConfig(xsize=512, ysize=512, batch_size=1 << 16,
                       fwhm=0.7, sky_level=0.0)
    img = np.asarray(render_ccd(42, host, cfg))
    assert img.sum() == pytest.approx(host.flux.sum(), rel=1e-6)

    # aperture photometry at each catalog position: 4-sigma agreement
    order = np.argsort(tab.magnorm)  # brightest first == table order
    for i in range(4):
        x, y = int(round(tab.x[i])), int(round(tab.y[i]))
        r = 40
        ap = img[max(y - r, 0):y + r, max(x - r, 0):x + r].sum()
        expected = host.flux[i]
        assert abs(ap - expected) < 4 * np.sqrt(expected) + 0.02 * expected


def test_sky_level_and_noise(workdir):
    wcs = _mk_wcs()
    cat = workdir / "cat3.txt"
    _write_instcat(cat, wcs, [(128, 128, 25.0, "point")])
    tab = read_instcat(str(cat), wcs, xsize=512, ysize=512)
    bp = rubin_bandpass("r", airmass=1.2)
    host = build_scene(tab, bp, [str(workdir)])
    cfg = RenderConfig(xsize=512, ysize=512, batch_size=1 << 16,
                       sky_level=1000.0)
    img = np.asarray(render_ccd(42, host, cfg))
    # sky = 1000 ph/arcsec^2 * 0.04 arcsec^2/pix = 40 e-/pix
    corner = img[:100, 300:400]
    assert corner.mean() == pytest.approx(40.0, rel=0.05)
    assert corner.std() == pytest.approx(np.sqrt(40.0), rel=0.2)
