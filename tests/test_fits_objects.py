"""FITS-postage-stamp objects: instcat parsing + point-cloud rendering
(the 'name.fits' object type, imsim/instcat.py:467-576)."""
import numpy as np

import jax
import jax.numpy as jnp

from imsim_tpu.catalog.bandpass import rubin_bandpass
from imsim_tpu.catalog.instcat import FITSIMAGE, read_instcat
from imsim_tpu.image import render
from imsim_tpu.image.scene import build_scene
from imsim_tpu.io.fits import HDU, write_fits
from imsim_tpu.sensor.simple import accumulate


def test_fits_object_end_to_end(tmp_path):
    # a cross-shaped postage stamp
    stamp = np.zeros((31, 31), np.float32)
    stamp[15, 5:26] = 1.0
    stamp[5:26, 15] = 1.0
    fpath = str(tmp_path / "cross.fits")
    write_fits(fpath, [HDU(stamp)])

    sed_dir = tmp_path / "flatSED"
    sed_dir.mkdir()
    w = np.linspace(300, 1150, 100)
    np.savetxt(sed_dir / "sed_flat.txt",
               np.column_stack([w, np.ones_like(w)]))

    cat = tmp_path / "cat.txt"
    cat.write_text(
        "rightascension 0.0\ndeclination 0.0\nmjd 60000\nfilter 2\n"
        f"object 0 0.0 0.0 22.0 flatSED/sed_flat.txt 0 0 0 0 0 0 "
        f"{fpath} 0.2 0.0 none none\n")

    table = read_instcat(str(cat))
    assert table.obj_type[0] == FITSIMAGE
    assert str(table.image_file[0]).endswith("cross.fits")
    assert table.p0[0] == 0.2      # pixel scale

    bp = rubin_bandpass("r")
    host = build_scene(table, bp, [str(tmp_path)])
    assert host.scene.aux_cloud.shape[0] == 2   # dummy + 1 cloud

    # shoot photons through the fast path; position the object mid-image
    params = np.array(host.scene.params)
    params[0, 0] = 64.0
    params[0, 1] = 64.0
    import dataclasses
    scene = dataclasses.replace(host.scene, params=jnp.asarray(params))
    n = 20000
    from imsim_tpu.photons import profiles as P
    kolm = P.kolmogorov_cdf()
    tab = dataclasses.replace(kolm, y=jnp.asarray(kolm.y * 0.05))
    ph = render.shoot(jax.random.PRNGKey(0), scene,
                      jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.float32),
                      {"kolmogorov": tab, "gauss_sigma": 0.01},
                      pixel_scale=0.2)
    img = accumulate(ph, jnp.zeros((128, 128), jnp.float32))
    img = np.asarray(img)
    assert abs(img.sum() - n) < 2
    # the cross arms: flux along row/col 64 far exceeds the diagonal
    arm = img[64, 40:89].sum() + img[40:89, 64].sum()
    diag = sum(img[64 + k, 64 + k] for k in range(5, 22)) \
        + sum(img[64 - k, 64 + k] for k in range(5, 22))
    assert arm > 10 * diag, (arm, diag)


# ---------------------------------------------------------------------------
# The reference's REAL FITS postage stamps (imsim/tests/data): the same
# files its own test suite feeds through galsim.InterpolatedImage
# (imsim/instcat.py:467-576).  The point-cloud sampler must reproduce
# the flux-weighted moments of each measured image.
import os
import pytest

REF = "/root/reference/tests/data"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference checkout not present")


def _image_moments(img):
    """Flux-weighted centroid + second moments of a clipped image, in
    pixel units about the geometric center (the sampler's origin)."""
    img = np.clip(np.asarray(img, np.float64), 0.0, None)
    ny, nx = img.shape
    y, x = np.mgrid[0:ny, 0:nx]
    x = x - (nx - 1) / 2
    y = y - (ny - 1) / 2
    w = img / img.sum()
    cx, cy = (w * x).sum(), (w * y).sum()
    # +1/12 is the variance of the sampler's in-pixel uniform jitter
    vx = (w * (x - cx) ** 2).sum() + 1.0 / 12.0
    vy = (w * (y - cy) ** 2).sum() + 1.0 / 12.0
    return cx, cy, vx, vy


@needs_ref
@pytest.mark.parametrize("fname, hdu", [
    ("acs_I_unrot_sci_20_cf.fits", 0),        # real HST/ACS galaxy cutout
    ("lensed_agn_disk.fits.gz", 0),           # 1000x1000 lensed-AGN disk
    ("real_galaxy_PSF_images.fits", 0),       # multi-HDU RealGalaxy PSFs
])
def test_real_fits_stamp_moments(fname, hdu):
    from imsim_tpu.image.scene import CLOUD_K, _fits_point_cloud
    from imsim_tpu.io.fits import read_fits

    path = os.path.join(REF, fname)
    _, data = read_fits(path)[hdu]
    scale = 0.2
    rng = np.random.default_rng(7)
    cloud = _fits_point_cloud(path, scale, 0.0, rng)
    assert cloud.shape == (CLOUD_K, 2) and np.isfinite(cloud).all()

    cx, cy, vx, vy = _image_moments(data)
    mx, my = cloud.mean(0) / scale
    sx, sy = cloud.var(0) / scale ** 2
    # centroid: sampling error of CLOUD_K draws is ~sqrt(v/K)
    tol_x = 5 * np.sqrt(vx / CLOUD_K) + 0.05
    tol_y = 5 * np.sqrt(vy / CLOUD_K) + 0.05
    assert abs(mx - cx) < tol_x, (mx, cx, tol_x)
    assert abs(my - cy) < tol_y, (my, cy, tol_y)
    # second moments: chi^2-ish spread, allow 20%
    assert abs(sx / vx - 1) < 0.2, (sx, vx)
    assert abs(sy / vy - 1) < 0.2, (sy, vy)


@needs_ref
def test_real_fits_stamp_rotation():
    """theta rotates the sampled cloud: moments swap for a 90-degree
    rotation of the (anisotropic) ACS stamp."""
    from imsim_tpu.image.scene import _fits_point_cloud

    path = os.path.join(REF, "acs_I_unrot_sci_20_cf.fits")
    rng0 = np.random.default_rng(3)
    rng9 = np.random.default_rng(3)
    c0 = _fits_point_cloud(path, 1.0, 0.0, rng0)
    c9 = _fits_point_cloud(path, 1.0, np.pi / 2, rng9)
    # same draws, rotated: x' = -y, y' = x
    np.testing.assert_allclose(c9[:, 0], -c0[:, 1], atol=1e-5)
    np.testing.assert_allclose(c9[:, 1], c0[:, 0], atol=1e-5)


@needs_ref
def test_real_fits_multihdu_psf_bank():
    """All 100 HDUs of the RealGalaxy PSF bank decode to finite,
    positive-flux images of plausible PSF size."""
    from imsim_tpu.io.fits import read_fits

    hdus = read_fits(os.path.join(REF, "real_galaxy_PSF_images.fits"))
    assert len(hdus) == 100
    for _, img in hdus:
        a = np.asarray(img, np.float64)
        assert a.ndim == 2 and 30 <= a.shape[0] <= 50
        assert np.isfinite(a).all() and a.sum() > 0
