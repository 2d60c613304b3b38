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
