"""Pupil-pairing fidelity experiment: pair = 1 / 4 / 8.

Block pairing shares one pupil/time/screen draw among `pair` photon
slots (image/render.py::shoot_full, image/photon_pooling.py
build_obj_map), halving screen-gather count per doubling.  The cost is
fewer independent atmospheric speckle samples per star: a star with F
photons gets F/pair first-kick draws.  This script measures, for a
single star through the FULL chain (screens + second kick + DCR +
raytrace + silicon):

  * per-trial adaptive second moments (PSF size) and centroid —
    bias and trial-to-trial dispersion vs pair,
  * per-pixel variance across trials vs the Poisson expectation
    (the BASELINE "per-pixel consistent within Poisson noise"
    criterion): excess factor = var/mean across the stamp core.

Run on CPU:  JAX_PLATFORMS=cpu python benchmarks/pair_experiment.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(flux=100_000, trials=12):
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.photon_pooling import (batch_from_obj_map,
                                                build_obj_map,
                                                materialize_rows_T)
    from imsim_tpu.image.render import shoot_full
    from imsim_tpu.image.scene import WL_CDF_K, DeviceScene
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import make_optics_context
    from imsim_tpu.psf.atmosphere import (AtmConfig, make_screens,
                                          second_kick_table)
    from imsim_tpu.sensor.silicon import SiliconParams, accumulate_silicon
    from imsim_tpu.utils.lookup import PolyCDF

    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    wcs = fac.get_wcs(ccd)
    ra, dec = wcs.xy_to_radec(2048.0, 2048.0)
    thx, thy = fac.icrf_to_field(np.array([ra]), np.array([dec]))

    octx = make_optics_context(fac, ccd)
    tel = fac.telescope.for_detector("R22_S11")
    atm_cfg = AtmConfig(fwhm=0.7)
    screens = make_screens(42 + 271828, atm_cfg)
    sk_poly, _ = PolyCDF.fit(second_kick_table(atm_cfg, 622.0))
    silicon = SiliconParams.make()

    wl = np.linspace(552.0, 691.0, WL_CDF_K).astype(np.float32)
    npad = 8
    z = np.zeros(npad, np.float32)
    scene = DeviceScene.from_columns(
        x=z + np.float32(thx[0]), y=z + np.float32(thy[0]),
        obj_type=z, p0=z + 0.1, p1=z + 1.0, p2=z + 1.0, p3=z,
        g1=z, g2=z, mu=z + 1.0,
        wl_icdf=np.broadcast_to(wl, (npad, WL_CDF_K)))

    N = int(flux)
    cum = np.zeros(npad, np.int32)
    cum[0:] = N
    cum_dev = jnp.asarray(cum)

    def render_one(key, pair, share):
        omap = jax.jit(build_obj_map,
                       static_argnames=("nb", "batch_size", "pair",
                                        "share"))(
            cum_dev, jnp.int32(N), 1, N, pair, share)
        obj_idx, w = batch_from_obj_map(omap, jnp.int32(N), 0, 1, N,
                                        pair, share)
        mat = jnp.concatenate([scene.params, scene.wl_cheb], axis=1)
        row = materialize_rows_T(mat, cum_dev, 0, 1, N, pair, share)
        ph = shoot_full(key, scene, obj_idx, w, tel, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row, pupil_pairing=pair, screen_share=share)
        img = jnp.zeros((4096, 4096), jnp.float32)
        return accumulate_silicon(jax.random.fold_in(key, 7), ph, img,
                                  silicon, nsub=2)

    render_j = jax.jit(render_one, static_argnames=("pair", "share"))

    for pair, share in ((1, 1), (4, 1), (4, 4), (4, 8), (8, 1)):
        sizes, cxs, stamps = [], [], []
        for t in range(trials):
            img = np.asarray(
                render_j(jax.random.PRNGKey(1000 + t), pair, share))
            # stamp around the star
            iy, ix = np.unravel_index(np.argmax(
                img[2048 - 64:2048 + 64, 2048 - 64:2048 + 64]), (128, 128))
            cy, cx = 2048 - 64 + iy, 2048 - 64 + ix
            s = img[cy - 24:cy + 25, cx - 24:cx + 25]
            yy, xx = np.mgrid[-24:25, -24:25]
            tot = s.sum()
            mx, my = (s * xx).sum() / tot, (s * yy).sum() / tot
            ixx = (s * (xx - mx) ** 2).sum() / tot
            iyy = (s * (yy - my) ** 2).sum() / tot
            sizes.append(np.sqrt(0.5 * (ixx + iyy)))
            cxs.append(cx + mx)
            stamps.append(s)
        stamps = np.array(stamps)
        mean = stamps.mean(0)
        var = stamps.var(0, ddof=1)
        core = mean > np.percentile(mean, 99.0)
        excess = float((var[core] / np.maximum(mean[core], 1e-9)).mean())
        print(f"pair={pair} share={share}: "
              f"sigma_px mean={np.mean(sizes):.3f} "
              f"std={np.std(sizes):.3f}  centroid std={np.std(cxs):.3f} px"
              f"  pixel var/mean (core)={excess:.2f}")


if __name__ == "__main__":
    main()
