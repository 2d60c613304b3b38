"""A/B probe of individual hot-path optimizations on the real chip.
Usage: timeout 590 python benchmarks/probe2.py cumsum gather nopack ...
Variants:
  new     — current full path (materialized rows, packed screens)
  gather  — params via row-gather instead of scatter+cumsum
  nopack  — f32x2 screen gathers instead of packed u32
  notrees — tree rings via table gather instead of 40-sinusoid analytic
"""
import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(variants):
    sys.path.insert(0, ".")
    from bench import build_synthetic_host
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.photon_pooling import (batch_from_obj_map,
                                                build_obj_map,
                                                materialize_rows)
    from imsim_tpu.image.render import shoot_full
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import make_optics_context
    from imsim_tpu.psf.atmosphere import (AtmConfig, make_screens,
                                          second_kick_table)
    from imsim_tpu.sensor.silicon import SiliconParams, accumulate_silicon
    from imsim_tpu.sensor.treerings import TreeRings
    from imsim_tpu.utils.lookup import PolyCDF

    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    host = build_synthetic_host(fac, ccd)
    octx = make_optics_context(fac, ccd)
    tel32 = fac.telescope.for_detector("R22_S11")
    atm_cfg = AtmConfig(fwhm=0.7)
    screens = make_screens(42 + 271828, atm_cfg)
    sk_poly, _ = PolyCDF.fit(second_kick_table(atm_cfg, 622.0))
    tr = TreeRings().get("R22_S11")
    sil_new = SiliconParams.make(treering_model=tr)
    sil_tab = SiliconParams.make(treering_center=tr.center,
                                 treering_profile=tr.profile)
    nx, ny = ccd.bounds.width, ccd.bounds.height
    NB = 6
    N = 16_777_216
    counts = host.flux.astype(np.int64)
    total = int(counts.sum())
    cum = np.zeros(host.scene.n, np.int32)
    cum[:host.n_objects] = np.cumsum(counts)
    cum[host.n_objects:] = cum[host.n_objects - 1]
    cum_dev = jnp.asarray(cum)
    obj_map = jax.jit(build_obj_map, static_argnames=("nb", "batch_size"))(
        cum_dev, jnp.int32(total), NB, N)
    scr_nopack = dataclasses.replace(screens, packed=None)

    from imsim_tpu.sensor.simple import accumulate

    def make_run(use_cumsum, packed, sil, use_screens=True):
        # screens/silicon must be ARGUMENTS: closed-over device arrays
        # become MLIR constant literals (192 MB -> tunnel HTTP 413)
        @jax.jit
        def run(key, scene, omap, cumv, scr, silv, K):
            image = jnp.zeros((ny, nx), jnp.float32)

            def batch(b, img):
                obj_idx, w = batch_from_obj_map(omap, jnp.int32(total),
                                                b % NB, NB, N)
                row = materialize_rows(scene.params, cumv, b % NB, NB,
                                       N) if use_cumsum else None
                kb = jax.random.fold_in(key, b)
                ph = shoot_full(kb, scene, obj_idx, w, tel32, octx,
                                screens=scr if use_screens else None,
                                sk_table=sk_poly,
                                exptime=30.0, row=row)
                if silv is None:
                    return accumulate(ph, img)
                return accumulate_silicon(jax.random.fold_in(kb, 7), ph,
                                          img, silv, nsub=4)

            image = jax.lax.fori_loop(0, K, batch, image)
            return image[2048, 2048]

        return run

    cfgs = {
        "new": (True, True, sil_new),
        "gather": (False, True, sil_new),
        "nopack": (True, False, sil_new),
        "notrees": (True, True, sil_tab),
        "nosil": (True, False, None),
    }
    for v in variants:
        if v == "noscr":
            use_cumsum, packed, sil = True, False, sil_new
            run = make_run(use_cumsum, packed, sil, use_screens=False)
        else:
            use_cumsum, packed, sil = cfgs[v]
            run = make_run(use_cumsum, packed, sil)
        scr = screens if packed else scr_nopack
        args = (jax.random.PRNGKey(1), host.scene, obj_map, cum_dev,
                scr, sil)
        float(run(*args, jnp.int32(1)))
        t0 = time.time(); float(run(*args, jnp.int32(1))); t1 = time.time()
        float(run(*args, jnp.int32(5))); t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / 4.0
        print(f"{v:8s}: {per*1e3:8.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["new"])
