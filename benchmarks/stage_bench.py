"""Marginal-cost breakdown of the pooled batch step on the real TPU.

Runs the full-physics batch step with individual stages disabled and
prints the slope-method time per 16.7M-photon batch for each variant.
Usage:  timeout 550 python benchmarks/stage_bench.py full no_screens ...
Variants: full, no_params, no_intrinsic, no_wl, no_screens, no_sk,
          no_dcr, no_trace, no_silicon, no_scatter, half_screens
"""
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
                                                build_obj_map)
    from imsim_tpu.image.scene import COL_X, COL_Y
    from imsim_tpu.image.render import sample_intrinsic, _interp_rows
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import (field_to_sensor,
                                              make_optics_context)
    from imsim_tpu.photons import profiles as P
    from imsim_tpu.photons.batch import PhotonBatch
    from imsim_tpu.psf.atmosphere import (AtmConfig, first_kick_angles,
                                          make_screens, second_kick_table)
    from imsim_tpu.sensor.silicon import SiliconParams, accumulate_silicon
    from imsim_tpu.sensor.simple import accumulate
    from imsim_tpu.sensor.treerings import TreeRings
    from imsim_tpu.utils.lookup import UniformTable

    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    host = build_synthetic_host(fac, ccd)
    octx = make_optics_context(fac, ccd)
    tel32 = fac.telescope.for_detector("R22_S11")
    atm_cfg = AtmConfig(fwhm=0.7)
    screens = make_screens(42 + 271828, atm_cfg)
    sk0 = second_kick_table(atm_cfg, 622.0)
    sk_y = jnp.asarray(sk0.y)
    tr = TreeRings().get("R22_S11")
    silicon = SiliconParams.make(treering_center=tr.center,
                                 treering_profile=tr.profile)
    nx, ny = ccd.bounds.width, ccd.bounds.height
    NB = 6
    N = 16_777_216
    counts = host.flux.astype(np.int64)
    total = int(counts.sum())
    cum = np.zeros(host.scene.n, np.int32)
    cum[:host.n_objects] = np.cumsum(counts)
    cum[host.n_objects:] = cum[host.n_objects - 1]
    obj_map = jax.jit(build_obj_map, static_argnames=("nb", "batch_size"))(
        jnp.asarray(cum), jnp.int32(total), NB, N)

    def make_step(variant):
        arcsec = jnp.float32(np.pi / 180 / 3600)

        @jax.jit
        def run(key, scene, omap, K):
            sk = UniformTable(0.0, 1.0 / (sk_y.shape[0] - 1), sk_y)
            image = jnp.zeros((ny, nx), jnp.float32)

            def batch(b, img):
                obj_idx, w = batch_from_obj_map(omap, jnp.int32(total),
                                                b % NB, NB, N)
                kb = jax.random.fold_in(key, b)
                keys = jax.random.split(kb, 8)
                if variant == "no_params":
                    row = jnp.broadcast_to(scene.params[0][:, None],
                                           (10, N))
                else:
                    row = scene.params[obj_idx].T
                thx = row[COL_X]
                thy = row[COL_Y]
                if variant != "no_intrinsic":
                    dxa, dya = sample_intrinsic(keys[0], row, obj_idx,
                                                pixel_scale=1.0,
                                                aux_cloud=scene.aux_cloud)
                    thx = thx + dxa * arcsec
                    thy = thy + dya * arcsec
                if variant == "no_wl":
                    wl = jnp.full((N,), 622.0)
                else:
                    u = jax.random.uniform(keys[1], (N,))
                    wl = _interp_rows(scene.wl_icdf, obj_idx, u)
                u1, u2 = jax.random.uniform(keys[2], (2, N))
                r = jnp.sqrt(0.612**2 * 4.18**2
                             + u1 * (1 - 0.612**2) * 4.18**2)
                a = u2 * 2 * jnp.pi
                pu = r * jnp.cos(a)
                pv = r * jnp.sin(a)
                t = jax.random.uniform(keys[3], (N,)) * 30.0
                if variant == "half_screens":
                    for i in (0, 1, 2):
                        pass
                if variant != "no_screens":
                    ddx, ddy = first_kick_angles(pu, pv, t, screens,
                                                 theta_x=thx, theta_y=thy)
                    thx = thx + ddx
                    thy = thy + ddy
                if variant != "no_sk":
                    skx, sky2 = P.sample_radial(keys[4], N, sk)
                    thx = thx + skx * arcsec
                    thy = thy + sky2 * arcsec
                if variant == "no_trace":
                    xp = thx / arcsec / 0.2 + 2048.0
                    yp = thy / arcsec / 0.2 + 2048.0
                    ph = PhotonBatch(x=xp, y=yp, flux=w, wavelength=wl,
                                     dxdz=jnp.zeros_like(xp),
                                     dydz=jnp.zeros_like(xp),
                                     pupil_u=pu, pupil_v=pv, time=t)
                else:
                    xp, yp, dxdz, dydz, fl = field_to_sensor(
                        keys[5], tel32, octx, thx, thy, pu, pv, wl, t, w,
                        apply_dcr=(variant != "no_dcr"))
                    ph = PhotonBatch(x=xp, y=yp, flux=fl, wavelength=wl,
                                     dxdz=dxdz, dydz=dydz, pupil_u=pu,
                                     pupil_v=pv, time=t)
                if variant == "no_scatter":
                    return img.at[0, 0].add(jnp.sum(ph.x + ph.flux))
                if variant == "no_silicon":
                    return accumulate(ph, img)
                return accumulate_silicon(jax.random.fold_in(kb, 7), ph,
                                          img, silicon, nsub=4)

            image = jax.lax.fori_loop(0, K, batch, image)
            return image[2048, 2048] + image[0, 0]

        return run

    for v in variants:
        run = make_step(v)
        args = (jax.random.PRNGKey(1), host.scene, obj_map)
        float(run(*args, jnp.int32(1)))
        t0 = time.time(); float(run(*args, jnp.int32(1))); t1 = time.time()
        float(run(*args, jnp.int32(5))); t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / 4.0
        print(f"{v:14s}: {per*1e3:8.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["full"])
