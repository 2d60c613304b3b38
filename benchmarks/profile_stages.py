"""Stage-level slope profiler for the pooled photon hot path.

Times each stage of the per-batch pipeline in isolation with the same
dynamic-trip-count fori_loop slope method bench.py uses (constant RPC /
dispatch overheads cancel in the K2-K1 slope).  Run on the real chip:

    python benchmarks/profile_stages.py [N_photons]

Prints per-stage seconds per 16.7M-photon batch so optimization effort
lands where the time is.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def slope(fn, args, k1=1, k5=5):
    """Compile once; return per-iteration seconds via the slope method."""
    def timed(K, seed):
        t0 = time.time()
        v = float(fn(jax.random.PRNGKey(seed), jnp.int32(K), *args))
        assert np.isfinite(v), v
        return time.time() - t0

    timed(k1, 0)
    t1 = timed(k1, 1)
    t5 = timed(k5, 2)
    return max((t5 - t1) / (k5 - k1), 1e-5)


def main():
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.photon_pooling import (batch_from_obj_map,
                                                build_obj_map,
                                                materialize_rows)
    from imsim_tpu.image.render import (sample_intrinsic, _interp_rows2,
                                        shoot_full)
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons import profiles as P
    from imsim_tpu.photons.optics_ops import (field_to_sensor,
                                              make_optics_context)
    from imsim_tpu.psf.atmosphere import (AtmConfig, first_kick_angles,
                                          make_screens, second_kick_table)
    from imsim_tpu.sensor.silicon import (SiliconParams, accumulate_silicon,
                                          displacement_field,
                                          apply_silicon_displacements)
    from imsim_tpu.sensor.simple import accumulate
    from imsim_tpu.sensor.treerings import TreeRings
    from imsim_tpu.utils.lookup import PolyCDF
    from imsim_tpu.photons.batch import PhotonBatch
    from bench import build_synthetic_host

    N = 16_777_216
    only = set(a for a in sys.argv[1:])
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
    silicon = SiliconParams.make(treering_model=TreeRings().get("R22_S11"))
    nx, ny = ccd.bounds.width, ccd.bounds.height

    NB = 6
    counts = host.flux.astype(np.int64)
    total = int(counts.sum())
    cum = np.zeros(host.scene.n, np.int32)
    cum[:host.n_objects] = np.cumsum(counts)
    cum[host.n_objects:] = cum[host.n_objects - 1]
    cum_dev = jnp.asarray(cum)
    obj_map = jax.jit(build_obj_map, static_argnames=("nb", "batch_size"))(
        cum_dev, jnp.int32(total), NB, N)
    scene = host.scene

    def loop(body):
        @jax.jit
        def run(key, K, *args):
            def step(i, acc):
                return acc + body(jax.random.fold_in(key, i), *args)
            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
        return run

    # ---- stage closures: big arrays come in via *args so they are jit
    # ARGUMENTS, not baked-in constants (constants blow the remote
    # compile-request size limit on the tunnel) ----------
    big = (obj_map, cum_dev, scene, screens, sk_poly, silicon, tel32, octx)

    def s_rows(key, omap, cum, scene, *_):
        b = jax.random.randint(key, (), 0, NB)
        obj_idx, w = batch_from_obj_map(omap, jnp.int32(total), b, NB, N)
        row = materialize_rows(scene.params, cum, b, NB, N)
        return row[123, 0] + w[77] + obj_idx[55].astype(jnp.float32)

    def s_intrinsic(key, omap, cum, scene, *_):
        b = jax.random.randint(key, (), 0, NB)
        obj_idx, w = batch_from_obj_map(omap, jnp.int32(total), b, NB, N)
        row = materialize_rows(scene.params, cum, b, NB, N)
        dx, dy = sample_intrinsic(key, row, obj_idx, 1.0, scene.aux_cloud)
        return dx[3] + dy[9]

    def s_wavelength(key, omap, cum, scene, *_):
        u = jax.random.uniform(key, (N,))
        idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0,
                                 host.n_objects)
        wl, labs = _interp_rows2(scene.wl_icdf, scene.labs_icdf, idx, u) \
            if scene.labs_icdf is not None else (None, None)
        if wl is None:
            from imsim_tpu.image.render import _interp_rows
            wl = _interp_rows(scene.wl_icdf, idx, u)
            return wl[5]
        return wl[5] + labs[6]

    def pupil_time(key, m):
        u1, u2 = jax.random.uniform(key, (2, m))
        r = jnp.sqrt(0.612**2 * 4.18**2 + u1 * (1 - 0.612**2) * 4.18**2)
        a = u2 * 2 * jnp.pi
        t = jax.random.uniform(jax.random.fold_in(key, 3), (m,)) * 30.0
        return r * jnp.cos(a), r * jnp.sin(a), t

    def s_firstkick(key, omap, cum, scene, screens, *_):
        m = N // 2
        pu, pv, t = pupil_time(key, m)
        thx = jax.random.uniform(jax.random.fold_in(key, 9), (m,)) * 0.01
        ddx, ddy = first_kick_angles(pu, pv, t, screens,
                                     theta_x=thx, theta_y=thx)
        return ddx[2] + ddy[4]

    def s_secondkick(key, omap, cum, scene, screens, sk_poly, *_):
        skx, sky = P.sample_radial(key, N, sk_poly)
        return skx[2] + sky[4]

    def s_trace(key, omap, cum, scene, screens, sk_poly, silicon, tel32,
                octx):
        pu, pv, t = pupil_time(key, N)
        thx = jax.random.uniform(jax.random.fold_in(key, 9), (N,)) * 0.01
        wl = jax.random.uniform(jax.random.fold_in(key, 10), (N,),
                                minval=552.0, maxval=691.0)
        w = jnp.ones((N,), jnp.float32)
        x, y, dxdz, dydz, f = field_to_sensor(key, tel32, octx, thx, thx,
                                              pu, pv, wl, t, w)
        return x[0] + y[1] + dxdz[2] + f[3]

    def make_batch(key):
        z = jnp.zeros((N,), jnp.float32)
        x = jax.random.uniform(key, (N,), minval=0.0, maxval=nx * 1.0)
        y = jax.random.uniform(jax.random.fold_in(key, 1), (N,),
                               minval=0.0, maxval=ny * 1.0)
        wl = jax.random.uniform(jax.random.fold_in(key, 2), (N,),
                                minval=552.0, maxval=691.0)
        return PhotonBatch(x=x, y=y, flux=jnp.ones((N,), jnp.float32),
                           wavelength=wl, dxdz=z, dydz=z, pupil_u=z,
                           pupil_v=z, time=z, abs_len=None)

    def s_scatter(key, omap, cum, scene, screens, sk_poly, silicon,
                  tel32, octx, image):
        ph = make_batch(key)
        img = accumulate(ph, image)
        return img[2048, 2048]

    def s_dispfield(key, omap, cum, scene, screens, sk_poly, silicon,
                    tel32, octx, image):
        dx, dy = displacement_field(image, silicon)
        return dx[99, 99] + dy[5, 5] + jax.random.uniform(key, ())

    def s_silicon_full(key, omap, cum, scene, screens, sk_poly, silicon,
                       tel32, octx, image):
        ph = make_batch(key)
        img = accumulate_silicon(key, ph, image, silicon, nsub=4)
        return img[2048, 2048]

    def s_sili_disp_only(key, omap, cum, scene, screens, sk_poly,
                         silicon, *_):
        ph = make_batch(key)
        ph = apply_silicon_displacements(key, ph, silicon, None, None)
        return ph.x[7] + ph.y[8] + ph.flux[9]

    def s_shootfull(key, omap, cum, scene, screens, sk_poly, silicon,
                    tel32, octx):
        b = jax.random.randint(key, (), 0, NB)
        obj_idx, w = batch_from_obj_map(omap, jnp.int32(total), b, NB, N)
        row = materialize_rows(scene.params, cum, b, NB, N)
        ph = shoot_full(key, scene, obj_idx, w, tel32, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row)
        return ph.x[0] + ph.flux[1]

    image = jnp.zeros((ny, nx), jnp.float32)

    def s_variant(which):
        """Minimal perturbations of compose:base to find the 650 ms."""
        from imsim_tpu.image.scene import COL_X, COL_Y

        def body(key, omap, cum, scene, screens, sk_poly, silicon, tel32,
                 octx):
            keys = jax.random.split(key, 8)
            b = jax.random.randint(key, (), 0, NB)
            obj_idx, w = batch_from_obj_map(omap, jnp.int32(total), b, NB, N)
            row = materialize_rows(scene.params, cum, b, NB, N)
            extra = jnp.float32(0.0)
            if which == "randth":       # rows computed but theta random
                thx = jax.random.uniform(keys[6], (N,)) * 0.01
                thy = jax.random.uniform(keys[7], (N,)) * 0.01
                extra = jnp.sum(row[:, COL_X]) * 1e-9
            else:
                thx = row[:, COL_X]
                thy = row[:, COL_Y]
            if which == "norep":        # full-N pupil, no repeat
                pu, pv, t = pupil_time(keys[2], N)
            elif which == "blockpair":  # pair (s, s+m): tile, no shuffle
                m = N // 2
                u1, u2 = jax.random.uniform(keys[2], (2, m))
                r = jnp.sqrt(0.612**2 * 4.18**2
                             + u1 * (1 - 0.612**2) * 4.18**2)
                a = u2 * 2 * jnp.pi
                blk = lambda q: jnp.concatenate([q, q])
                pu = blk(r * jnp.cos(a))
                pv = blk(r * jnp.sin(a))
                t = blk(jax.random.uniform(keys[3], (m,)) * 30.0)
            elif which == "repbar":     # interleave, materialized once
                m = N // 2
                u1, u2 = jax.random.uniform(keys[2], (2, m))
                r = jnp.sqrt(0.612**2 * 4.18**2
                             + u1 * (1 - 0.612**2) * 4.18**2)
                a = u2 * 2 * jnp.pi
                rep = lambda q: jnp.repeat(q, 2, total_repeat_length=N)
                pu, pv, t = jax.lax.optimization_barrier(
                    (rep(r * jnp.cos(a)), rep(r * jnp.sin(a)),
                     rep(jax.random.uniform(keys[3], (m,)) * 30.0)))
            else:
                m = N // 2
                u1, u2 = jax.random.uniform(keys[2], (2, m))
                r = jnp.sqrt(0.612**2 * 4.18**2
                             + u1 * (1 - 0.612**2) * 4.18**2)
                a = u2 * 2 * jnp.pi
                rep = lambda q: jnp.repeat(q, 2, total_repeat_length=N)
                pu = rep(r * jnp.cos(a))
                pv = rep(r * jnp.sin(a))
                t = rep(jax.random.uniform(keys[3], (m,)) * 30.0)
            wl = jax.random.uniform(keys[1], (N,), minval=552.0,
                                    maxval=691.0)
            if which == "wones":
                w = jnp.ones((N,), jnp.float32)
            x, y, dxdz, dydz, f = field_to_sensor(keys[5], tel32, octx,
                                                  thx, thy, pu, pv, wl,
                                                  t, w)
            return (jnp.sum(x) + jnp.sum(y) + jnp.sum(dxdz)
                    + jnp.sum(f) + extra)
        return body

    def s_compose(do_intr, do_wl, do_fk, do_sk, do_trace, BARRIER=False):
        """shoot_full's exact body with stages toggled, to locate the
        composition overhead (isolated stages sum to ~1/3 of composed)."""
        from imsim_tpu.image.scene import COL_X, COL_Y

        def body(key, omap, cum, scene, screens, sk_poly, silicon, tel32,
                 octx):
            arcsec = jnp.float32(np.pi / 180 / 3600)
            keys = jax.random.split(key, 8)
            b = jax.random.randint(key, (), 0, NB)
            obj_idx, w = batch_from_obj_map(omap, jnp.int32(total), b, NB, N)
            row = materialize_rows(scene.params, cum, b, NB, N)
            if BARRIER:
                row, obj_idx, w = jax.lax.optimization_barrier(
                    (row, obj_idx, w))
            thx = row[:, COL_X]
            thy = row[:, COL_Y]
            if do_intr:
                dx_as, dy_as = sample_intrinsic(keys[0], row, obj_idx, 1.0,
                                                scene.aux_cloud)
                thx = thx + dx_as * arcsec
                thy = thy + dy_as * arcsec
            if do_wl:
                u = jax.random.uniform(keys[1], (N,))
                wl, labs = _interp_rows2(scene.wl_icdf, scene.labs_icdf,
                                         obj_idx, u)
            else:
                wl = jax.random.uniform(keys[1], (N,), minval=552.0,
                                        maxval=691.0)
                labs = wl * 0 + 10.0
            m = N // 2
            u1, u2 = jax.random.uniform(keys[2], (2, m))
            r = jnp.sqrt(0.612**2 * 4.18**2 + u1 * (1 - 0.612**2) * 4.18**2)
            a = u2 * 2 * jnp.pi
            pu_h = r * jnp.cos(a)
            pv_h = r * jnp.sin(a)
            t_h = jax.random.uniform(keys[3], (m,)) * 30.0
            rep = lambda x: jnp.repeat(x, 2, total_repeat_length=N)
            if do_fk:
                ddx, ddy = first_kick_angles(pu_h, pv_h, t_h, screens,
                                             theta_x=thx[::2],
                                             theta_y=thy[::2])
                thx = thx + rep(ddx)
                thy = thy + rep(ddy)
            pu = rep(pu_h)
            pv = rep(pv_h)
            t = rep(t_h)
            if do_sk:
                skx, sky = P.sample_radial(keys[4], N, sk_poly)
                thx = thx + skx * arcsec
                thy = thy + sky * arcsec
            if do_trace:
                x, y, dxdz, dydz, f = field_to_sensor(keys[5], tel32, octx,
                                                      thx, thy, pu, pv, wl,
                                                      t, w)
            else:
                x, y, dxdz, dydz, f = thx, thy, thx * 0, thy * 0, w
            return (jnp.sum(x) + jnp.sum(y) + jnp.sum(dxdz)
                    + jnp.sum(f) + jnp.sum(labs))
        return body

    stages = [
        ("rows+objmap", loop(s_rows), big),
        ("intrinsic(sersic/knots)", loop(s_intrinsic), big),
        ("wavelength-gather", loop(s_wavelength), big),
        ("first-kick(6 layers, N/2)", loop(s_firstkick), big),
        ("second-kick poly", loop(s_secondkick), big),
        ("dcr+diffr+trace", loop(s_trace), big),
        ("scatter-add", loop(s_scatter), big + (image,)),
        ("disp-field conv x1", loop(s_dispfield), big + (image,)),
        ("silicon-displace only", loop(s_sili_disp_only), big),
        ("silicon-full nsub=4", loop(s_silicon_full), big + (image,)),
        ("shoot_full (all pre-sensor)", loop(s_shootfull), big),
        ("variant:randth", loop(s_variant("randth")), big),
        ("variant:blockpair", loop(s_variant("blockpair")), big),
        ("variant:repbar", loop(s_variant("repbar")), big),
        ("variant:norep", loop(s_variant("norep")), big),
        ("variant:wones", loop(s_variant("wones")), big),
        ("variant:asis", loop(s_variant("asis")), big),
        ("compose:base(rows+trace)",
         loop(s_compose(0, 0, 0, 0, 1)), big),
        ("compose:base+barrier",
         loop(s_compose(0, 0, 0, 0, 1, True)), big),
        ("compose:all+barrier",
         loop(s_compose(1, 1, 1, 1, 1, True)), big),
        ("compose:+intr", loop(s_compose(1, 0, 0, 0, 1)), big),
        ("compose:+wl", loop(s_compose(0, 1, 0, 0, 1)), big),
        ("compose:+fk", loop(s_compose(0, 0, 1, 0, 1)), big),
        ("compose:+fk+wl", loop(s_compose(0, 1, 1, 0, 1)), big),
        ("compose:all", loop(s_compose(1, 1, 1, 1, 1)), big),
        ("compose:all-notrace", loop(s_compose(1, 1, 1, 1, 0)), big),
        ("compose:base-notrace", loop(s_compose(0, 0, 0, 0, 0)), big),
    ]
    print(f"N = {N}")
    for name, fn, args in stages:
        if only and not any(o in name for o in only):
            continue
        dt = slope(fn, args)
        print(f"{name:30s} {dt*1e3:9.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
