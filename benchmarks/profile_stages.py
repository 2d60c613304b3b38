"""Stage-level slope profiler for the pooled photon hot path.

Times each stage of the per-batch pipeline in isolation with the same
dynamic-trip-count fori_loop slope method bench.py uses (constant RPC /
dispatch overheads cancel in the K2-K1 slope).  Run on the real chip,
optionally filtering stages by substring:

    python benchmarks/profile_stages.py [stage-substring ...]

Round-2 numbers (v5e, 16.7M-photon batch, PAIR=4 block pairing):

    rows+objmap                ~40 ms     scatter-add        ~180 ms
    intrinsic(sersic/knots)    ~62 ms     disp-field conv x1  ~22 ms
    wl Chebyshev               ~free      silicon-displace    ~77 ms
    first-kick (6 layers, N/4) ~240 ms    silicon-full nsub=4 ~430 ms
    dcr+diffr+trace            ~90 ms     shoot_full composed ~490 ms

History note: the original interleaved jnp.repeat pairing cost ~200 ms
PER paired array (lane shuffles re-run in every consumer fusion) and
the per-photon wavelength table gather ~210 ms — both eliminated by the
block-paired layout + materialized Chebyshev rows (see
docs/performance.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

PAIR = 4
SHARE = int(os.environ.get("PROF_SHARE", "4"))


from _util import slope  # noqa: E402


def main():
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.photon_pooling import (batch_from_obj_map,
                                                build_obj_map,
                                                materialize_rows_T)
    from imsim_tpu.image.render import sample_intrinsic, shoot_full
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.batch import PhotonBatch
    from imsim_tpu.photons.optics_ops import (field_to_sensor,
                                              make_optics_context)
    from imsim_tpu.psf.atmosphere import (AtmConfig, first_kick_angles,
                                          make_screens, second_kick_table)
    from imsim_tpu.sensor.silicon import (SiliconParams,
                                          accumulate_silicon,
                                          apply_silicon_displacements,
                                          displacement_field,
                                          tree_ring_field)
    from imsim_tpu.sensor.simple import accumulate
    from imsim_tpu.sensor.treerings import TreeRings
    from imsim_tpu.utils.lookup import PolyCDF
    from bench import build_synthetic_host

    only = set(sys.argv[1:])
    N = 16_777_216
    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    ccd = get_camera("LsstCamSim")["R22_S11"]
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
    obj_map = jax.jit(build_obj_map,
                      static_argnames=("nb", "batch_size", "pair"))(
        cum_dev, jnp.int32(total), NB, N, PAIR)
    scene = host.scene

    def loop(body):
        @jax.jit
        def run(key, K, *args):
            def step(i, acc):
                return acc + body(jax.random.fold_in(key, i), *args)
            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
        return run

    # big arrays enter via jit ARGS, not closure constants (baked-in
    # constants exceed the tunnel's compile-request size limit)
    big = (obj_map, cum_dev, scene, screens, sk_poly, silicon, tel32,
           octx)

    def rows_of(key, omap, cum, scene, b=None):
        b = jax.random.randint(key, (), 0, NB) if b is None else b
        obj_idx, w = batch_from_obj_map(omap, jnp.int32(total), b, NB, N,
                                        PAIR)
        mat = jnp.concatenate([scene.params, scene.wl_cheb], axis=1)
        row = materialize_rows_T(mat, cum, b, NB, N, PAIR)
        return obj_idx, w, row

    def s_rows(key, omap, cum, scene, *_):
        obj_idx, w, row = rows_of(key, omap, cum, scene)
        return jnp.sum(row[0]) + jnp.sum(w) + jnp.sum(obj_idx)

    def s_intrinsic(key, omap, cum, scene, *_):
        obj_idx, w, row = rows_of(key, omap, cum, scene)
        dx, dy = sample_intrinsic(key, row, obj_idx, 1.0, scene.aux_cloud)
        return jnp.sum(dx) + jnp.sum(dy)

    def pupil_time(key, m):
        u1, u2 = jax.random.uniform(key, (2, m))
        r = jnp.sqrt(0.612**2 * 4.18**2 + u1 * (1 - 0.612**2) * 4.18**2)
        a = u2 * 2 * jnp.pi
        t = jax.random.uniform(jax.random.fold_in(key, 3), (m,)) * 30.0
        return r * jnp.cos(a), r * jnp.sin(a), t

    def s_firstkick(key, omap, cum, scene, screens, *_):
        m = N // PAIR
        pu, pv, t = pupil_time(key, m)
        thx = jax.random.uniform(jax.random.fold_in(key, 9), (m,)) * 0.01
        ddx, ddy = first_kick_angles(pu, pv, t, screens,
                                     theta_x=thx, theta_y=thx)
        return jnp.sum(ddx) + jnp.sum(ddy)

    def s_firstkick_strat(key, omap, cum, scene, screens, *_):
        m = N // PAIR
        pu, pv, t = pupil_time(key, m)
        thx = jax.random.uniform(jax.random.fold_in(key, 9), (m,)) * 0.01
        ddx, ddy = first_kick_angles(pu, pv, t, screens,
                                     theta_x=thx, theta_y=thx,
                                     share=SHARE)
        return jnp.sum(ddx) + jnp.sum(ddy)

    def s_trace(key, omap, cum, scene, screens, sk_poly, silicon, tel32,
                octx):
        pu, pv, t = pupil_time(key, N)
        thx = jax.random.uniform(jax.random.fold_in(key, 9), (N,)) * 0.01
        thy = jax.random.uniform(jax.random.fold_in(key, 11), (N,)) * 0.01
        wl = jax.random.uniform(jax.random.fold_in(key, 10), (N,),
                                minval=552.0, maxval=691.0)
        w = jnp.ones((N,), jnp.float32)
        x, y, dxdz, dydz, f = field_to_sensor(key, tel32, octx, thx, thy,
                                              pu, pv, wl, t, w)
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(dxdz) + jnp.sum(f)

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

    def s_scatter(key, *args):
        image = args[-1]
        return accumulate(make_batch(key), image)[2048, 2048]

    def s_dispfield(key, omap, cum, scene, screens, sk_poly, silicon,
                    tel32, octx, image):
        dx, dy = displacement_field(image, silicon)
        return dx[99, 99] + dy[5, 5] + jax.random.uniform(key, ())

    def s_sili_disp(key, omap, cum, scene, screens, sk_poly, silicon,
                    *_):
        ph = apply_silicon_displacements(key, make_batch(key), silicon,
                                         None, None)
        return jnp.sum(ph.x) + jnp.sum(ph.y) + jnp.sum(ph.flux)

    def s_silicon_full(key, omap, cum, scene, screens, sk_poly, silicon,
                       tel32, octx, image):
        img = accumulate_silicon(key, make_batch(key), image, silicon,
                                 nsub=4)
        return img[2048, 2048]

    def s_silicon_prod(key, omap, cum, scene, screens, sk_poly, silicon,
                       tel32, octx, image, trf):
        # Production formulation: tree rings folded as a static field,
        # absorption length prefetched (rides in the batch), so the
        # per-photon stage is depth + diffusion + BF continuity only.
        from imsim_tpu.sensor.silicon import (ABS_TABLE_MAX_NM,
                                              ABS_TABLE_MIN_NM,
                                              _table_lookup)
        ph = make_batch(key)
        labs = _table_lookup(
            silicon.abs_y, ABS_TABLE_MIN_NM,
            (ABS_TABLE_MAX_NM - ABS_TABLE_MIN_NM)
            / (silicon.abs_y.shape[0] - 1),
            ph.wavelength)
        ph = ph.replace(abs_len=labs)
        img = accumulate_silicon(key, ph, image, silicon, nsub=4,
                                 tr_field=trf)
        return img[2048, 2048]

    def s_shootfull(key, omap, cum, scene, screens, sk_poly, silicon,
                    tel32, octx):
        obj_idx, w, row = rows_of(key, omap, cum, scene)
        ph = shoot_full(key, scene, obj_idx, w, tel32, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row, pupil_pairing=PAIR)
        return (jnp.sum(ph.x) + jnp.sum(ph.y) + jnp.sum(ph.flux)
                + jnp.sum(ph.dxdz))

    def s_shootfull_strat(key, omap, cum, scene, screens, sk_poly,
                          silicon, tel32, octx):
        obj_idx, w, row = rows_of(key, omap, cum, scene)
        ph = shoot_full(key, scene, obj_idx, w, tel32, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row, pupil_pairing=PAIR, screen_share=SHARE)
        return (jnp.sum(ph.x) + jnp.sum(ph.y) + jnp.sum(ph.flux)
                + jnp.sum(ph.dxdz))

    def s_fused_presensor(key, omap, cum, scene, screens, sk_poly,
                          silicon, tel32, octx):
        # pre-sensor chain with the silicon tail FUSED into the Pallas
        # ray chain (the production formulation bench.py composes)
        obj_idx, w, row = rows_of(key, omap, cum, scene)
        ph = shoot_full(key, scene, obj_idx, w, tel32, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row, pupil_pairing=PAIR, screen_share=SHARE,
                        silicon=silicon,
                        si_key=jax.random.fold_in(key, 7))
        return jnp.sum(ph.x) + jnp.sum(ph.y) + jnp.sum(ph.flux)

    def s_prodbatch(key, omap, cum, scene, screens, sk_poly, silicon,
                    tel32, octx, image, trf):
        # EXACT bench.py batch body: fused shoot_full + pre-displaced
        # nsub=4 silicon accumulation with the folded tree-ring field.
        # Composed-minus-stages = overlap/composition loss.
        obj_idx, w, row = rows_of(key, omap, cum, scene)
        si_key = jax.random.fold_in(key, 7)
        ph = shoot_full(key, scene, obj_idx, w, tel32, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row, pupil_pairing=PAIR, screen_share=SHARE,
                        silicon=silicon, si_key=si_key)
        img = accumulate_silicon(si_key, ph, image, silicon, nsub=4,
                                 tr_field=trf, pre_displaced=True)
        return img[2048, 2048]

    image = jnp.zeros((ny, nx), jnp.float32)
    stages = [
        ("rows+objmap+wl", loop(s_rows), big),
        ("intrinsic(sersic/knots)", loop(s_intrinsic), big),
        ("first-kick(6 layers, N/PAIR)", loop(s_firstkick), big),
        ("first-kick stratified", loop(s_firstkick_strat), big),
        ("dcr+diffr+trace", loop(s_trace), big),
        ("scatter-add", loop(s_scatter), big + (image,)),
        ("disp-field conv x1", loop(s_dispfield), big + (image,)),
        ("silicon-displace only", loop(s_sili_disp), big),
        ("silicon-full nsub=4", loop(s_silicon_full), big + (image,)),
        ("silicon-full production", loop(s_silicon_prod),
         big + (image, tuple(jnp.asarray(a) for a in
                             tree_ring_field(silicon, image.shape)))),
        ("shoot_full composed", loop(s_shootfull), big),
        ("shoot_full strat-share", loop(s_shootfull_strat), big),
        ("shoot_full fused-silicon", loop(s_fused_presensor), big),
        ("production-batch (bench body)", loop(s_prodbatch),
         big + (image, tuple(jnp.asarray(a) for a in
                             tree_ring_field(silicon, image.shape)))),
    ]
    print(f"N = {N}, PAIR = {PAIR}")
    for name, fn, args in stages:
        if only and not any(o in name for o in only):
            continue
        dt = slope(fn, args)
        print(f"{name:30s} {dt*1e3:9.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
