"""Headline benchmark: photon-shot 4Kx4K single-CCD visit, FULL physics.

The BASELINE.json north-star workload: ~1e5 objects (stars + Sersic
galaxies + knots), ~1e8 photons total, through the COMPLETE chain —
atmospheric phase screens (first kick) + second kick, DCR, spider
diffraction, 12-surface raytrace, silicon sensor (conversion depth,
diffusion, tree rings, brighter-fatter with recalc cadence), full-frame
sky with Poisson noise — on one TPU chip.  Target < 10 s wall-clock.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = 10s / measured wall-clock (>1 beats the target).
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: the bench programs are identical
# between runs, but a cold compile over the axon tunnel has taken
# 10+ minutes on a bad day.  Slope timing is unaffected (compiles
# happen before the timed region either way).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def build_synthetic_host(fac, ccd, n_obj=100_000, total_photons=1.0e8,
                         seed=0, n_bright=24):
    """Synthetic visit field: ~1e5 faint/medium objects carrying
    total_photons through the pooled photon path, plus n_bright
    saturating stars (1e6..2e7 photons) that classify into the FFT
    branch (peak SB > the 2e5 e-/px template threshold) — so the
    benchmark covers BOTH rendering modes like a real visit."""
    from imsim_tpu.image.scene import DeviceScene, SceneHost, WL_CDF_K

    rng = np.random.default_rng(seed)
    raw = 10 ** rng.uniform(0.0, 2.4, n_obj) ** 1.35
    flux = raw / raw.sum() * total_photons
    flux = rng.poisson(np.clip(flux, 0, None)).astype(np.float64)
    bright = 10 ** rng.uniform(6.0, 7.3, n_bright)
    flux[:n_bright] = bright      # brightest first (tables sort by mag)

    t = rng.uniform(0, 1, n_obj)
    obj_type = np.where(t < 0.25, 0, np.where(t < 0.95, 1, 2)).astype(np.int32)
    obj_type[:n_bright] = 0       # bright objects are stars

    nx, ny = ccd.bounds.width, ccd.bounds.height
    x = rng.uniform(0, nx, n_obj)
    y = rng.uniform(0, ny, n_obj)
    wcs = fac.get_wcs(ccd)
    ra, dec = wcs.xy_to_radec(x, y)
    thx, thy = fac.icrf_to_field(ra, dec)

    hlr = np.clip(rng.lognormal(np.log(0.35), 0.6, n_obj), 0.05, 3.0)
    srs_n = np.where(obj_type == 2, 30.0,
                     np.clip(rng.normal(1.5, 0.9, n_obj), 0.3, 6.2))
    q = rng.uniform(0.3, 1.0, n_obj)
    beta = rng.uniform(0, np.pi, n_obj)
    wl = np.linspace(552.0, 691.0, WL_CDF_K).astype(np.float32)

    n_pad = int(2 ** np.ceil(np.log2(n_obj)))

    def pad(a, fill=0.0):
        out = np.full(n_pad, fill, np.float32)
        out[:n_obj] = a
        return out

    scene = DeviceScene.from_columns(
        x=pad(thx), y=pad(thy), obj_type=pad(obj_type),
        p0=pad(hlr), p1=pad(srs_n, 1.0), p2=pad(q, 1.0), p3=pad(beta),
        g1=pad(rng.normal(0, 0.02, n_obj)),
        g2=pad(rng.normal(0, 0.02, n_obj)),
        mu=pad(1.0 + rng.normal(0, 0.03, n_obj), 1.0),
        wl_icdf=np.broadcast_to(wl, (n_pad, WL_CDF_K)),
    )
    return SceneHost(scene=scene, flux=flux, nominal_flux=flux,
                     n_objects=n_obj)


def bench_visit(n_photons_per_ccd=1.0e8, obj_per_ccd=12_000,
                outdir=None):
    """Production wall-clock: a full 9-CCD ComCam visit through
    `run_visit_iter` — instance-catalog parse -> per-CCD prep (WCS,
    scene build, SED photometry; prefetched on a host thread) ->
    pooled photon render -> readout -> RICE-compressed amp FITS +
    eimage + truth-catalog IO — measured twice end-to-end; the second
    pass (compiled kernels + warm caches, the steady state of batch
    production via `imsim_tpu --visits`) is the headline number.
    VERDICT r3 item 10: records what the design notes claim about host
    prep/IO overlap with real files on disk.

    Run manually:  python bench.py --visit
    """
    import shutil
    import tempfile

    from imsim_tpu.config.runner import run_visit_iter

    rng = np.random.default_rng(7)
    work = tempfile.mkdtemp(prefix="bench_visit_")
    try:
        sed_dir = os.path.join(work, "seds", "flatSED")
        os.makedirs(sed_dir)
        w = np.linspace(300, 1150, 200)
        np.savetxt(os.path.join(sed_dir, "sed_flat.txt"),
                   np.column_stack([w, np.ones_like(w)]))
        # ComCam: 9 CCDs in a ~0.68 deg square; spread objects over it.
        # magnorm tuned so the flat SED's r-band rate carries the target
        # photon budget per CCD with a realistic bright tail.
        n_obj = 9 * obj_per_ccd
        lines = [
            "rightascension 30.0", "declination -20.0", "mjd 60674.2",
            "filter 2", "seeing 0.7", "vistime 30.0", "rottelpos 0.0",
            "obshistid 9100", "altitude 60.0",
        ]
        # photons/object ~ power law; normalize to the per-CCD budget
        raw = 10 ** rng.uniform(0.0, 2.2, n_obj) ** 1.35
        phot = raw / raw.sum() * (9 * n_photons_per_ccd)
        # magnorm that yields `phot` photons in 30 s through the actual
        # photometry chain (flat f_lambda SED, magnorm-0 normalization
        # at 500 nm, r band, full aperture)
        from imsim_tpu.catalog.bandpass import rubin_bandpass
        from imsim_tpu.catalog.instcat import RUBIN_AREA
        from imsim_tpu.catalog.sed import SED

        sed0 = SED.from_flambda(w, np.ones_like(w)).normalized_magnorm0()
        bp = rubin_bandpass("r")
        rate0 = bp.photon_rate(sed0.wave, sed0.fphot, RUBIN_AREA, 30.0)
        mag = -2.5 * np.log10(np.maximum(phot, 10.0) / rate0)
        half = 0.68 / 2.0
        ra = 30.0 + rng.uniform(-half, half, n_obj) / np.cos(
            np.radians(-20.0))
        dec = -20.0 + rng.uniform(-half, half, n_obj)
        gal = rng.uniform(size=n_obj) < 0.7
        for i in range(n_obj):
            if gal[i]:
                lines.append(
                    f"object {i} {ra[i]:.6f} {dec[i]:.6f} {mag[i]:.3f} "
                    "flatSED/sed_flat.txt 0 0 0 0 0 0 "
                    "sersic2d 1.2 0.8 30.0 1.5 none CCM 0.02 3.1")
            else:
                lines.append(
                    f"object {i} {ra[i]:.6f} {dec[i]:.6f} {mag[i]:.3f} "
                    "flatSED/sed_flat.txt 0 0 0 0 0 0 point none none")
        cat = os.path.join(work, "visit_cat.txt")
        with open(cat, "w") as f:
            f.write("\n".join(lines) + "\n")

        out = outdir or os.path.join(work, "out")
        extra = [a for a in os.environ.get(
            "BENCH_VISIT_OVERRIDES", "").split(";") if a]
        overrides = extra + [
            f"input.instance_catalog.file_name={cat}",
            f"input.instance_catalog.sed_dir={os.path.join(work, 'seds')}",
            "output.camera=LsstComCamSim",
            "output.dir=" + out,
            "output.det_num=" + os.environ.get("BENCH_VISIT_DETS", "[0,1,2,3,4,5,6,7,8]"),
            "output.file_name=eimage_{det_name}.fits",
            "output.readout.file_name=amp_{det_name}.fits",
            "output.truth.file_name=centroid_{det_name}.txt",
        ]

        def one_pass(extra_overrides=()):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            n_ccd = 0
            for r in run_visit_iter({"template": "imsim-config-instcat"},
                                    overrides=overrides
                                    + list(extra_overrides)):
                n_ccd += 1
            return time.time() - t0, n_ccd

        # Overlap A/B (VERDICT r4 item 7): the docs claim host prep and
        # readout/FITS IO overlap the device pipeline.  Measure it:
        # identical warm passes with the overlap machinery on
        # (prefetch thread + pipelined IO pool) vs off (everything
        # serialized on the render thread).  off - on = the host/IO
        # work that the overlap actually hides per visit.
        from imsim_tpu.config import runner as runner_mod

        ON = ("output.prefetch=true", "output.io_workers=2")
        OFF = ("output.prefetch=false", "output.io_workers=0")
        cold, n_ccd = one_pass(ON)
        warm, _ = one_pass(ON)
        runner_mod.reset_host_timers()
        warm_off, _ = one_pass(OFF)
        host = dict(runner_mod.HOST_TIMERS)  # serial pass: all of this
        # sat on the critical path; with prefetch+io_workers it runs on
        # worker threads instead (the overlap-hideable host work).
        result = {
            "metric": "comcam_visit_production_wallclock",
            "value": round(warm, 3),
            "unit": "seconds/visit end-to-end, %d CCDs, %.1e obj, "
                    "%.1e photons/CCD (catalog parse + prep + render + "
                    "readout + RICE/FITS+truth IO; cold first pass "
                    "incl. compiles %.1f s; overlap off %.1f s; "
                    "overlap-hideable host work: prep %.1f s + "
                    "RICE/FITS IO %.1f s per visit)"
                    % (n_ccd, float(n_obj), n_photons_per_ccd, cold,
                       warm_off, host["prep_s"], host["io_s"]),
            "vs_baseline": round(9 * 10.0 / warm, 3),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main(compile_only=False):
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.ccd_render import _add_sky_and_noise
    from imsim_tpu.image.photon_pooling import (batch_from_obj_map,
                                                build_obj_map,
                                                materialize_rows_T)
    from imsim_tpu.image.render import shoot_full
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import make_optics_context
    from imsim_tpu.psf.atmosphere import (AtmConfig, make_screens,
                                          second_kick_table)
    from imsim_tpu.sensor.silicon import SiliconParams, accumulate_silicon
    from imsim_tpu.sensor.treerings import TreeRings

    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    host = build_synthetic_host(fac, ccd)
    # object families present (mirrors the runner's automatic
    # derivation): the intrinsic sampler drops absent branches
    from imsim_tpu.image.scene import COL_TYPE
    FAMILIES = tuple(sorted(set(np.asarray(
        host.scene.params[:host.n_objects, COL_TYPE]).astype(int)
        .tolist())))

    octx = make_optics_context(fac, ccd)
    tel32 = fac.telescope.for_detector("R22_S11")
    atm_cfg = AtmConfig(fwhm=0.7)
    screens = make_screens(42 + 271828, atm_cfg)
    sk0 = second_kick_table(atm_cfg, 622.0)
    from imsim_tpu.utils.lookup import PolyCDF
    sk_poly, _ = PolyCDF.fit(sk0)   # gather-free second-kick sampler
    tr = TreeRings().get("R22_S11")
    silicon = SiliconParams.make(treering_model=tr)

    import os

    nx, ny = ccd.bounds.width, ccd.bounds.height
    # batch count (BF-recalc granularity); batch size N covers the
    # pooled total below.  BENCH_NB overrides for batch-size scaling
    # experiments
    NB = int(os.environ.get("BENCH_NB", "6"))
    # block antithetic pairing (photon_pooling docs); env override for
    # pairing experiments (benchmarks/pair_experiment.py)
    PAIR = int(os.environ.get("BENCH_PAIR", "4"))
    SHARE = int(os.environ.get("BENCH_SHARE", "4")) if PAIR > 1 else 1

    # classification: the bright stars route to the FFT branch at the
    # template 2e5 e-/px threshold; everything else pools
    from imsim_tpu.image.photon_pooling import (FFT, PoolingConfig,
                                                classify_objects,
                                                make_psf_mtf)
    pcfg = PoolingConfig(fft_sb_thresh=2e5, fwhm=0.7, pixel_scale=0.2,
                         noise_var=17_500.0 * 0.04)
    psf_mtf = make_psf_mtf(pcfg)
    modes = classify_objects(host, pcfg, psf_mtf)
    n_fft = int((modes == FFT).sum())
    counts = np.where(modes != FFT, host.flux[:host.n_objects],
                      0).astype(np.int64)
    total = int(counts.sum())
    total_photons = float(total)   # pooled photons (FFT stars excluded)
    PE = PAIR * SHARE
    N = -(-(-(-total // NB)) // PE) * PE  # ceil(total/NB), layout-padded
    # align to the Pallas slot-scan tiling (weight-0 padding; without
    # it materialize_rows_T silently falls back to the XLA cumsum —
    # measured ~180 ms/batch at this scale, r5)
    from imsim_tpu.ops.scanrows import align_batch
    N = align_batch(N, PAIR, SHARE)
    cum = np.zeros(host.scene.n, np.int32)
    cum[:host.n_objects] = np.cumsum(counts)
    cum[host.n_objects:] = cum[host.n_objects - 1]
    cum_dev = jnp.asarray(cum)
    obj_map = jax.jit(build_obj_map,
                      static_argnames=("nb", "batch_size", "pair",
                                       "share"))(
        cum_dev, jnp.int32(total), NB, N, PAIR, SHARE)

    # HONEST TIMING on the axon tunnel: block_until_ready does NOT wait
    # on this backend and a value pull carries seconds of RPC overhead,
    # so K batch-steps run inside ONE jit (lax.scan) and the per-batch
    # time is the SLOPE (T(K2)-T(K1))/(K2-K1) -- constant overheads
    # cancel exactly.  Single dispatches stay under ~40 s of device
    # time (longer programs have crashed the TPU worker).
    # static tree-ring field: once per visit (outside jit — the coarse
    # stride derives from concrete wave params), folded into the
    # continuity update inside accumulate_silicon, exactly as
    # production render_ccd_pooled does once per CCD
    from imsim_tpu.sensor.silicon import tree_ring_field
    trf = None if os.environ.get("BENCH_NO_TRFOLD") \
        else tree_ring_field(silicon, (ny, nx))

    @jax.jit
    def render_K_batches(key, scene, omap, cum, tel, ctx, scr, sk,
                         sil, trf, K):
        # K is a traced scalar: ONE compile serves every iteration
        # count (fori_loop with dynamic trip count)
        image = jnp.zeros((ny, nx), jnp.float32)

        def batch(b, img):
            obj_idx, w = batch_from_obj_map(omap, jnp.int32(total),
                                            b % NB, NB, N, PAIR, SHARE)
            # gather-free per-photon params + wavelength-ICDF Chebyshev
            # rows (scatter + cumsum, block-paired layout)
            mat = jnp.concatenate([scene.params, scene.wl_cheb], axis=1)
            row = materialize_rows_T(mat, cum, b % NB, NB, N, PAIR,
                                     SHARE)
            kb = jax.random.fold_in(key, b)
            si_key = jax.random.fold_in(kb, 7)
            # fused silicon tail (production formulation): valid since
            # tree rings ride the folded static field; BENCH_NO_TRFOLD
            # experiments fall back to the per-chunk displacement
            fuse = trf is not None or not sil.tr_active
            ph = shoot_full(kb, scene, obj_idx, w, tel, ctx,
                            screens=scr, sk_table=sk, exptime=30.0,
                            row=row, pupil_pairing=PAIR,
                            screen_share=SHARE,
                            silicon=sil if fuse else None,
                            si_key=si_key, families=FAMILIES)
            return accumulate_silicon(si_key, ph, img, sil, nsub=4,
                                      tr_field=trf, pre_displaced=fuse)

        image = jax.lax.fori_loop(0, K, batch, image)
        return image[2048, 2048]

    @jax.jit
    def sky_K(key, K):
        image = jnp.zeros((ny, nx), jnp.float32)

        def one(s, img):
            grad = (jnp.float32(0), jnp.float32(0), jnp.float32(1))
            vig = jnp.ones((ny, nx), jnp.float32)
            return _add_sky_and_noise(jax.random.fold_in(key, s), img,
                                      jnp.float32(17_500.0), grad, vig,
                                      0.2)

        image = jax.lax.fori_loop(0, K, one, image)
        return image[2048, 2048]

    def timed_batches(K, seed):
        t0 = time.time()
        v = float(render_K_batches(jax.random.PRNGKey(seed), host.scene,
                                   obj_map, cum_dev, tel32, octx,
                                   screens, sk_poly, silicon, trf,
                                   jnp.int32(K)))
        assert np.isfinite(v)
        return time.time() - t0

    def timed_sky(K, seed):
        t0 = time.time()
        v = float(sky_K(jax.random.PRNGKey(seed), jnp.int32(K)))
        assert np.isfinite(v)
        return time.time() - t0

    # ---- per-visit fixed stages: obj-map build, FFT bright-star pass,
    # readout chain (VERDICT r2: the bench must cover the WHOLE visit,
    # not just the pooled loop + sky) ---------------------------------
    from imsim_tpu.electronics.readout import (VENDOR_SPECS, CcdReadout,
                                               readout_chain)
    from imsim_tpu.image import fft_render as F
    from imsim_tpu.image.diffraction_fft import spike_kernel
    from imsim_tpu.utils.rng import poisson_approx

    # FFT bright-star workload: the whole-frame Fourier synthesis of
    # photon_pooling._fft_pass (fft_render.star_field_pass — one
    # complex matmul + one padded irfft2 + spike overlay + Poisson),
    # K-looped for slope timing
    fft_ids = np.nonzero(modes == FFT)[0]
    spike = jnp.asarray(spike_kernel(wavelength_nm=622.0,
                                     pixel_scale=0.2, alpha_deg=45.0,
                                     rot_smear_deg=0.1))
    sat = float(ccd.full_well)
    rng_pos = np.random.default_rng(5)
    B = len(fft_ids)
    fl_fft = jnp.asarray(host.flux[fft_ids], jnp.float32)
    xs_fft = jnp.asarray(rng_pos.uniform(0, nx, B), jnp.float32)
    ys_fft = jnp.asarray(rng_pos.uniform(0, ny, B), jnp.float32)
    pad_fft = max(F.stamp_bucket(float(host.flux[i]), psf_mtf, 0.2,
                                 noise_var=pcfg.noise_var)
                  for i in fft_ids) // 2
    margin = spike.shape[0] // 2
    pad_fft = max(pad_fft, margin)
    Npad = F.good_fft_size(max(nx, ny) + 2 * pad_fft)
    cheb, k_max, _ = F.mtf_cheb(psf_mtf)
    cheb = jnp.asarray(cheb)

    @jax.jit
    def fft_K(key, K):
        img0 = jnp.zeros((ny, nx), jnp.float32)

        def one(t, img):
            kk = jax.random.fold_in(key, t)
            img, _ = F.star_field_pass(
                img, cheb, jnp.float32(k_max), fl_fft, xs_fft, ys_fft,
                spike, jnp.float32(sat), kk, Npad, ny, nx, pad_fft,
                0.2, margin)
            return img

        img = jax.lax.fori_loop(0, K, one, img0)
        return img[2048, 2048]

    # readout chain: bleed + dark + segment/gain + crosstalk einsum +
    # banded CTE + bias/noise on a realistic post-sky image level
    ro = CcdReadout(ccd)
    ro_img = jnp.full((ny, nx), 700.0, jnp.float32)
    spec = VENDOR_SPECS[ccd.vendor]

    @jax.jit
    def readout_K(key, K):
        def one(i, acc):
            raw = readout_chain(
                jax.random.fold_in(key, i), ro_img, ro.gains, ro.xtalk,
                ro.bias_levels, ro.read_noises, ro.pcte, ro.scte,
                ccd.vendor, sat, spec["midline_bleed_stop"], 0.02, 30.0,
                2.0)
            return acc + raw[0, 0, 0]

        return jax.lax.fori_loop(0, K, one, jnp.float32(0.0))

    # obj-map build (scatter + cummax, once per visit); the carried
    # accumulator feeds back into the input so the loop body cannot be
    # hoisted as loop-invariant
    @jax.jit
    def objmap_K(K):
        def one(i, acc):
            cum2 = cum_dev.at[0].add(jnp.isnan(acc).astype(jnp.int32))
            m = build_obj_map(cum2, jnp.int32(total), NB, N, PAIR)
            return acc + m[123_456, 3].astype(jnp.float32)

        return jax.lax.fori_loop(0, K, one, jnp.float32(0.0))

    def timed_scalar(fn, *args):
        t0 = time.time()
        v = float(fn(*args))
        assert np.isfinite(v)
        return time.time() - t0

    if compile_only:
        # On-chip Mosaic compile gate at production shapes (VERDICT r4
        # item 2): interpret-mode CPU tests never exercise the real TPU
        # lowering, and both round-4 hardware failures (atan lowering,
        # scoped-VMEM stack OOM) surfaced only when the driver bench
        # compiled on the chip.  This AOT lower+compiles every bench
        # program — including the Pallas ray-chain kernel inside the
        # fori_loop/platform_dependent composition at the full pooled
        # batch size — without running the multi-minute timed sections.
        # Run `python bench.py --compile-only` on the real chip before
        # every end-of-round snapshot (<60 s warm-cache).
        gkey = jax.random.PRNGKey(11)
        gates = {}
        for name, fn, args in (
            ("render_K_batches", render_K_batches,
             (jax.random.PRNGKey(1), host.scene, obj_map, cum_dev,
              tel32, octx, screens, sk_poly, silicon, trf,
              jnp.int32(1))),
            ("sky_K", sky_K, (gkey, jnp.int32(1))),
            ("fft_K", fft_K, (gkey, jnp.int32(1))),
            ("readout_K", readout_K, (gkey, jnp.int32(1))),
            ("objmap_K", objmap_K, (jnp.int32(1),)),
        ):
            t0 = time.time()
            fn.lower(*args).compile()
            gates[name] = round(time.time() - t0, 1)
        print(json.dumps({
            "metric": "compile_gate", "value": 1,
            "unit": "AOT lower+compile OK at production shapes; "
                    "seconds per program: " + json.dumps(gates),
            "vs_baseline": 1.0}))
        return

    timed_batches(1, 1)        # single compile serves all K
    t1 = timed_batches(1, 2)
    t5 = timed_batches(5, 3)
    per_batch = max((t5 - t1) / 4.0, 1e-4)

    timed_sky(2, 1)
    s2 = timed_sky(2, 2)
    s10 = timed_sky(10, 3)
    per_sky = max((s10 - s2) / 8.0, 0.0)

    key0 = jax.random.PRNGKey(11)
    timed_scalar(fft_K, key0, jnp.int32(1))
    f1 = timed_scalar(fft_K, key0, jnp.int32(1))
    f5 = timed_scalar(fft_K, key0, jnp.int32(5))
    per_fft = max((f5 - f1) / 4.0, 0.0)

    timed_scalar(readout_K, key0, jnp.int32(1))
    r1 = timed_scalar(readout_K, key0, jnp.int32(1))
    r5 = timed_scalar(readout_K, key0, jnp.int32(5))
    per_readout = max((r5 - r1) / 4.0, 0.0)

    timed_scalar(objmap_K, jnp.int32(1))
    o1 = timed_scalar(objmap_K, jnp.int32(1))
    o3 = timed_scalar(objmap_K, jnp.int32(3))
    per_objmap = max((o3 - o1) / 2.0, 0.0)

    wall = (NB * per_batch + per_sky + per_fft + per_readout
            + per_objmap)
    photons_per_sec = total_photons / wall
    result = {
        "metric": "single_ccd_visit_wallclock_fullphysics",
        "value": round(wall, 3),
        "unit": "seconds/visit, slope method (4Kx4K, 1e5 obj + %d FFT "
                "stars w/ spikes, %.2e photons, atm+DCR+raytrace+"
                "silicon BF+sky+objmap+readout; %.1f Mphot/s; "
                "batches %.2f fft %.2f readout %.2f sky %.2f map %.2f)"
                % (n_fft, total_photons, photons_per_sec / 1e6,
                   NB * per_batch, per_fft, per_readout, per_sky,
                   per_objmap),
        "vs_baseline": round(10.0 / wall, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    if "--visit" in sys.argv:
        i = sys.argv.index("--visit")
        nphot = float(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 1.0e8
        bench_visit(n_photons_per_ccd=nphot)
    elif "--compile-only" in sys.argv:
        main(compile_only=True)
    else:
        main()
