"""Tests for opsim metadata, checkpointing, tree rings, cosmic rays,
FFT stamps, photon pooling, and OPD diagnostics (reference analogs:
tests/test_opsim*, test_checkpoint*, test_tree_rings, test_cosmic_rays,
test_photon_pooling, test_opd)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from imsim_tpu.catalog import opsim
from imsim_tpu.image import fft_render as F
from imsim_tpu.image.cosmic_rays import (CosmicRayCatalog,
                                         paint_cosmic_rays)
from imsim_tpu.image.photon_pooling import (FAINT, FFT, PHOT,
                                            PoolingConfig,
                                            classify_objects,
                                            make_strided_batches,
                                            render_ccd_pooled)
from imsim_tpu.image.scene import DeviceScene, SceneHost, WL_CDF_K
from imsim_tpu.io.checkpoint import Checkpointer
from imsim_tpu.sensor.treerings import TreeRings


def test_opsim_from_dict_derivations():
    data = opsim.from_dict(dict(fieldRA=30.0, fieldDec=-30.24,
                                observationStartMJD=60674.2, band="r",
                                rawSeeing=0.7, exptime=30.0,
                                observationId=12345))
    assert data["airmass"] >= 1.0
    assert -12.0 <= data["HA"] <= 12.0
    assert 0.5 < data["FWHMeff"] < 2.5
    assert data["FWHMgeom"] < data["FWHMeff"]
    assert abs(data["mjd_mid"] - 60674.2 - 15.0 / 86400) < 1e-9


def test_opsim_fwhm_golden_values():
    """DC2 visit 197356 Run1.2p golden values, the reference's own
    oracle (tests/test_FWHMgeom.py:20-60)."""
    raw, band, alt = 0.5059960, "r", 52.54199126195116065
    data = opsim.from_dict({})
    assert abs(data.getAirmass(alt) - 1.24522984) < 5e-7
    assert abs(data.FWHMeff(raw, band, alt) - 0.8300650) < 0.03
    assert abs(data.FWHMgeom(raw, band, alt) - 0.7343130) < 0.03
    # the from_dict route derives the same numbers
    data2 = opsim.from_dict(dict(rawSeeing=raw, band=band, altitude=alt))
    assert abs(data2.getAirmass() - 1.24522984) < 5e-7
    assert abs(data2.FWHMeff() - 0.8300650) < 0.03
    assert abs(data2["FWHMeff"] - 0.8300650) < 0.03
    assert abs(data2["FWHMgeom"] - 0.7343130) < 0.03


def test_opsim_instcat_header(tmp_path):
    p = tmp_path / "cat.txt"
    p.write_text("rightascension 31.11\ndeclination -10.0\n"
                 "mjd 59580.14\nfilter 2\nseeing 0.81\nvistime 30.0\n"
                 "rotskypos 12.0\nobshistid 161899\n"
                 "object 1 31.1 -10.0 25 flatSED/sed_flat.txt.gz 0 0 0 0 "
                 "0 0 point none none\n")
    d = opsim.read_instcat_header(str(p))
    assert d["band"] == "r"
    assert d["fieldRA"] == 31.11
    assert d["rotSkyPos"] == 12.0
    assert d["observationId"] == 161899


def test_checkpointer_roundtrip_and_recovery(tmp_path):
    f = str(tmp_path / "ckpt.h5")
    ck = Checkpointer(f)
    ck.save("a", {"x": np.arange(5), "n": 3})
    ck.save("b", "hello")
    assert Checkpointer(f).load("a")["n"] == 3
    assert Checkpointer(f).load("b") == "hello"
    assert Checkpointer(f).load("missing") is None
    assert set(Checkpointer(f).names()) == {"a", "b"}
    # crash while WRITING _new (current still present): the intact
    # current file wins — promoting a possibly-truncated _new would
    # destroy the last good state (imsim/checkpoint.py:32-65 cases B/C)
    ck.save("b", "old")
    import h5py
    with h5py.File(f + "_new", "w") as fn:
        fn.create_dataset("b", data=np.frombuffer(
            __import__("pickle").dumps("mid-write"), np.uint8))
    ck2 = Checkpointer(f)
    assert ck2.load("b") == "old"
    assert not os.path.exists(f + "_new")


def test_tree_rings_deterministic_and_scaled():
    tr = TreeRings()
    m1 = tr.get("R22_S11")
    m2 = TreeRings().get("R22_S11")
    np.testing.assert_array_equal(m1.profile, m2.profile)
    assert not np.array_equal(m1.profile, tr.get("R01_S00").profile)
    # displacement amplitude ~ 0.02 px rms in the active region
    rms = np.std(m1.profile[512:])
    assert 0.005 < rms < 0.08
    cx, cy = m1.center
    assert not (0 <= cx <= 4096 and 0 <= cy <= 4096)  # center off-sensor


def test_cosmic_rays_paint_and_io(tmp_path):
    img = np.zeros((500, 500), np.float32)
    out = paint_cosmic_rays(img, exptime=3000.0, seed=1)
    assert out.sum() > 0
    assert (out > 1000).sum() > 5          # bright CR pixels exist
    cat = CosmicRayCatalog.synthesize(50, seed=1)
    p = str(tmp_path / "crs.npz")
    cat.save(p)
    cat2 = CosmicRayCatalog.load(p)
    assert len(cat2) == 50
    np.testing.assert_allclose(cat.footprints[7][2], cat2.footprints[7][2])


def test_fft_stamp_gaussian():
    """A Gaussian MTF renders to a Gaussian stamp with the right flux,
    width, and subpixel center."""
    sigma_as = 0.8
    k = np.linspace(0, 40.0, 512)
    T = np.exp(-0.5 * (sigma_as * k) ** 2)
    from imsim_tpu.utils.lookup import UniformTable
    tab = UniformTable(0.0, k[1], T.astype(np.float32))
    N = 128
    img = F.render_fft_stamps(
        jnp.asarray(T[None, :], jnp.float32),
        jnp.full((1,), tab.dx, jnp.float32),
        jnp.asarray([1000.0], jnp.float32),
        jnp.asarray([1.0], jnp.float32), jnp.asarray([0.0], jnp.float32),
        jnp.asarray([0.3], jnp.float32), jnp.asarray([0.0], jnp.float32),
        N, 0.2)[0]
    img = np.asarray(img)
    assert abs(img.sum() - 1000.0) < 1.0
    yy, xx = np.mgrid[:N, :N]
    cx = (img * xx).sum() / img.sum()
    cy = (img * yy).sum() / img.sum()
    assert abs(cx - (N // 2 + 0.3)) < 0.02
    assert abs(cy - N // 2) < 0.02
    sig_px = np.sqrt((img * (xx - cx) ** 2).sum() / img.sum())
    assert abs(sig_px - sigma_as / 0.2) < 0.1


def _tiny_host(n_obj=20, img=256, bright=None, seed=0):
    rng = np.random.default_rng(seed)
    flux = rng.uniform(50, 4000, n_obj)
    if bright is not None:
        flux[0] = bright
    wl = np.linspace(550.0, 690.0, WL_CDF_K, dtype=np.float32)
    scene = DeviceScene.from_columns(
        x=rng.uniform(40, img - 40, n_obj),
        y=rng.uniform(40, img - 40, n_obj),
        obj_type=np.zeros(n_obj), p0=np.zeros(n_obj), p1=np.ones(n_obj),
        p2=np.ones(n_obj), p3=np.zeros(n_obj), g1=np.zeros(n_obj),
        g2=np.zeros(n_obj), mu=np.ones(n_obj),
        wl_icdf=np.broadcast_to(wl, (n_obj, WL_CDF_K)))
    return SceneHost(scene=scene, flux=np.round(flux),
                     nominal_flux=flux, n_objects=n_obj)


def test_pooling_classification_and_striding():
    host = _tiny_host(bright=200_000)
    cfg = PoolingConfig(xsize=256, ysize=256, nbatch=4, batch_size=100_000,
                        faint_thresh=100.0, fft_sb_thresh=8e3)
    r0_500 = 0.9758834 * 500e-9 / (0.8 * np.pi / 180 / 3600)
    mtf = F.psf_mtf_table(622.0, r0_500)
    modes = classify_objects(host, cfg, mtf)
    assert modes[0] == FFT
    assert (modes == FAINT).sum() > 0
    assert (modes == PHOT).sum() > 0
    batches = list(make_strided_batches(host, modes, cfg))
    # every non-FFT photon appears exactly once; bright object spread out
    tot = sum(int(w.sum()) for _, w in batches)
    expect = int(host.flux[np.asarray(modes) != FFT].sum())
    assert tot == expect
    # a mid-bright object's photons appear in every batch
    mid = int(np.argsort(host.flux)[-2])
    for idx, w in batches:
        sel = (np.asarray(idx) == mid) & (np.asarray(w) > 0)
        assert sel.sum() > 0


def test_materialize_rows_matches_gather():
    """The gather-free scatter+cumsum param reconstruction must agree
    with params[obj_idx] for every alive photon (incl. zero-count
    objects and batch-straddling runs)."""
    import jax.numpy as jnp
    from imsim_tpu.image.photon_pooling import (batch_from_obj_map,
                                                build_obj_map,
                                                materialize_rows,
                                                member_offsets)

    rng = np.random.default_rng(3)
    counts = rng.integers(0, 40, 257)
    counts[5] = 0
    counts[100] = 500
    cum = np.cumsum(counts).astype(np.int32)
    total = int(cum[-1])
    params = (rng.normal(size=(257, 10)) * 0.01).astype(np.float32)
    nb = 4
    for pair, share in ((1, 1), (2, 1), (4, 1), (4, 4), (2, 3)):
        pe = pair * share
        bs = int(np.ceil(total / nb))
        bs = -(-bs // pe) * pe
        mp = bs // pe
        omap = build_obj_map(jnp.asarray(cum), jnp.int32(total), nb, bs,
                             pair, share)
        # ground truth: object of global photon g (object-major list)
        counts_ = np.diff(np.concatenate([[0], cum]))
        obj_of_g = np.repeat(np.arange(len(counts_)), counts_)
        off = member_offsets(pair, share)
        for b in range(nb):
            obj, w = batch_from_obj_map(omap, jnp.int32(total), b, nb,
                                        bs, pair, share)
            got = np.asarray(materialize_rows(jnp.asarray(params),
                                              jnp.asarray(cum),
                                              jnp.int32(b), nb, bs,
                                              pair, share))
            alive = np.asarray(w) > 0
            # slot s = beta*mp + q holds ordinal j = pe*q + off[beta]
            s = np.arange(bs)
            j = pe * (s % mp) + off[s // mp]
            g = b + nb * j
            assert (alive == (g < total)).all()
            ref_obj = np.where(g < total, obj_of_g[np.minimum(g, total - 1)],
                               0)
            assert (np.asarray(obj)[alive] == ref_obj[alive]).all()
            ref = params[np.asarray(obj)]
            assert np.abs(got - ref)[alive].max() < 2e-6
            if pair > 1:
                # pair-mate sets must hold adjacent ordinals: member-0
                # slice slot k = r*mp + q maps to pair group 4q + r
                m = bs // pair
                k = np.arange(m)
                grp = j[:m] // pair
                assert (np.sort(grp) == np.arange(m)).all()
                for h in range(pair):
                    assert (j[h * m + k] == pair * grp + h).all()


def test_scan_slot_prefix_matches_materialize_rows():
    """ops/scanrows.scan_slot_prefix (interpret mode; the TPU one-pass
    row materialization) must reproduce materialize_rows' slot-layout
    output exactly: slot-plane delta scatter + per-plane lane scans +
    cross-plane suffix == scatter + long cumsum + pe relayout."""
    import jax.numpy as jnp
    from imsim_tpu.image.photon_pooling import materialize_rows
    from imsim_tpu.ops.scanrows import scan_slot_prefix

    rng = np.random.default_rng(11)
    for pair, share in ((4, 4), (4, 8)):   # pe=16 and the pe=32 layout
        pe = pair * share
        mp, C, nb = 1024, 6, 3
        bs = pe * mp
        counts = rng.integers(0, 9, 4096)
        counts[7] = 0
        counts[100] = 2000
        cum = np.cumsum(counts).astype(np.int32)
        params = (rng.normal(size=(4096, C)) * 0.01).astype(np.float32)
        for b in (0, 2):
            want = np.asarray(materialize_rows(
                jnp.asarray(params), jnp.asarray(cum), jnp.int32(b), nb,
                bs, pair, share)).T
            starts = np.concatenate([[0], cum[:-1]])
            j0 = np.maximum(-((b - starts) // nb), 0)
            deltasT = (params - np.concatenate(
                [np.zeros((1, C), np.float32), params[:-1]])).T
            mu = j0 % pe
            beta = (mu % pair) * share + (mu // pair)
            d = jnp.zeros((C, pe, mp), jnp.float32).at[
                :, beta, j0 // pe].add(deltasT, mode="drop")
            for mxu in (True, False):   # MXU triangular + VPU log-shift
                got = np.asarray(scan_slot_prefix(
                    d, pair, share, blkq=256, interpret=True,
                    mxu=mxu)).reshape(C, bs)
                assert np.abs(got - want).max() < 2e-6


def test_pooled_plan_slot_scan_alignment():
    """pooled_plan must size pooled batches so the Pallas slot-scan
    row materialization stays engaged (slot_size_ok) — ceil(total/nb)
    rounded only to pe almost never tiles into whole lane blocks and
    silently fell back to the XLA cumsum (~180 ms/batch at production
    scale, r5)."""
    from imsim_tpu.image.photon_pooling import pooled_plan
    from imsim_tpu.ops.scanrows import align_batch, slot_size_ok

    # unit behavior: aligned at pooled scale, untouched below threshold
    assert slot_size_ok(align_batch(18_666_672, 4, 4), 16)
    assert align_batch(50_000, 4, 4) == 50_000
    assert align_batch(1 << 20, 1, 1) == 1 << 20      # pe=1: no kernel
    for bs in (262_160, 1_112_352, 18_666_672):
        a = align_batch(bs, 4, 4)
        assert a >= bs and a - bs < 16 * 2048 and a % 16 == 0

    # end-to-end: a pooled-scale plan lands on a kernel-eligible size
    host = _tiny_host(n_obj=30)
    host.flux[:] = np.round(
        np.full(30, 2.4e6))                  # total 7.2e7 photons
    cfg = PoolingConfig(xsize=256, ysize=256, nbatch=4,
                        batch_size=30_000_000, pupil_pairing=4,
                        screen_share=4)
    modes = classify_objects(host, cfg, None)
    cum, total, nb, batch_size = pooled_plan(host, modes, cfg)
    assert batch_size * nb >= total
    assert slot_size_ok(batch_size, 16)


def test_sample_intrinsic_family_gating():
    """render.sample_intrinsic(families=...) must be bit-identical to
    the ungated program whenever `families` covers every type present —
    dropping absent families is compile-time pruning, never a numerics
    change (the RNG key splits are unconditional)."""
    import jax

    from imsim_tpu.catalog.instcat import KNOTS, POINT, SERSIC, STREAK
    from imsim_tpu.image import scene as S
    from imsim_tpu.image.render import sample_intrinsic

    rng = np.random.default_rng(5)
    n = 1024
    key = jax.random.PRNGKey(17)
    obj_idx = jnp.asarray(rng.integers(0, 5000, n).astype(np.int32))

    def make_row(types):
        t = rng.choice(types, n)
        row = np.zeros((S.N_COLS, n), np.float32)
        row[S.COL_TYPE] = t
        row[S.COL_P0] = rng.uniform(0.3, 2.0, n)
        row[S.COL_P1] = np.where(t == KNOTS,
                                 rng.integers(5, 40, n),
                                 rng.uniform(1.0, 4.0, n))
        row[S.COL_P2] = rng.uniform(0.4, 1.0, n)       # q (ellipse)
        row[S.COL_P3] = rng.uniform(0.0, np.pi, n)     # beta
        row[S.COL_G1] = rng.normal(0, 0.02, n)
        row[S.COL_G2] = rng.normal(0, 0.02, n)
        row[S.COL_MU] = rng.uniform(0.9, 1.1, n)
        return jnp.asarray(row)

    for types in ([POINT], [POINT, SERSIC], [POINT, SERSIC, KNOTS],
                  [POINT, SERSIC, KNOTS, STREAK]):
        row = make_row(np.array(types))
        fx, fy = sample_intrinsic(key, row, obj_idx, 0.2, families=None)
        gx, gy = sample_intrinsic(key, row, obj_idx, 0.2,
                                  families=tuple(types))
        np.testing.assert_array_equal(np.asarray(fx), np.asarray(gx))
        np.testing.assert_array_equal(np.asarray(fy), np.asarray(gy))


def test_pooling_render_flux_and_resume(tmp_path):
    host = _tiny_host()
    cfg = PoolingConfig(xsize=256, ysize=256, nbatch=3, batch_size=50_000,
                        faint_thresh=10.0, nbatch_per_checkpoint=1)
    img1, modes, _ = render_ccd_pooled(7, host, cfg)
    total = float(np.asarray(img1).sum())
    expect = host.flux.sum()
    assert abs(total - expect) < 0.05 * expect   # PSF wings off-edge only

    ck = Checkpointer(str(tmp_path / "c.h5"))
    img2, _, _ = render_ccd_pooled(7, host, cfg, checkpointer=ck)
    saved = ck.load("pooled")
    assert saved["next_batch"] >= 1
    # resume from a partial checkpoint reproduces the same image
    ck.save("pooled", dict(image=saved["image"] * 0.0, next_batch=0))
    img3, _, _ = render_ccd_pooled(7, host, cfg, checkpointer=ck)
    np.testing.assert_allclose(np.asarray(img3), np.asarray(img2),
                               rtol=1e-5, atol=1e-3)


def test_opd_zernike_recovery():
    """OPD of the unperturbed design is small; an injected Z7 (coma)
    perturbation on M2 shows up in the annular-Zernike fit."""
    from imsim_tpu.optics.loader import load_telescope
    from imsim_tpu.optics.opd import annular_zernikes, opd_map

    tel = load_telescope(band="r").fiducial
    img, mask, _, _ = opd_map(tel, 0.0, 0.0, nx=65)
    rms0 = np.nanstd(img[mask])
    # the bundled design is optimized for geometric spot size (the
    # seeing-dominated regime), leaving a few waves of balanced
    # focus/spherical in the wavefront
    assert rms0 < 3000.0

    pert = load_telescope(band="r", perturbations={
        "M2": {"zernikes": {"coef": [0.0, 0.0, 0.0, 300e-9],
                            "start_j": 4}}}).fiducial  # Z7 = 300 nm
    zk = annular_zernikes(pert, 0.0, 0.0, jmax=11, nx=65)
    zk0 = annular_zernikes(tel, 0.0, 0.0, jmax=11, nx=65)
    dz = zk - zk0
    # the kick is applied as a slope texture on M2 (double pass) —
    # expect the injected mode to dominate the difference
    j_peak = int(np.argmax(np.abs(dz))) + 1
    assert j_peak == 7, (j_peak, dz)


def test_stamp_sizing_folding_threshold():
    """Stamp size from the TRUE enclosed-flux radius with the
    noise_var/flux folding threshold (imsim/stamp_utils.py:119-155):
    brighter stars and lower noise both grow the stamp; the default
    threshold bounds faint stamps."""
    from imsim_tpu.image import fft_render as F

    mtf = F.psf_mtf_table(622.0, 0.15)
    n_faint = F.stamp_bucket(1e4, mtf, 0.2, noise_var=400.0)
    n_bright = F.stamp_bucket(1e8, mtf, 0.2, noise_var=400.0)
    n_bright_hinoise = F.stamp_bucket(1e8, mtf, 0.2, noise_var=40000.0)
    assert n_bright > n_faint
    assert n_bright >= n_bright_hinoise
    # default threshold when noise_var unknown
    n_def = F.stamp_bucket(1e8, mtf, 0.2)
    assert n_def <= n_bright
    # enclosed-flux sanity: the chosen stamp holds >= 1 - ft of flux
    r_grid, E = F._enclosed_flux_curve(mtf, 0.2)
    ft = np.exp(np.floor(np.log(400.0 / 1e8)))
    r_needed = np.interp(1 - ft, E, r_grid)
    assert n_bright >= min(2 * r_needed / 0.2 * 0.9, 4096)


def test_opd_eps_narrows_fit_annulus():
    """output.opd.eps (imsim/opd.py `eps` key): a larger inner-annulus
    fraction changes the Zernike fit domain and hence the coefficients;
    eps below the physical obscuration is a no-op (the trace mask
    already excludes the inner hole)."""
    from imsim_tpu.optics.loader import load_telescope
    from imsim_tpu.optics.opd import OBSCURATION, annular_zernikes

    tel = load_telescope(band="r").fiducial
    zk_def = annular_zernikes(tel, 0.0, 0.0, jmax=11, nx=65)
    zk_below = annular_zernikes(tel, 0.0, 0.0, jmax=11, nx=65,
                                eps=0.5 * OBSCURATION)
    np.testing.assert_allclose(zk_below, zk_def)
    zk_wide = annular_zernikes(tel, 0.0, 0.0, jmax=11, nx=65, eps=0.8)
    assert np.all(np.isfinite(zk_wide))
    # the design carries waves of balanced focus/spherical: restricting
    # the annulus rebalances them, so the fits must differ measurably
    assert float(np.max(np.abs(zk_wide - zk_def))) > 1.0


def test_host_timers_accumulate_and_reset():
    """runner.HOST_TIMERS: thread-safe wall-clock accumulators around
    prepare_ccd / write_outputs that bench.py --visit reads to measure
    the overlap-hideable host work (prep + RICE/FITS IO) on a serial
    visit pass."""
    import time as _time

    from imsim_tpu.config import runner

    # the production entry points carry the timing wrapper
    assert hasattr(runner.prepare_ccd, "__wrapped__")
    assert hasattr(runner.write_outputs, "__wrapped__")

    runner.reset_host_timers()
    assert runner.HOST_TIMERS == {"prep_s": 0.0, "io_s": 0.0}

    @runner._timed("io_s")
    def fake_io():
        _time.sleep(0.01)
        return 7

    assert fake_io() == 7 and fake_io() == 7
    assert runner.HOST_TIMERS["io_s"] >= 0.02
    assert runner.HOST_TIMERS["prep_s"] == 0.0

    # exceptions still record their elapsed time (finally-path)
    @runner._timed("prep_s")
    def fake_fail():
        _time.sleep(0.01)
        raise ValueError("boom")

    import pytest as _pytest
    with _pytest.raises(ValueError):
        fake_fail()
    assert runner.HOST_TIMERS["prep_s"] >= 0.01

    runner.reset_host_timers()
    assert runner.HOST_TIMERS == {"prep_s": 0.0, "io_s": 0.0}
