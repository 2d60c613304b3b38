"""FFT-branch pipeline tests: pixel placement when the optics chain owns
COL_X/COL_Y, visit-seeded noise, wired-in saturation spikes, batched
stamp adds, and crash-safe checkpoint recovery.

Reference behaviors covered: imsim/stamp.py:482-525 (FFT draw order:
clip -> spikes -> Poisson noise -> add), imsim/checkpoint.py:32-65
(recovery cases), tests/test_stamp.py stamp-placement assertions.
"""
import os

import numpy as np

import jax.numpy as jnp

from imsim_tpu.image import fft_render as F
from imsim_tpu.image.diffraction_fft import spike_kernel
from imsim_tpu.image.photon_pooling import (FFT, PoolingConfig,
                                            classify_objects,
                                            render_ccd_pooled)
from imsim_tpu.image.scene import WL_CDF_K, DeviceScene, SceneHost
from imsim_tpu.io.checkpoint import Checkpointer


def _bright_host(img=256, flux=3e6, pix=(100.0, 80.0), field_xy=None):
    """One very bright star.  If field_xy is given, COL_X/COL_Y hold
    those (radian-scale field angles, as the optics path does) and the
    true pixel position lives in pix_x/pix_y."""
    n = 1
    wl = np.linspace(550.0, 690.0, WL_CDF_K, dtype=np.float32)
    cx, cy = field_xy if field_xy is not None else pix
    scene = DeviceScene.from_columns(
        x=np.array([cx]), y=np.array([cy]),
        obj_type=np.zeros(n), p0=np.zeros(n), p1=np.ones(n),
        p2=np.ones(n), p3=np.zeros(n), g1=np.zeros(n),
        g2=np.zeros(n), mu=np.ones(n),
        wl_icdf=np.broadcast_to(wl, (n, WL_CDF_K)))
    return SceneHost(scene=scene, flux=np.array([flux]),
                     nominal_flux=np.array([flux]), n_objects=n,
                     pix_x=np.array([pix[0]]), pix_y=np.array([pix[1]]))


def _fft_cfg(img=256):
    return PoolingConfig(xsize=img, ysize=img, faint_thresh=10.0,
                         fft_sb_thresh=1e4)


def test_fft_stamp_placed_at_pixel_not_field_angle():
    # COL_X/COL_Y carry field angles (~0.01 rad) as in the optics path;
    # the stamp must land at the pixel position, not at floor(0.01)-N/2.
    host = _bright_host(field_xy=(0.01, -0.005))
    cfg = _fft_cfg()
    img, modes, _ = render_ccd_pooled(3, host, cfg)
    assert modes[0] == FFT
    a = np.asarray(img)
    assert a.sum() > 0.9 * host.flux[0]
    yy, xx = np.mgrid[:256, :256]
    cx = (a * xx).sum() / a.sum()
    cy = (a * yy).sum() / a.sum()
    assert abs(cx - 100.0) < 1.0, cx
    assert abs(cy - 80.0) < 1.0, cy


def test_fft_noise_keyed_by_visit_seed():
    host = _bright_host()
    cfg = _fft_cfg()
    img_a, _, _ = render_ccd_pooled(3, host, cfg)
    img_b, _, _ = render_ccd_pooled(3, host, cfg)
    img_c, _, _ = render_ccd_pooled(4, host, cfg)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    assert np.any(np.asarray(img_a) != np.asarray(img_c))


def test_fft_pass_applies_spikes_when_wired():
    host = _bright_host(flux=5e7, pix=(128.0, 128.0))
    cfg = _fft_cfg()
    kern = jnp.asarray(spike_kernel(622.0, alpha_deg=45.0, n=129))
    spikes = dict(kernel=kern, sat=20_000.0)
    img_plain, _, _ = render_ccd_pooled(3, host, cfg)
    img_spiked, _, _ = render_ccd_pooled(3, host, cfg, spikes=spikes)
    a = np.asarray(img_spiked)
    p = np.asarray(img_plain)
    # total flux preserved up to spike wings clipped at the stamp edge
    # (the reference clips the overlay to fft_image bounds too)
    assert 0.99 * p.sum() < a.sum() < p.sum() + 5 * np.sqrt(p.sum())
    # 45-degree arms: flux added along the diagonal, none along the axes
    r = np.arange(25, 60)
    added_diag = a[128 + r, 128 + r].sum() - p[128 + r, 128 + r].sum()
    added_axis = a[128 + r, 128].sum() - p[128 + r, 128].sum()
    assert added_diag > 10 * np.sqrt(p[128 + r, 128 + r].sum() + 1), \
        added_diag
    assert abs(added_axis) < 8 * np.sqrt(p[128 + r, 128].sum() + 1), \
        added_axis
    # core charge redistributed (peak reduced)
    assert a.max() < p.max()


def test_add_stamps_batched_clipping():
    img = jnp.zeros((64, 64), jnp.float32)
    st = jnp.ones((3, 16, 16), jnp.float32)
    # fully inside; hanging off the left edge; fully outside
    x0 = jnp.asarray([10, -8, -16], jnp.int32)
    y0 = jnp.asarray([10, 0, 70], jnp.int32)
    out = np.asarray(F.add_stamps(img, st, x0, y0))
    assert out.sum() == 16 * 16 + 8 * 16
    assert out[10:26, 10:26].sum() == 256
    assert out[0:16, 0:8].sum() == 128


def test_fft_pass_checkpointed_not_rerun(tmp_path):
    """Resume must not redo the FFT pass: after the FFT stage is
    checkpointed, a resumed render reuses it (reference gap: the FFT
    pass reran from batch 0, VERDICT item 9)."""
    host = _bright_host(flux=2e6, pix=(128.0, 128.0))
    cfg = _fft_cfg()
    ck = Checkpointer(str(tmp_path / "c.h5"))
    img1, modes, real1 = render_ccd_pooled(3, host, cfg, checkpointer=ck)
    saved = ck.load("pooled")
    assert saved["fft_done"] is True
    # corrupt the FFT inputs; a resume that reran the FFT pass would
    # now produce a different image
    host2 = _bright_host(flux=2e6, pix=(10.0, 10.0))
    img2, _, real2 = render_ccd_pooled(3, host2, cfg, checkpointer=ck)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    # realized flux carried through the checkpoint
    assert real1[0] > 0.9 * host.flux[0]


def test_realized_flux_tracking():
    """track_realized accumulates per-object incident flux across
    batches (imsim/photon_pooling.py:472-507 truth semantics)."""
    rng = np.random.default_rng(5)
    n = 8
    wl = np.linspace(550.0, 690.0, WL_CDF_K, dtype=np.float32)
    flux = rng.uniform(500, 3000, n)
    scene = DeviceScene.from_columns(
        x=rng.uniform(60, 196, n), y=rng.uniform(60, 196, n),
        obj_type=np.zeros(n), p0=np.zeros(n), p1=np.ones(n),
        p2=np.ones(n), p3=np.zeros(n), g1=np.zeros(n),
        g2=np.zeros(n), mu=np.ones(n),
        wl_icdf=np.broadcast_to(wl, (n, WL_CDF_K)))
    host = SceneHost(scene=scene, flux=np.round(flux),
                     nominal_flux=flux, n_objects=n)
    cfg = PoolingConfig(xsize=256, ysize=256, nbatch=3,
                        batch_size=10_000, faint_thresh=10.0)
    img, modes, realized = render_ccd_pooled(2, host, cfg,
                                             track_realized=True)
    np.testing.assert_allclose(realized[:n], host.flux, rtol=1e-5)


def test_checkpoint_recovery_keeps_current_over_truncated_new(tmp_path):
    path = str(tmp_path / "c.h5")
    ck = Checkpointer(path)
    ck.save("state", {"batch": 1})
    ck.save("state", {"batch": 2})
    # crash mid-save: truncated _new beside an intact current
    with open(path + "_new", "wb") as f:
        f.write(b"\x89HDF\r\n truncated garbage")
    ck2 = Checkpointer(path)
    assert ck2.load("state") == {"batch": 2}
    assert not os.path.exists(path + "_new")


def test_checkpoint_recovery_promotes_new_when_current_absent(tmp_path):
    path = str(tmp_path / "c.h5")
    ck = Checkpointer(path)
    ck.save("state", {"batch": 5})
    # crash between the two renames: current moved away, _new complete
    os.replace(path, path + "_new")
    ck2 = Checkpointer(path)
    assert ck2.load("state") == {"batch": 5}


def test_checkpoint_recovery_from_bak(tmp_path):
    path = str(tmp_path / "c.h5")
    ck = Checkpointer(path)
    ck.save("state", {"batch": 7})
    os.replace(path, path + "_bak")
    ck2 = Checkpointer(path)
    assert ck2.load("state") == {"batch": 7}


def _gal_host(img=256, flux=5e6, hlr=0.8, n_sersic=1.5, q=0.5,
              beta=0.6, pix=(128.0, 128.0)):
    wl = np.linspace(550.0, 690.0, WL_CDF_K, dtype=np.float32)
    scene = DeviceScene.from_columns(
        x=np.array([pix[0]]), y=np.array([pix[1]]),
        obj_type=np.array([1]), p0=np.array([hlr]),
        p1=np.array([n_sersic]), p2=np.array([q]),
        p3=np.array([beta]), g1=np.zeros(1), g2=np.zeros(1),
        mu=np.ones(1),
        wl_icdf=np.broadcast_to(wl, (1, WL_CDF_K)))
    return SceneHost(scene=scene, flux=np.array([flux]),
                     nominal_flux=np.array([flux]), n_objects=1,
                     pix_x=np.array([pix[0]]), pix_y=np.array([pix[1]]))


def test_fft_branch_renders_sersic_galaxy():
    """A bright compact galaxy above fft_sb_thresh takes the FFT branch
    (imsim/stamp.py renders any type via FFT) and its stamp must carry
    the full flux, sit at the right centroid, and be LARGER and
    ELLIPTICAL per its (hlr, q, beta) vs the same-flux star."""
    cfg = _fft_cfg()
    gal = _gal_host(flux=5e7, hlr=0.5, n_sersic=1.0, q=0.4, beta=0.0)
    img, modes, realized = render_ccd_pooled(3, gal, cfg)
    assert modes[0] == FFT
    a = np.asarray(img)
    # folding threshold (default 5e-3) legitimately leaves up to 0.5%
    # of the wings outside the stamp (imsim/stamp_utils.py semantics)
    assert abs(a.sum() - gal.flux[0]) < \
        4 * np.sqrt(gal.flux[0]) + 0.005 * gal.flux[0]
    yy, xx = np.mgrid[:256, :256]
    s = a.sum()
    cx = (a * xx).sum() / s
    cy = (a * yy).sum() / s
    assert abs(cx - 128.0) < 1.0 and abs(cy - 128.0) < 1.0
    vxx = (a * (xx - cx) ** 2).sum() / s
    vyy = (a * (yy - cy) ** 2).sum() / s
    # star of the same flux for comparison
    star = _bright_host(flux=5e7, pix=(128.0, 128.0))
    img_s, modes_s, _ = render_ccd_pooled(3, star, cfg)
    b = np.asarray(img_s)
    ss = b.sum()
    sxx = (b * (xx - 128.0) ** 2).sum() / ss
    # galaxy is extended: bigger second moment than the bare PSF
    assert vxx > 1.3 * sxx, (vxx, sxx)
    # beta=0, q=0.4: major axis along x after ellipse rotation
    assert vxx > 1.5 * vyy, (vxx, vyy)


def test_fft_galaxy_vs_extreme_faint_threshold():
    """A big diffuse galaxy whose point-approx peak exceeds the
    threshold but whose true (convolved) peak does not must STAY on
    the photon path (galaxy_peak_factor suppression)."""
    cfg = _fft_cfg()
    gal = _gal_host(flux=3e6, hlr=3.0, n_sersic=1.0)
    from imsim_tpu.image.photon_pooling import PHOT
    from imsim_tpu.image import fft_render as FR
    r0_500 = 0.9758834 * 500e-9 / (cfg.fwhm * np.pi / 180 / 3600)
    psf_mtf = FR.psf_mtf_table(622.0, r0_500, gauss_fwhm=cfg.gauss_fwhm)
    peak_pt = FR.peak_surface_brightness(gal.flux[:1], psf_mtf,
                                         cfg.pixel_scale)
    assert peak_pt[0] > cfg.fft_sb_thresh      # point approx would trigger
    modes = classify_objects(gal, cfg, psf_mtf)
    assert modes[0] == PHOT                    # suppression kept it photon


def test_photon_spike_orientation_tracks_rotator_and_field_rotation():
    """End-to-end orientation parity of the PHOTON-path spikes: the
    spider lives in the telescope frame, so spikes land at
    45 deg - rotTelPos in pixel coords (imsim/photon_ops.py:211-250;
    the reference's raytraced goldens in tests/data/fft-diffraction pin
    the same), and field rotation sweeps them by -theta(t) on the exact
    alt-az curve.  The FFT-overlay kernel uses the identical convention
    (alpha = 45 - rotTelPos, arms at alpha - theta), so this also pins
    photon-vs-overlay consistency."""
    import jax

    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.render import shoot_full
    from imsim_tpu.image.scene import DeviceScene, WL_CDF_K
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import make_optics_context

    DEG = np.pi / 180

    def folded_angle(x, y, w, cx, cy, r_min=5.0, r_max=250.0):
        dx, dy = x - cx, y - cy
        r = np.hypot(dx, dy)
        m = (r > r_min) & (r < r_max) & (w > 0)
        a = np.arctan2(dy[m], dx[m]) % (np.pi / 2)
        zm = np.exp(1j * 4 * a).mean()
        return np.degrees(np.angle(zm) / 4) % 90

    def shoot(rot_deg, ra_deg, dec_deg, exptime, fieldrot, n=1 << 21,
              mjd=60674.2, **obs_kw):
        fac = make_wcs_factory(ra_deg * DEG, dec_deg * DEG, mjd=mjd,
                               band="r", rotTelPos=rot_deg * DEG,
                               **obs_kw)
        ccd = get_camera("LsstCamSim")["R22_S11"]
        wcs = fac.get_wcs(ccd)
        ctx = make_optics_context(fac, ccd)
        tel = fac.telescope.for_detector(ccd.det_name)
        ra, dec = wcs.xy_to_radec(np.array([2000.0]), np.array([2000.0]))
        thx, thy = fac.icrf_to_field(ra, dec)
        wl = np.linspace(550.0, 690.0, WL_CDF_K, dtype=np.float32)
        scene = DeviceScene.from_columns(
            x=thx, y=thy, obj_type=np.zeros(1), p0=np.zeros(1),
            p1=np.ones(1), p2=np.ones(1), p3=np.zeros(1),
            g1=np.zeros(1), g2=np.zeros(1), mu=np.ones(1),
            wl_icdf=np.broadcast_to(wl, (1, WL_CDF_K)))
        obj = jnp.zeros((n,), jnp.int32)
        wt = jnp.ones((n,), jnp.float32)
        ph = jax.jit(lambda k: shoot_full(
            k, scene, obj, wt, tel, ctx, exptime=exptime,
            apply_dcr=False,
            diffraction_field_rotation=fieldrot))(jax.random.PRNGKey(3))
        x = np.asarray(ph.x)
        y = np.asarray(ph.y)
        w = np.asarray(ph.flux)
        cx, cy = np.average(x, weights=w), np.average(y, weights=w)
        return folded_angle(x, y, w, cx, cy), ctx

    # rotator: spikes at 45 - rotTelPos (estimator noise ~1.5 deg:
    # only ~5% of annulus photons are spike photons).  The same chain
    # reproduces the reference's raytraced golden 25.07 deg at its own
    # visit (tests/data/fft-diffraction, rtp=20) — pinned below.
    a20, _ = shoot(20.0, 30.0, -20.0, 30.0, False)
    assert abs(a20 - 25.0) < 3.0, a20
    # the reference's own raytraced golden visit (test_diffraction_fft
    # boresight, obstime 2022-08-06T06:50:59.3376 UTC, rtp=20):
    # raytrace_diffraction_values_0_exptime.npz records angle=25.07,
    # stddev 2.73
    a_ref, _ = shoot(20.0, np.degrees(1.1047934165124105),
                     np.degrees(-0.5261230452954583), 0.0, False,
                     mjd=59797.28540899977, time_scale="utc",
                     temperature_k=280.0, pressure_kpa=72.7,
                     h2o_pressure_kpa=1.0)
    assert abs(a_ref - 25.07) < 3.0, a_ref
    # field rotation at a theta<0 pointing: the -theta sweep must
    # INCREASE the folded angle.  (600 s at alt 75 gives theta ~ -4
    # deg; the old near-zenith pointing became degenerate — alt 90.0
    # exactly — once the TAI time scales were fixed.)
    a_rot, ctx = shoot(20.0, 100.0, -45.0, 600.0, True)
    from imsim_tpu.photons.diffraction import field_rotation_angle
    ts = np.linspace(0.0, 600.0, 16)
    th = np.degrees(np.asarray(field_rotation_angle(
        ts, np.radians(-30.24463), float(ctx.bore_alt),
        float(ctx.bore_az))))
    expected = (25.0 - th.mean()) % 90.0
    assert th.mean() < -3.0            # strongly rotating pointing
    d = (a_rot - expected + 45.0) % 90.0 - 45.0
    assert abs(d) < 3.0, (a_rot, expected)
