"""Statistical validation of block antithetic pupil pairing.

The pooled photon layout shares one (pupil point, arrival time,
phase-screen gather) draw among ``pair`` slots (s, s+m, ...) — see
image/photon_pooling.py::build_obj_map and image/render.py::shoot_full.
The production default is pair=4.  This test renders the same star
repeatedly through the FULL chain (screens + second kick + DCR +
raytrace + silicon) at pair=1 and pair=4 and asserts the delivered PSF
is statistically indistinguishable:

  * mean adaptive size (sigma) agrees between pair modes,
  * trial-to-trial size dispersion does not inflate,
  * per-pixel variance across trials stays Poisson-consistent in the
    stamp core (var/mean ~ 1), the BASELINE.md consistency criterion.

The wider study (pair = 1/4/8, 12 trials of 1e5 photons) lives in
benchmarks/pair_experiment.py; its measured result — pair=4 matches
pair=1 (sigma std 0.011 vs 0.012 px, var/mean 0.94 vs 0.97) while
pair=8 doubles the size dispersion (0.021 px) — is why 4 is the
default and 8 is not.

Reference analog: imSim draws every photon's pupil sample
independently (GalSim PhotonArray); pairing is this framework's
speed/fidelity trade, so it carries its own acceptance test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


FLUX = 60_000
TRIALS = 6


@pytest.fixture(scope="module")
def star_renderer():
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
    screens = make_screens(42 + 271828, AtmConfig(fwhm=0.7))
    sk_poly, _ = PolyCDF.fit(second_kick_table(AtmConfig(fwhm=0.7), 622.0))
    silicon = SiliconParams.make()

    wl = np.linspace(552.0, 691.0, WL_CDF_K).astype(np.float32)
    npad = 8
    z = np.zeros(npad, np.float32)
    scene = DeviceScene.from_columns(
        x=z + np.float32(thx[0]), y=z + np.float32(thy[0]),
        obj_type=z, p0=z + 0.1, p1=z + 1.0, p2=z + 1.0, p3=z,
        g1=z, g2=z, mu=z + 1.0,
        wl_icdf=np.broadcast_to(wl, (npad, WL_CDF_K)))

    cum = np.full(npad, FLUX, np.int32)
    cum_dev = jnp.asarray(cum)

    def render_one(key, pair, share=1):
        omap = build_obj_map(cum_dev, jnp.int32(FLUX), 1, FLUX, pair,
                             share)
        obj_idx, w = batch_from_obj_map(omap, jnp.int32(FLUX), 0, 1,
                                        FLUX, pair, share)
        mat = jnp.concatenate([scene.params, scene.wl_cheb], axis=1)
        row = materialize_rows_T(mat, cum_dev, 0, 1, FLUX, pair, share)
        ph = shoot_full(key, scene, obj_idx, w, tel, octx,
                        screens=screens, sk_table=sk_poly, exptime=30.0,
                        row=row, pupil_pairing=pair, screen_share=share)
        img = jnp.zeros((4096, 4096), jnp.float32)
        return accumulate_silicon(jax.random.fold_in(key, 7), ph, img,
                                  silicon, nsub=1)

    return jax.jit(render_one, static_argnames=("pair", "share"))


def _stats(render_j, pair, share=1):
    sizes, stamps = [], []
    cxy = None
    for t in range(TRIALS):
        img = np.asarray(render_j(jax.random.PRNGKey(7000 + t), pair,
                                  share))
        # FIXED stamp frame for every trial: re-centering on the
        # per-trial argmax made the per-pixel trial variance explode
        # whenever the peak pixel hopped by one (two near-equal core
        # pixels), swamping the excess statistic with alignment noise
        # rather than sampling noise.  The star is always drawn at the
        # same truth position, so a common window is the right frame.
        if cxy is None:
            sub = img[2048 - 64:2048 + 64, 2048 - 64:2048 + 64]
            iy, ix = np.unravel_index(np.argmax(sub), sub.shape)
            cxy = (2048 - 64 + ix, 2048 - 64 + iy)
        cx, cy = cxy
        s = img[cy - 24:cy + 25, cx - 24:cx + 25]
        yy, xx = np.mgrid[-24:25, -24:25]
        tot = s.sum()
        assert tot > 0.9 * FLUX  # nothing lost off-stamp
        mx, my = (s * xx).sum() / tot, (s * yy).sum() / tot
        ixx = (s * (xx - mx) ** 2).sum() / tot
        iyy = (s * (yy - my) ** 2).sum() / tot
        sizes.append(np.sqrt(0.5 * (ixx + iyy)))
        stamps.append(s)
    stamps = np.array(stamps)
    mean, var = stamps.mean(0), stamps.var(0, ddof=1)
    core = mean > np.percentile(mean, 99.0)
    excess = float((var[core] / np.maximum(mean[core], 1e-9)).mean())
    return np.array(sizes), excess


def test_pair4_matches_pair1(star_renderer):
    s1, ex1 = _stats(star_renderer, 1)
    s4, ex4 = _stats(star_renderer, 4)
    # Mean delivered PSF size agrees within the trial scatter
    # (speckle-to-speckle sigma dispersion is ~0.4% of sigma).
    sem = np.hypot(s1.std(ddof=1), s4.std(ddof=1)) / np.sqrt(TRIALS)
    assert abs(s1.mean() - s4.mean()) < 3.0 * sem + 0.01
    # Pairing must not inflate the trial-to-trial size dispersion
    # (pair=8 fails this: ~2x the pair=1 dispersion).
    assert s4.std(ddof=1) < 2.0 * s1.std(ddof=1) + 0.005
    # Per-pixel variance across independent trials stays Poisson-like
    # in the core: no pairing-induced super-Poisson clumping.
    assert 0.6 < ex1 < 1.5
    assert 0.6 < ex4 < 1.5


def test_stratified_share4_matches_pair4(star_renderer):
    """The production default (pair=4, screen_share=4): weak phase-
    screen layers share one gather among 16 adjacent photons while the
    strong layers (>= 80% cumulative weight) keep pair granularity.
    benchmarks/pair_experiment.py measured sigma trial std 0.012 px vs
    0.011 (pair=4) and 0.009 (pair=1), centroid std 0.016 px, core
    var/mean 0.95 — i.e. the pair=4 envelope, nowhere near the pair=8
    failure (0.022).  This gate re-checks the same statistics."""
    s1, ex1 = _stats(star_renderer, 1)
    ss, exs = _stats(star_renderer, 4, 4)
    sem = np.hypot(s1.std(ddof=1), ss.std(ddof=1)) / np.sqrt(TRIALS)
    assert abs(s1.mean() - ss.mean()) < 3.0 * sem + 0.01
    assert ss.std(ddof=1) < 2.0 * s1.std(ddof=1) + 0.005
    assert 0.6 < exs < 1.5
