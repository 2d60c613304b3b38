"""Sky model component tests: zodiacal floor, twilight brightening,
moonlight, rewritten fringing heightfield, skyline-surface loading.
(Analytic stand-ins for rubin_sim.skybrightness; imsim/sky_model.py.)
"""
import numpy as np

from imsim_tpu.catalog.bandpass import rubin_bandpass
from imsim_tpu.image.sky import (CCD_Fringing, SkyModel,
                                 ecliptic_latitude)


def _model(**kw):
    bp = rubin_bandpass("r")
    return SkyModel(30.0, 60674.0, bp, **kw)


def test_zodiacal_brighter_on_ecliptic():
    m = _model()
    # ecliptic pole vs in-plane pointing (moon down, dark time)
    b_pole = m.get_sky_level(np.radians(270.0), np.radians(66.56))
    b_plane = m.get_sky_level(np.radians(0.0), np.radians(0.0))
    assert abs(ecliptic_latitude(np.radians(270.0),
                                 np.radians(66.56))) > np.radians(85)
    assert abs(ecliptic_latitude(0.0, 0.0)) < np.radians(1)
    assert b_plane > b_pole * 1.005


def test_twilight_brightens_sky():
    dark = _model(sun_alt_rad=np.radians(-40.0)).get_sky_level(1.0, -0.5)
    twil = _model(sun_alt_rad=np.radians(-12.0)).get_sky_level(1.0, -0.5)
    deep = _model(sun_alt_rad=np.radians(-6.0)).get_sky_level(1.0, -0.5)
    assert twil > 2 * dark
    assert deep > 10 * twil


def test_moonlight_brightens_sky():
    dark = _model().get_sky_level(1.0, -0.5)
    moony = _model(moon_phase_deg=0.0, moon_alt_rad=np.radians(45.0),
                   moon_ra=1.3, moon_dec=-0.5).get_sky_level(1.0, -0.5)
    assert moony > 1.5 * dark


def test_opsim_units_reach_sky_model():
    """The opsim schema carries moonAlt/moonRA/moonDec in DEGREES and
    moonPhase as percent illuminated; the sky_model input handler must
    convert (degrees -> radians, percent -> K&S phase angle) before
    constructing SkyModel."""
    from imsim_tpu.config.interpreter import ConfigView
    from imsim_tpu.config.registry import INPUT_TYPES

    def build(meta):
        cfg = {"opsim_meta": meta}
        view = ConfigView(cfg)
        from imsim_tpu.catalog.opsim import from_dict

        view.state["opsim_data"] = from_dict(dict(meta))
        view.state["bandpass"] = rubin_bandpass("r")
        return INPUT_TYPES["sky_model"](None, view)

    # pin the sun well below twilight so the moon term is what varies
    base = dict(band="r", exptime=30.0, airmass=1.1, sunAlt=-40.0)
    # full moon at 45 deg altitude, 30 deg from the field
    sky_full = build(dict(base, moonPhase=100.0, moonAlt=45.0,
                          moonRA=30.0, moonDec=0.0))
    assert abs(sky_full.moon_alt_rad - np.radians(45.0)) < 1e-9
    assert abs(sky_full.moon_phase_deg - 0.0) < 1e-9   # alpha=0 = full
    assert abs(sky_full.moon_ra - np.radians(30.0)) < 1e-9
    # new moon -> alpha = 180
    sky_new = build(dict(base, moonPhase=0.0, moonAlt=45.0))
    assert abs(sky_new.moon_phase_deg - 180.0) < 1e-9
    # moon below horizon (degrees!) contributes nothing even at -10
    sky_down = build(dict(base, moonPhase=100.0, moonAlt=-10.0,
                          moonRA=30.0, moonDec=0.0))
    lvl_down = sky_down.get_sky_level(0.0, 0.0)
    lvl_up = sky_full.get_sky_level(0.0, 0.0)
    assert lvl_up > 1.5 * lvl_down


def test_phosim_header_moon_keys(tmp_path):
    """phoSim lowercase moon/sun header keys normalize to the opsim
    names the sky model reads (imsim/opsim_data.py:158-206 parity)."""
    from imsim_tpu.catalog.opsim import read_instcat_header

    p = tmp_path / "cat.txt"
    p.write_text("rightascension 30.0\ndeclination -20.0\nmjd 60674.2\n"
                 "filter 2\nmoonalt 37.5\nmoonphase 82.0\n"
                 "moonra 100.0\nmoondec -12.0\nsunalt -33.0\n"
                 "dist2moon 55.0\n")
    ods = read_instcat_header(str(p))
    assert float(ods.get("moonAlt")) == 37.5
    assert float(ods.get("moonPhase")) == 82.0
    assert float(ods.get("moonRA")) == 100.0
    assert float(ods.get("sunAlt")) == -33.0
    assert float(ods.get("moonDistance")) == 55.0


def test_opsim_sun_altitude_derived():
    from imsim_tpu.catalog.opsim import from_dict

    # midnight-ish at Rubin: sun well below horizon
    d = from_dict({"observationStartMJD": 60674.2, "fieldRA": 30.0,
                   "fieldDec": -20.0, "band": "r"})
    assert "sunAlt" in d.meta
    assert -90.0 <= d.meta["sunAlt"] <= 90.0


def test_fringing_heightfield_statistics():
    fr = CCD_Fringing(seed=12345)
    X = fr.generate_heightfield(2.5, 512)
    assert X.shape == (512, 512)
    assert np.isrealobj(X)
    # deterministic
    X2 = CCD_Fringing(seed=12345).generate_heightfield(2.5, 512)
    np.testing.assert_array_equal(X, X2)
    assert not np.array_equal(
        X, CCD_Fringing(seed=54321).generate_heightfield(2.5, 512))
    # long-range correlated surface: smooth at the few-pixel scale
    d1 = np.std(np.diff(X, axis=0))
    assert d1 < 0.2 * np.std(X)


def test_fringing_map_amplitude_and_skyline_surface():
    fr = CCD_Fringing(seed=7)
    Z = fr.fringing_map((512, 512))
    assert abs(Z.mean() - 1.0) < 1e-3
    assert 0.0005 < Z.std() < 0.004
    # a loadable skyline-variation surface modulates the local amplitude
    sv = np.ones((16, 16))
    sv[:, 8:] = 2.0
    Z2 = fr.fringing_map((512, 512), skyline_surface=sv)
    left = Z2[:, :200] - 1.0
    right = Z2[:, -200:] - 1.0
    assert right.std() > 1.5 * left.std()


def test_eimage_read_noise_surface():
    """image.noise {type: CCD, gain, read_noise}: the eimage noise stage
    Poisson-samples only the sky (objects carry shot noise from photon
    shooting) plus an optional read_noise/gain Gaussian floor — the
    reference template runs read_noise 0 and defers read noise to the
    raw-file chain (config/imsim-config.yaml:209-212)."""
    import jax
    import jax.numpy as jnp
    from imsim_tpu.image.ccd_render import _add_sky_and_noise

    key = jax.random.PRNGKey(5)
    img = jnp.zeros((256, 256), jnp.float32)
    grad = (jnp.float32(0), jnp.float32(0), jnp.float32(1))
    vig = jnp.ones((256, 256), jnp.float32)
    sky = 400.0  # e-/arcsec^2 -> 16 e-/pix at 0.2"
    base = np.asarray(_add_sky_and_noise(key, img, jnp.float32(sky),
                                         grad, vig, 0.2))
    rn = np.asarray(_add_sky_and_noise(key, img, jnp.float32(sky),
                                       grad, vig, 0.2,
                                       read_noise=8.0, gain=2.0))
    lvl = sky * 0.04
    assert abs(base.mean() - lvl) < 0.2
    assert abs(base.var() - lvl) < 0.1 * lvl + 0.3
    # extra variance = (read_noise/gain)^2 = 16
    extra = rn.var() - base.var()
    assert abs(extra - 16.0) < 2.0
