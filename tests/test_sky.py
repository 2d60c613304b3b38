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
