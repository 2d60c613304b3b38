"""Config-surface parity for the reference's documented option keys
(doc/config.rst): stamp.photon_ops selection (PhotonDCR /
RubinDiffraction[Optics] / disable_field_rotation), sky-model
eff_area/exp_time, flat max_counts_per_iter, skycat
apply_dc2_dilation, and diffraction_fft.spike_length_cutoff.
"""
import numpy as np

import jax
import jax.numpy as jnp

from imsim_tpu.config.runner import parse_photon_ops


def test_parse_photon_ops():
    # absent -> full chain
    assert parse_photon_ops(None) == (True, True, True)
    # the template default
    ops = [{"type": "PhotonDCR"}, {"type": "RubinDiffractionOptics"}]
    assert parse_photon_ops(ops) == (True, True, True)
    # no DCR
    assert parse_photon_ops([{"type": "RubinDiffraction"}]) == \
        (False, True, True)
    # optics only: no diffraction kick
    assert parse_photon_ops([{"type": "RubinOptics"},
                             {"type": "PhotonDCR"}]) == \
        (True, False, True)
    # disable_field_rotation rides on the diffraction op
    ops = [{"type": "PhotonDCR"},
           {"type": "RubinDiffractionOptics",
            "disable_field_rotation": True}]
    assert parse_photon_ops(ops) == (True, True, False)


def test_field_rotation_flag_changes_kicks():
    from imsim_tpu.photons.diffraction import apply_diffraction

    n = 4096
    key = jax.random.PRNGKey(3)
    ku, kv = jax.random.split(key)
    pu = jax.random.uniform(ku, (n,)) * 8.0 - 4.0
    pv = jax.random.uniform(kv, (n,)) * 8.0 - 4.0
    z = jnp.zeros(n)
    t = jnp.linspace(0.0, 30.0, n)
    common = dict(latitude=-0.5278, altitude=1.0, azimuth=0.7)
    dx1, dy1 = apply_diffraction(key, pu, pv, z, z, 622.0, t=t,
                                 enable_field_rotation=True, **common)
    dx0, dy0 = apply_diffraction(key, pu, pv, z, z, 622.0, t=t,
                                 enable_field_rotation=False, **common)
    # same RNG draws, different geometry: the rotated-frame kicks differ
    assert not np.allclose(np.asarray(dx1), np.asarray(dx0))
    # at t=0 the field rotation is the identity: the first photon's
    # kick agrees exactly; later photons see rotated geometry and
    # diverge (edge distances are steep near the vanes, so even small
    # t moves the kick of near-edge photons measurably)
    np.testing.assert_allclose(float(dx1[0]), float(dx0[0]), rtol=1e-6)
    np.testing.assert_allclose(float(dy1[0]), float(dy0[0]), rtol=1e-6)
    assert not np.allclose(np.asarray(dy1), np.asarray(dy0))


def test_sky_model_eff_area_exp_time():
    from imsim_tpu.catalog.bandpass import rubin_bandpass
    from imsim_tpu.catalog.opsim import from_dict
    from imsim_tpu.config.interpreter import ConfigView
    from imsim_tpu.config.registry import INPUT_TYPES

    meta = dict(band="r", exptime=30.0, airmass=1.0, sunAlt=-40.0)
    cfg = {"opsim_meta": meta}
    view = ConfigView(cfg)
    view.state["opsim_data"] = from_dict(dict(meta))
    view.state["bandpass"] = rubin_bandpass("r")
    ref = INPUT_TYPES["sky_model"](None, view)
    half = INPUT_TYPES["sky_model"](
        {"eff_area": ref.pupil_area / 2.0, "exp_time": 15.0}, view)
    assert half.pupil_area == ref.pupil_area / 2.0
    assert half.exptime == 15.0
    # sky photons scale with area x time
    r0 = ref.get_sky_level(1.0, -0.5)
    r1 = half.get_sky_level(1.0, -0.5)
    assert abs(r1 / r0 - 0.25) < 1e-6


def test_skycat_dc2_dilation(tmp_path):
    import pandas as pd

    from imsim_tpu.catalog.skycat import SkyCatalogInterface

    df = pd.DataFrame({
        "id": [1, 2],
        "ra": [30.0, 30.001],
        "dec": [-20.0, -20.001],
        "object_type": ["galaxy", "star"],
        "size_true": [1.2, 0.0],
        "axis_ratio": [0.25, 1.0],
        "sersic": [1.5, 1.0],
        "mag_norm": [22.0, 20.0],
    })
    p = str(tmp_path / "cat.parquet")
    df.to_parquet(p)
    plain = SkyCatalogInterface(p).to_object_table()
    dilated = SkyCatalogInterface(
        p, apply_dc2_dilation=True).to_object_table()
    i_gal = list(plain.id).index(1)
    # sqrt(a/b) = q^-1/2 = 2 for q = 0.25; stars untouched
    assert abs(dilated.p0[i_gal] / plain.p0[i_gal] - 2.0) < 1e-6
    i_star = list(plain.id).index(2)
    assert dilated.p0[i_star] == plain.p0[i_star]


def test_flat_max_counts_per_iter_alias(tmp_path):
    """image.max_counts_per_iter (the reference's key, imsim/flat.py:44)
    reaches FlatConfig.counts_per_iter through the runner."""
    from imsim_tpu.config.runner import build_visit_context, \
        render_one_ccd

    cfg = {
        "opsim_meta": {"band": "r", "exptime": 1.0, "seed": 3},
        "input": {"atm_psf": {"screen_size": 102.4,
                              "screen_scale": 0.8}},
        "image": {"type": "LSST_Flat", "counts_per_pixel": 50.0,
                  "max_counts_per_iter": 25.0, "xsize": 64,
                  "ysize": 64},
        "output": {"dir": str(tmp_path), "readout": {"enabled": False},
                   "truth": {"enabled": False}},
    }
    ctx = build_visit_context(cfg)
    res = render_one_ccd(ctx, 94, write=False)
    img = np.asarray(res["eimage"])
    assert img.shape == (64, 64)
    # 50 counts/pixel +- Poisson-ish
    assert abs(img.mean() - 50.0) < 5.0


def test_instcat_min_source():
    """input.instance_catalog.min_source skips a sensor with too few
    sersic objects (imsim/instcat.py InstCatalog min_source)."""
    import os

    from imsim_tpu.catalog.instcat import read_instcat

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "example_instance_catalog.txt")
    full = read_instcat(path)
    assert len(full) == 12
    # the example has 4 sersic2d rows: min_source=5 empties the table
    kept = read_instcat(path, min_source=5)
    assert len(kept) == 0
    kept = read_instcat(path, min_source=4)
    assert len(kept) == 12


def test_scene_max_flux():
    """sky_catalog.max_flux drops objects brighter than the cap
    (imsim/skycat.py getObj returns None above max_flux)."""
    import os

    import numpy as np

    from imsim_tpu.catalog.bandpass import rubin_bandpass
    from imsim_tpu.catalog.instcat import read_instcat
    from imsim_tpu.image.scene import build_scene

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "example_instance_catalog.txt")
    tab = read_instcat(path)
    bp = rubin_bandpass("r")
    sed_dirs = [os.path.join(os.path.dirname(__file__), "..",
                             "examples", "seds")]
    rng = np.random.default_rng(7)
    free = build_scene(tab, bp, sed_dirs, rng=rng).nominal_flux
    cap = float(np.median(free[free > 0]))
    rng = np.random.default_rng(7)
    capped = build_scene(tab, bp, sed_dirs, rng=rng,
                         max_flux=cap).nominal_flux
    assert np.any(free > cap)
    assert np.all(capped[free > cap] == 0)
    np.testing.assert_allclose(capped[free <= cap], free[free <= cap])


def test_opsim_data_overrides(tmp_path):
    """input.opsim_data snap/image_type/reason overrides reach the
    visit metadata (imsim/opsim_data.py loader options)."""
    from imsim_tpu.config.interpreter import ConfigView
    from imsim_tpu.config.registry import INPUT_TYPES

    cfg = {"opsim_meta": {"band": "r", "exptime": 30.0}}
    view = ConfigView(cfg)
    ods = INPUT_TYPES["opsim_data"](
        {"snap": 1, "image_type": "FLAT", "reason": "calibration"},
        view)
    assert ods.get("snap") == 1
    assert ods.get("image_type") == "FLAT"
    assert ods.get("reason") == "calibration"


def test_atm_psf_save_file(tmp_path):
    """input.atm_psf.save_file persists the built atmosphere and a
    second build reuses it (imsim/atmPSF.py:149-162 AtmLoader)."""
    from imsim_tpu.catalog.opsim import from_dict
    from imsim_tpu.config.interpreter import ConfigView
    from imsim_tpu.config.registry import INPUT_TYPES

    path = str(tmp_path / "atm.npz")
    meta = dict(band="r", exptime=30.0, seed=11, rawSeeing=0.7,
                altitude=80.0)
    node = {"screen_size": 102.4, "screen_scale": 0.8,
            "save_file": path}

    def build():
        view = ConfigView({"opsim_meta": meta})
        view.state["opsim_data"] = from_dict(dict(meta))
        return INPUT_TYPES["atm_psf"](dict(node), view)

    import os
    _, s1 = build()
    assert os.path.isfile(path)
    _, s2 = build()
    np.testing.assert_array_equal(np.asarray(s1.grad),
                                  np.asarray(s2.grad))
    np.testing.assert_array_equal(np.asarray(s1.winds),
                                  np.asarray(s2.winds))
    assert s1.scale == s2.scale and s1.size == s2.size


def test_stamp_method_fft_forces_fourier_branch():
    """stamp.method == 'fft' routes every FFT-capable object through
    the Fourier branch (imsim/stamp.py:270-286 method override)."""
    import os

    from imsim_tpu.catalog.bandpass import rubin_bandpass
    from imsim_tpu.catalog.instcat import read_instcat
    from imsim_tpu.image.photon_pooling import (FAINT, FFT,
                                                PoolingConfig,
                                                classify_objects)
    from imsim_tpu.image.scene import build_scene

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "example_instance_catalog.txt")
    tab = read_instcat(path)
    bp = rubin_bandpass("r")
    sed_dirs = [os.path.join(os.path.dirname(__file__), "..",
                             "examples", "seds")]
    host = build_scene(tab, bp, sed_dirs,
                       rng=np.random.default_rng(5))
    cfg = PoolingConfig(xsize=64, ysize=64, force_fft=True)
    modes = classify_objects(host, cfg)
    assert np.all((modes == FFT) | (modes == FAINT))
    assert np.any(modes == FFT)
    # max_flux_simple precedence: faint objects stay pooled
    faint = host.flux[:host.n_objects] < cfg.faint_thresh
    assert np.all(modes[faint] == FAINT)


def test_readout_level_overrides(tmp_path):
    """output.readout full_well / read_noise / bias_level reach the
    readout chain (imsim/readout.py camera-default overrides)."""
    import jax.numpy as jnp

    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.electronics.readout import CcdReadout

    ccd = get_camera("LsstCamSim")["R22_S11"]
    ro = CcdReadout(ccd, read_noise=0.0, bias_level=2500.0)
    key = jax.random.PRNGKey(0)
    ny, nx = ccd.bounds.height, ccd.bounds.width
    amps = np.asarray(ro.run(key, jnp.zeros((ny, nx), jnp.float32),
                             exptime=0.0))
    # zero image, zero read noise, zero exptime dark -> pure bias
    med = float(np.median(amps))
    assert abs(med - 2500.0) < 2.0
    assert float(np.std(amps.astype(float))) < 2.0


def test_wcs_sip_order_key():
    """image.wcs.order controls the TAN-SIP fit order
    (imsim/batoid_wcs.py:429-453, FittedSIPWCS order=3 default)."""
    import numpy as np
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.electronics.camera import get_camera

    DEG = np.pi / 180
    ccd = get_camera("LsstCamSim")["R22_S11"]
    f3 = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    f2 = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r",
                          order=2, telescope=f3.telescope)
    w3 = f3.get_wcs(ccd)
    w2 = f2.get_wcs(ccd)
    assert w3.order == 3
    assert w2.order == 2
    # both fits still agree at the pixel level in the CCD interior
    ra3, dec3 = w3.xy_to_radec(2048.0, 2048.0)
    ra2, dec2 = w2.xy_to_radec(2048.0, 2048.0)
    assert abs(ra3 - ra2) < 1e-6 and abs(dec3 - dec2) < 1e-6
