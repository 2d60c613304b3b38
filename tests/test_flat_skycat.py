"""Flat-field builder + sky-catalog interface tests (reference analogs:
tests/test_flat.py BF photon-transfer behavior, tests/test_skycat.py)."""
import numpy as np
import pytest

from imsim_tpu.catalog.instcat import POINT, SERSIC
from imsim_tpu.catalog.skycat import SkyCatalogInterface
from imsim_tpu.image.flat import FlatConfig, build_flat, flat_statistics
from imsim_tpu.sensor.silicon import SiliconParams


def test_flat_brighter_fatter_ptc():
    """The BF pixel-area coupling must suppress variance below Poisson
    (photon transfer curve bends down) while conserving the mean."""
    cfg = FlatConfig(counts_per_pixel=40_000.0, counts_per_iter=2000.0,
                     xsize=256, ysize=256)
    # stronger-than-default BF for a clear PTC signal (default 0.4 is
    # the calibrated physical scale; the sign/mechanism is what this
    # test pins down).  Note: >~1.3 destabilizes the per-iteration
    # area-factor linearization at 2000 counts/iter.
    params = SiliconParams.make(bf_strength=1.1)
    img = build_flat(3, cfg, params)
    st = flat_statistics(img)
    assert abs(st["mean"] - 40_000.0) < 200.0
    # pure Poisson would give var/mean = 1; BF smoothing pulls it below
    assert st["var_over_mean"] < 0.97, st
    # no-BF control stays Poisson
    p0 = SiliconParams.make(bf_strength=0.0)
    st0 = flat_statistics(build_flat(3, cfg, p0))
    assert abs(st0["var_over_mean"] - 1.0) < 0.03, st0


def test_skycat_parquet_roundtrip(tmp_path):
    import pandas as pd

    n = 50
    rng = np.random.default_rng(0)
    df = pd.DataFrame(dict(
        id=np.arange(n),
        ra=30.0 + rng.uniform(-0.1, 0.1, n),
        dec=-20.0 + rng.uniform(-0.1, 0.1, n),
        magnorm=rng.uniform(20, 25, n),
        object_type=np.where(rng.uniform(size=n) < 0.4, "star", "galaxy"),
        sed_filepath=["flatSED/sed_flat.txt"] * n,
        redshift=rng.uniform(0, 1, n),
        size_true=rng.uniform(0.1, 1.0, n),
        sersic_index=rng.uniform(0.5, 4.0, n),
        axis_ratio=rng.uniform(0.3, 1.0, n),
        position_angle=rng.uniform(0, 180, n),
        shear_1=rng.normal(0, 0.02, n),
        shear_2=rng.normal(0, 0.02, n),
        convergence=rng.normal(0, 0.01, n),
        MW_av=rng.uniform(0, 0.2, n),
        MW_rv=np.full(n, 3.1),
    ))
    p = str(tmp_path / "cat.parquet")
    df.to_parquet(p)

    sc = SkyCatalogInterface(p)
    assert sc.getNObjects() == n
    tab = sc.to_object_table()
    assert len(tab) == n
    stars = tab.obj_type == POINT
    gals = tab.obj_type == SERSIC
    assert stars.sum() + gals.sum() == n
    # galaxies carry profile params; lensing converted to reduced shear
    assert np.all(tab.p0[gals] > 0)
    assert np.all((tab.p1[gals] >= 0.3) & (tab.p1[gals] <= 6.2))
    assert np.all(np.abs(tab.mu - 1.0) < 0.2)

    # obj_types filter
    sc2 = SkyCatalogInterface(p, obj_types=("star",))
    assert len(sc2.to_object_table()) == int(stars.sum())

    # pixel-box cull with a simple WCS
    class FakeWCS:
        def radec_to_xy(self, ra, dec):
            return ((ra - 30.0 * np.pi / 180) / 5.5e-5 / (np.pi / 180) + 2000,
                    (dec + 20.0 * np.pi / 180) / 5.5e-5 / (np.pi / 180) + 2000)
    tab3 = sc.to_object_table(wcs=FakeWCS(), xsize=4000, ysize=4000,
                              edge_pix=50)
    assert 0 < len(tab3) <= n


def test_skycat_multicomponent_galaxy(tmp_path):
    """DC2-style per-component columns expand each galaxy into
    bulge + disk + knots rows (imsim/skycat.py:147-203 builds a
    galsim.Add of the components), with the flux split
    bulge_frac / disk*(1-knots_ratio) / knots and knots carrying the
    disk morphology."""
    import pandas as pd

    from imsim_tpu.catalog.instcat import KNOTS

    df = pd.DataFrame(dict(
        id=[1, 2],
        ra=[30.0, 30.001], dec=[-20.0, -20.001],
        magnorm=[22.0, 21.0],
        object_type=["galaxy", "star"],
        sed_filepath=["flatSED/sed_flat.txt"] * 2,
        redshift=[0.5, 0.0],
        size_bulge_true=[0.4, np.nan],
        size_minor_bulge_true=[0.3, np.nan],
        sersic_bulge=[4.0, np.nan],
        size_disk_true=[1.2, np.nan],
        size_minor_disk_true=[0.6, np.nan],
        sersic_disk=[1.0, np.nan],
        bulge_frac=[0.3, np.nan],
        knots_flux_ratio=[0.2, np.nan],
        n_knots=[25, 0],
        shear_1=[0.01, 0.0], shear_2=[-0.02, 0.0],
        convergence=[0.0, 0.0],
    ))
    p = tmp_path / "cat.parquet"
    df.to_parquet(p)
    cat = SkyCatalogInterface(str(p))
    tab = cat.to_object_table()
    # star + bulge + disk + knots
    assert len(tab) == 4
    kinds = sorted(tab.obj_type.tolist())
    assert kinds == sorted([POINT, SERSIC, SERSIC, KNOTS])
    gal_rows = tab.obj_type == SERSIC
    knot_rows = tab.obj_type == KNOTS
    # bulge: n=4, hlr = sqrt(0.4*0.3), q=0.75; disk: n=1
    ns = np.sort(tab.p1[gal_rows])
    assert abs(ns[0] - 1.0) < 1e-6 and abs(ns[1] - 4.0) < 1e-6
    assert abs(tab.p1[knot_rows][0] - 25) < 1e-6        # n_knots
    # flux split: 10^(-0.4 dmag) fractions sum to 1
    base_mag = 22.0
    fracs = 10 ** (-0.4 * (tab.magnorm[gal_rows | knot_rows] - base_mag))
    assert abs(fracs.sum() - 1.0) < 1e-6
    # knots row inherits disk morphology
    krow = np.nonzero(knot_rows)[0][0]
    assert abs(tab.p0[krow] - np.sqrt(1.2 * 0.6)) < 1e-6
    # star row untouched
    srow = np.nonzero(tab.obj_type == POINT)[0][0]
    assert abs(tab.magnorm[srow] - 21.0) < 1e-6

    # idempotent: repeated calls on the SAME interface must not
    # re-expand the already-expanded component rows (ADVICE r2)
    tab2 = cat.to_object_table()
    assert len(tab2) == len(tab)
    np.testing.assert_allclose(np.sort(tab2.magnorm),
                               np.sort(tab.magnorm), rtol=0, atol=1e-12)
    tab3 = cat.to_object_table()
    assert len(tab3) == len(tab)


def test_skycat_dropped_component_flux_redistributed(tmp_path):
    """A component with a positive nominal flux share that cannot be
    built (n_knots<1, or size<=0) must fold its share back into the
    surviving components instead of silently dropping it (ADVICE r2):
    the reference only carves out flux for components it actually
    builds (imsim/skycat.py:147-203)."""
    import pandas as pd

    df = pd.DataFrame(dict(
        id=[1, 2],
        ra=[30.0, 30.001], dec=[-20.0, -20.001],
        magnorm=[22.0, 23.0],
        object_type=["galaxy", "galaxy"],
        sed_filepath=["flatSED/sed_flat.txt"] * 2,
        redshift=[0.5, 0.4],
        # gal 1: knots_flux_ratio > 0 but n_knots = 0 -> knots share
        # must flow back to the disk
        # gal 2: bulge_frac > 0 but size_bulge_true = 0 -> bulge share
        # must flow to the disk
        size_bulge_true=[0.4, 0.0],
        size_minor_bulge_true=[0.3, 0.0],
        sersic_bulge=[4.0, 4.0],
        size_disk_true=[1.2, 0.9],
        size_minor_disk_true=[0.6, 0.9],
        sersic_disk=[1.0, 1.0],
        bulge_frac=[0.3, 0.5],
        knots_flux_ratio=[0.2, 0.0],
        n_knots=[0, 0],
        shear_1=[0.0, 0.0], shear_2=[0.0, 0.0],
        convergence=[0.0, 0.0],
    ))
    p = tmp_path / "cat.parquet"
    df.to_parquet(p)
    tab = SkyCatalogInterface(str(p)).to_object_table()
    # gal 1 -> bulge + disk (no knots row); gal 2 -> disk only
    assert len(tab) == 3
    assert np.all(tab.obj_type == SERSIC)
    for gid, base_mag in ((1, 22.0), (2, 23.0)):
        rows = np.array([str(i) == str(gid) for i in tab.id])
        fracs = 10 ** (-0.4 * (tab.magnorm[rows] - base_mag))
        # total flux conserved: dropped component shares were folded in
        assert abs(fracs.sum() - 1.0) < 1e-9, (gid, fracs)


def test_flat_photon_shooting_sed_path():
    """The SED photon-shooting flat (imsim/flat.py:239-264 branch):
    wavelengths ride through the full silicon model, so a NIR SED
    loses photons to pass-through (mean below nominal) while an
    optical SED lands them all; noise stays ~Poisson."""
    import jax.numpy as jnp

    from imsim_tpu.image.flat import FlatConfig, build_flat_photons

    cfg = FlatConfig(counts_per_pixel=1000.0, counts_per_iter=250.0,
                     xsize=96, ysize=96)
    params = SiliconParams.make(bf_strength=0.0)

    icdf_opt = np.full(96, 620.0, np.float32)    # all photons at 620 nm
    img_opt = build_flat_photons(2, cfg, icdf_opt, params)
    st = flat_statistics(img_opt)
    assert abs(st["mean"] - 1000.0) < 15.0, st
    assert abs(st["var_over_mean"] - 1.0) < 0.06, st

    icdf_nir = np.full(96, 1050.0, np.float32)   # deep-converting NIR
    img_nir = build_flat_photons(2, cfg, icdf_nir, params)
    st_n = flat_statistics(img_nir)
    # l_abs(1050nm) ~ 400 um >> 100 um thickness: most photons pass
    # through the device entirely
    assert st_n["mean"] < 0.5 * st["mean"], st_n


def test_flat_photon_sed_via_runner(tmp_path):
    """image.sed switches the LSST_Flat builder to the photon branch."""
    import numpy as np

    from imsim_tpu.config.runner import run_visit

    d = tmp_path / "seds" / "flatSED"
    d.mkdir(parents=True)
    w = np.linspace(300, 1150, 200)
    np.savetxt(d / "sed_flat.txt", np.column_stack([w, np.ones_like(w)]))
    out = str(tmp_path / "out")
    res = run_visit(
        {"template": "imsim-config-flat"},
        overrides=[
            "image.counts_per_pixel=2",
            "image.counts_per_iter=1",
            "image.sed=flatSED/sed_flat.txt",
            f"input.instance_catalog.sed_dir={tmp_path / 'seds'}",
            "input.atm_psf.screen_size=102.4",
            "input.atm_psf.screen_scale=0.8",
            f"output.dir={out}",
            "output.det_num=[94]",
            "output.file_name=flat_{det_name}.fits",
        ])
    img = res[0]["eimage"]
    # flat SED x r-band: every wavelength converts; mean ~ nominal
    assert abs(img.mean() - 2.0) < 0.2


def test_flat_countrate_per_pixel(tmp_path):
    """image.countrate_per_pixel * exptime sets the flat level
    (imsim/flat.py:61-67); counts_per_pixel wins when both are given."""
    import numpy as np

    from imsim_tpu.config.runner import run_visit

    out = str(tmp_path / "out")
    res = run_visit(
        {"template": "imsim-config-flat"},
        overrides=[
            # default exptime 30 s -> 0.2 * 30 = 6 counts/px
            "image.countrate_per_pixel=0.2",
            "image.counts_per_iter=3",
            "image.xsize=64", "image.ysize=64",
            "input.atm_psf.screen_size=102.4",
            "input.atm_psf.screen_scale=0.8",
            f"output.dir={out}",
            "output.det_num=[94]",
            "output.file_name=flat_{det_name}.fits",
        ])
    img = np.asarray(res[0]["eimage"], np.float64)
    mean = img.mean()
    # Poisson mean 6 over 64x64 px -> sem ~ 6/sqrt(4096) ~ 0.04
    assert abs(mean - 6.0) < 0.3, mean
