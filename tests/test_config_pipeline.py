"""End-to-end config pipeline: YAML -> rendered eimage + raw amp FITS +
truth catalog — the analog of the reference's CI runs
(`galsim imsim-user-instcat.yaml image.nobjects=10`,
.github/workflows/ci.yml:128-133) and tests/test_image.py photometry."""
import os

import numpy as np
import pytest

from imsim_tpu.config.interpreter import ConfigView, load_config
from imsim_tpu.io.fits import read_fits


@pytest.fixture(scope="module")
def sed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seds")
    (d / "flatSED").mkdir()
    w = np.linspace(300, 1150, 200)
    np.savetxt(d / "flatSED" / "sed_flat.txt",
               np.column_stack([w, np.ones_like(w)]))
    return str(d)


@pytest.fixture(scope="module")
def instcat(tmp_path_factory):
    d = tmp_path_factory.mktemp("cat")
    p = d / "tiny_instcat.txt"
    # header + objects near the boresight (R22_S11 center)
    lines = [
        "rightascension 30.0", "declination -20.0", "mjd 60674.2",
        "filter 2", "seeing 0.7", "vistime 30.0", "rottelpos 0.0",
        "obshistid 4242", "altitude 60.0",
    ]
    rng = np.random.default_rng(5)
    for i in range(8):
        ra = 30.0 + rng.uniform(-0.05, 0.05)
        dec = -20.0 + rng.uniform(-0.05, 0.05)
        mag = rng.uniform(20.0, 23.0)
        if i % 2 == 0:
            lines.append(
                f"object {i} {ra:.6f} {dec:.6f} {mag:.2f} "
                "flatSED/sed_flat.txt 0 0 0 0 0 0 point none none")
        else:
            lines.append(
                f"object {i} {ra:.6f} {dec:.6f} {mag:.2f} "
                "flatSED/sed_flat.txt 0.1 0.01 -0.01 0.02 0 0 "
                "sersic2d 1.2 0.8 30.0 1.5 none CCM 0.02 3.1")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_interpreter_templates_and_eval(tmp_path):
    user = {
        "template": "imsim-config-instcat",
        "input.instance_catalog.file_name": "x.txt",
        "image.nbatch": 3,
        "eval_variables": {"ffoo": 2.5, "sname": "abc"},
        "custom": {"v": "$foo * 2", "w": "@image.nbatch"},
    }
    cfg = load_config(user)
    assert cfg["image"]["nbatch"] == 3
    assert cfg["input"]["instance_catalog"]["file_name"] == "x.txt"
    assert cfg["image"]["type"] == "LSST_PhotonPoolingImage"  # inherited
    view = ConfigView(cfg)
    from imsim_tpu.catalog.opsim import from_dict
    view.state["opsim_data"] = from_dict(dict(band="r"))
    assert view.get("custom.v") == 5.0
    assert view.get("custom.w") == 3


def test_visit_end_to_end(tmp_path, instcat, sed_dir):
    """Full visit through the CLI-equivalent entry: eimage photometry
    within 4 sigma, valid FITS, RICE amp file roundtrip, truth catalog."""
    from imsim_tpu.config.runner import run_visit

    out = str(tmp_path / "out")
    results = run_visit(
        {"template": "imsim-config-instcat"},
        overrides=[
            f"input.instance_catalog.file_name={instcat}",
            f"input.instance_catalog.sed_dir={sed_dir}",
            "input.atm_psf.screen_size=102.4",
            "input.atm_psf.screen_scale=0.8",
            f"output.dir={out}",
            "output.det_num=[94]",
            "output.file_name=eimage_{det_name}.fits",
            "output.readout.file_name=amp_{det_name}.fits",
            "output.truth.file_name=centroid_{det_name}.txt",
            "image.batch_size=200000",
            "image.nbatch=2",
            "output.cosmic_ray_rate=0.05",
        ])
    assert len(results) == 1
    r = results[0]
    assert r["det_name"] == "R22_S11"
    eimage = r["eimage"]
    host = r["host"]
    assert host.n_objects >= 6          # most objects near center kept

    # aperture photometry at truth positions, 4 sigma Poisson criterion
    # (tests/test_image.py:18-29 analog); background from the image edge
    sky = np.mean(eimage[:100, :100])
    assert sky > 10.0                   # sky got added
    # columns: object_id ra dec x y nominal phot fft realized mode
    truth_xy = np.loadtxt(os.path.join(out, "centroid_R22_S11.txt"),
                          usecols=(3, 4))
    R = 25
    ny, nx = eimage.shape
    n_ok = 0
    for i in range(host.n_objects):
        x, y = truth_xy[i]
        if not (R < x < nx - R and R < y < ny - R):
            continue
        box = eimage[int(y) - R:int(y) + R, int(x) - R:int(x) + R]
        sig = box.sum() - sky * box.size
        expect_i = host.flux[i]
        noise = np.sqrt(box.size * sky + expect_i)
        assert abs(sig - expect_i) < 5 * noise + 0.2 * expect_i, \
            (i, sig, expect_i, noise)
        if expect_i > 5 * noise:
            n_ok += 1
    assert n_ok >= 2                    # bright objects clearly detected

    # files exist and parse
    hdus = read_fits(os.path.join(out, "eimage_R22_S11.fits"))
    hdr, data = hdus[0]
    assert data.shape == eimage.shape
    assert hdr["FILTER"] == "r"
    assert hdr["CTYPE1"].startswith("RA---TAN")

    amp_hdus = read_fits(os.path.join(out, "amp_R22_S11.fits"))
    assert len(amp_hdus) == 17          # primary + 16 RICE segments
    seg = amp_hdus[1][1]
    assert seg.shape[0] > 2000 and seg.dtype == np.int32
    assert np.median(seg) > 500         # bias level present

    truth = np.loadtxt(os.path.join(out, "centroid_R22_S11.txt"),
                       usecols=(1, 2, 3, 4, 5, 6, 7, 8))
    assert truth.shape[0] == host.n_objects
    # nominal >= phot+fft split is consistent: phot+fft == drawn flux
    assert np.all(truth[:, 4] > 0)                    # nominal flux
    assert np.all((truth[:, 5] > 0) ^ (truth[:, 6] > 0) |
                  ((truth[:, 5] == 0) & (truth[:, 6] == 0)))


def test_visit_checkpoint_resume(tmp_path, instcat, sed_dir):
    from imsim_tpu.config.runner import run_visit

    over = [
        f"input.instance_catalog.file_name={instcat}",
        f"input.instance_catalog.sed_dir={sed_dir}",
        "input.atm_psf.screen_size=102.4",
        "input.atm_psf.screen_scale=0.8",
        "output.det_num=[94]",
        "output.readout.enabled=false",
        "output.cosmic_ray_rate=0.0",
        "image.batch_size=100000",
        "image.nbatch=2",
        f"input.checkpoint.dir={tmp_path}/ck",
    ]
    r1 = run_visit({"template": "imsim-config-instcat"},
                   overrides=over + [f"output.dir={tmp_path}/o1"])
    # second run resumes from the final checkpoint -> identical eimage
    # modulo sky/CR noise streams which are re-applied... so compare the
    # checkpointed photon image instead
    from imsim_tpu.io.checkpoint import Checkpointer
    # Default names are visit/band/detector-keyed (checkpoint_VVVVVVVV-
    # b-DET.h5) so concurrent visits can share a checkpoint dir.
    (ck_file,) = (tmp_path / "ck").glob("checkpoint_*-*-R22_S11.h5")
    ck = Checkpointer(str(ck_file))
    saved = ck.load("pooled")
    assert saved is not None and saved["next_batch"] >= 2
    assert saved["image"].sum() > 0


def test_image_nobjects_cap(tmp_path, instcat, sed_dir):
    """image.nobjects caps the rendered object count (the reference's
    CI drives `galsim ... image.nobjects=10`, imsim/lsst_image.py:38-44)."""
    from imsim_tpu.config.runner import run_visit

    out = str(tmp_path / "out")
    results = run_visit(
        {"template": "imsim-config-instcat"},
        overrides=[
            f"input.instance_catalog.file_name={instcat}",
            f"input.instance_catalog.sed_dir={sed_dir}",
            "psf.type=DoubleGaussianPSF",
            "image.nobjects=3",
            "image.sky_level=0",
            f"output.dir={out}",
            "output.det_num=[94]",
            "output.readout.enabled=false",
            "output.cosmic_ray_rate=0.0",
            "image.batch_size=50000",
            "image.nbatch=2",
        ])
    assert results[0]["host"].n_objects == 3


def test_cli_main(tmp_path, instcat, sed_dir):
    """The `python -m imsim_tpu` entry runs a visit from a YAML file
    with dotted overrides and --profile (doc/usage.rst:9-16 analog)."""
    import yaml

    from imsim_tpu.__main__ import main

    out = str(tmp_path / "out")
    user = tmp_path / "user.yaml"
    user.write_text(yaml.safe_dump({
        "template": "imsim-config-instcat",
        "input.instance_catalog.file_name": instcat,
        "input.instance_catalog.sed_dir": sed_dir,
        "psf.type": "DoubleGaussianPSF",
        "image.sky_level": 0,
        "image.nobjects": 2,
        "image.batch_size": 50000,
        "image.nbatch": 2,
        "output.readout.enabled": False,
        "output.cosmic_ray_rate": 0.0,
    }))
    rc = main([str(user), f"output.dir={out}", "output.det_num=[94]",
               "--profile", "-q"])
    assert rc == 0
    assert os.path.exists(os.path.join(out,
                                       "eimage_4242-r-R22_S11.fits"))
    # pipelined branch reachable from the CLI; per-detector default
    # names cannot collide across worker threads
    out2 = str(tmp_path / "out2")
    rc = main([str(user), f"output.dir={out2}",
               "output.det_num=[93, 94]", "output.io_workers=1", "-q"])
    assert rc == 0
    for det in ("R22_S10", "R22_S11"):
        assert os.path.exists(os.path.join(
            out2, f"eimage_4242-r-{det}.fits"))


def test_opsim_db_and_multi_visit_cli(tmp_path, instcat, sed_dir):
    """Opsim sqlite metadata (visit selection + seqnum, the reference's
    tests/data/opsim_db_seqnum_test_data.db analog) driving the CLI's
    --visits batch-production loop: one process, N visits, compiled
    kernels reused across visits."""
    import sqlite3

    import yaml

    from imsim_tpu.__main__ import main
    from imsim_tpu.catalog.opsim import read_opsim_db

    db = str(tmp_path / "opsim.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE observations (observationId INT, fieldRA REAL, "
        "fieldDec REAL, filter TEXT, observationStartMJD REAL, "
        "night INT, seeingFwhm500 REAL, rotTelPos REAL)")
    for vid, mjd in [(101, 60674.20), (102, 60674.21), (103, 60675.20)]:
        con.execute("INSERT INTO observations VALUES (?,?,?,?,?,?,?,?)",
                    (vid, 30.0, -20.0, "r", mjd,
                     0 if vid < 103 else 1, 0.7, 0.0))
    con.commit()
    con.close()

    # visit selection + seqnum = count of earlier same-night visits
    ods = read_opsim_db(db, 102)
    assert ods["observationId"] == 102
    assert ods["band"] == "r"
    assert ods["seqnum"] == 2
    assert read_opsim_db(db, 103)["seqnum"] == 1
    try:
        read_opsim_db(db, 999)
        assert False, "missing visit must raise"
    except ValueError:
        pass

    out = str(tmp_path / "out")
    user = tmp_path / "user.yaml"
    user.write_text(yaml.safe_dump({
        "template": "imsim-config-instcat",
        "input.opsim_data.file_name": db,
        "input.instance_catalog.file_name": instcat,
        "input.instance_catalog.sed_dir": sed_dir,
        "psf.type": "DoubleGaussianPSF",
        "image.sky_level": 0,
        "image.nobjects": 2,
        "image.batch_size": 50000,
        "image.nbatch": 2,
        "output.readout.enabled": False,
        "output.cosmic_ray_rate": 0.0,
    }))
    rc = main([str(user), f"output.dir={out}", "output.det_num=[94]",
               "--visits", "101,102", "-q"])
    assert rc == 0
    for vid in (101, 102):
        assert os.path.exists(os.path.join(
            out, f"eimage_{vid}-r-R22_S11.fits")), vid
