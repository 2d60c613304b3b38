"""Multi-detector visit: the reference's 'distributed' test surface is a
2-CCD output.nproc=2 render asserting the output files exist
(tests/test_multiproc.py:44-74).  Here: a 2-detector run_visit plus the
sharded mesh step on the virtual 8-device CPU mesh."""
import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def visit_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mdet")
    (d / "seds" / "flatSED").mkdir(parents=True)
    w = np.linspace(300, 1150, 120)
    np.savetxt(d / "seds" / "flatSED" / "sed_flat.txt",
               np.column_stack([w, np.ones_like(w)]))
    lines = ["rightascension 30.0", "declination -20.0", "mjd 60674.2",
             "filter 2", "seeing 0.7", "vistime 30.0", "rottelpos 0.0",
             "obshistid 99", "altitude 60.0"]
    rng = np.random.default_rng(1)
    for i in range(10):
        # spread objects over ~0.5 deg so both detectors get some
        ra = 30.0 + rng.uniform(-0.3, 0.3)
        dec = -20.0 + rng.uniform(-0.3, 0.3)
        lines.append(f"object {i} {ra:.6f} {dec:.6f} "
                     f"{rng.uniform(20, 22):.2f} flatSED/sed_flat.txt "
                     "0 0 0 0 0 0 point none none")
    (d / "cat.txt").write_text("\n".join(lines) + "\n")
    return d


def test_two_detector_visit(visit_files, tmp_path):
    from imsim_tpu.config.runner import run_visit

    out = str(tmp_path / "out")
    results = run_visit(
        {"template": "imsim-config-instcat"},
        overrides=[
            f"input.instance_catalog.file_name={visit_files}/cat.txt",
            f"input.instance_catalog.sed_dir={visit_files}/seds",
            "input.atm_psf.screen_size=102.4",
            "input.atm_psf.screen_scale=0.8",
            f"output.dir={out}",
            "output.det_num=[93, 94]",      # R22_S10 + R22_S11
            "output.file_name=eimage_{det_name}.fits",
            "output.readout.enabled=false",
            "output.truth.file_name=centroid_{det_name}.txt",
            "output.cosmic_ray_rate=0.0",
            "image.batch_size=100000",
            "image.nbatch=2",
        ])
    assert len(results) == 2
    names = {r["det_name"] for r in results}
    assert names == {"R22_S10", "R22_S11"}
    # the reference's criterion: expected output files exist
    for det in names:
        assert os.path.exists(os.path.join(out, f"eimage_{det}.fits"))
        assert os.path.exists(os.path.join(out, f"centroid_{det}.txt"))
    # different detectors see different WCS solutions
    w0 = results[0]["wcs"].crval
    w1 = results[1]["wcs"].crval
    assert not np.allclose(w0, w1)


def test_sharded_visit_mesh():
    """The output.nproc analog executes over an 8-device mesh."""
    import __graft_entry__ as g

    n = len(jax.devices())
    assert n >= 8, "conftest should provide the virtual 8-device mesh"
    g.dryrun_multichip(8)


def test_pipelined_io_matches_serial(visit_files, tmp_path):
    """output.io_workers overlaps RICE/disk IO with the next CCD's
    render; the files must be byte-identical to the serial path (all
    randomness is seed-derived and device work stays on the main
    thread)."""
    from imsim_tpu.config.runner import run_visit

    common = [
        f"input.instance_catalog.file_name={visit_files}/cat.txt",
        f"input.instance_catalog.sed_dir={visit_files}/seds",
        # fast-path PSF: the IO pipeline under test is identical and
        # the full optics chain is covered by test_two_detector_visit
        "psf.type=DoubleGaussianPSF",
        "output.det_num=[93, 94]",
        "output.file_name=eimage_{det_name}.fits",
        "output.readout.file_name=amp_{det_name}.fits",
        "output.truth.file_name=centroid_{det_name}.txt",
        "output.cosmic_ray_rate=0.0",
        "image.batch_size=100000",
        "image.nbatch=2",
    ]
    out_a = str(tmp_path / "serial")
    out_b = str(tmp_path / "piped")
    run_visit({"template": "imsim-config-instcat"},
              overrides=common + [f"output.dir={out_a}"])
    run_visit({"template": "imsim-config-instcat"},
              overrides=common + [f"output.dir={out_b}",
                                  "output.io_workers=2"])
    for det in ("R22_S10", "R22_S11"):
        for pat in ("eimage_{}.fits", "amp_{}.fits", "centroid_{}.txt"):
            fa = os.path.join(out_a, pat.format(det))
            fb = os.path.join(out_b, pat.format(det))
            with open(fa, "rb") as a, open(fb, "rb") as b:
                assert a.read() == b.read(), (pat, det)
