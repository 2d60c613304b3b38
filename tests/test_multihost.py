"""Multi-host visit fan-out (parallel/multihost.py) — the analog of the
reference's 2-process render test (tests/test_multiproc.py:44-74:
2 CCDs, output.nproc 2, assert all expected output files exist).  Here
two separate JAX processes each take their strided share of a 2-CCD
visit via scheduler-style env topology, writing disjoint file sets.
"""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_visit(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    sed = d / "flatSED"
    sed.mkdir()
    w = np.linspace(300, 1150, 200)
    np.savetxt(sed / "sed_flat.txt", np.column_stack([w, np.ones_like(w)]))
    cat = d / "cat.txt"
    lines = [
        "rightascension 30.0", "declination -20.0", "mjd 60674.2",
        "filter 2", "seeing 0.7", "vistime 30.0", "rottelpos 0.0",
        "obshistid 777", "altitude 60.0",
    ]
    rng = np.random.default_rng(3)
    for i in range(4):
        ra = 30.0 + rng.uniform(-0.04, 0.04)
        dec = -20.0 + rng.uniform(-0.04, 0.04)
        lines.append(f"object {i} {ra:.6f} {dec:.6f} 21.5 "
                     "flatSED/sed_flat.txt 0 0 0 0 0 0 point none none")
    cat.write_text("\n".join(lines) + "\n")
    return str(d), str(cat)


def test_topology_detection(monkeypatch):
    from imsim_tpu.parallel.multihost import detect_topology, host_share

    monkeypatch.setenv("IMSIM_TPU_NUM_HOSTS", "4")
    monkeypatch.setenv("IMSIM_TPU_HOST_ID", "2")
    n, j = detect_topology()
    assert (n, j) == (4, 2)
    # explicit args win over env
    assert detect_topology(num_hosts=2, host_id=1) == (2, 1)
    dets = list(range(10))
    shares = [host_share(dets, 4, k) for k in range(4)]
    assert sorted(sum(shares, [])) == dets
    assert shares[2] == [2, 6]


def test_two_host_visit(tiny_visit, tmp_path):
    """Two processes, two CCDs: each host renders its strided share;
    the union of outputs covers both detectors with no overlap."""
    d, cat = tiny_visit
    out = str(tmp_path / "out")
    driver = f"""
import os, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({os.path.dirname(os.path.abspath(__file__))!r},
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from imsim_tpu.parallel.multihost import run_visit_multihost
results = run_visit_multihost(
    {{"template": "imsim-config-instcat"}},
    overrides=[
        "input.instance_catalog.file_name={cat}",
        "input.instance_catalog.sed_dir={d}",
        "input.atm_psf.screen_size=102.4",
        "input.atm_psf.screen_scale=0.8",
        "output.dir={out}",
        "output.det_num=[93,94]",
        "output.file_name=eimage_{{det_name}}.fits",
        "output.readout.enabled=False",
        "output.truth.file_name=centroid_{{det_name}}.txt",
        "image.batch_size=100000",
        "image.nbatch=1",
    ])
print("HOSTDONE", os.environ["IMSIM_TPU_HOST_ID"],
      [r["det_name"] for r in results])
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               IMSIM_TPU_NUM_HOSTS="2")
    procs = []
    for hid in range(2):
        e = dict(env, IMSIM_TPU_HOST_ID=str(hid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", driver], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        o, _ = p.communicate(timeout=1500)
        outs.append(o.decode())
        assert p.returncode == 0, o.decode()[-2000:]
    # every host rendered exactly its share
    rendered = []
    for hid, o in enumerate(outs):
        line = [ln for ln in o.splitlines() if ln.startswith("HOSTDONE")]
        assert line, o[-2000:]
        rendered.append(line[0])
    assert len(set(rendered)) == 2
    # the union of files covers both CCDs (reference's 4-file assert)
    files = sorted(os.listdir(out))
    for det in ("R22_S10", "R22_S11"):
        assert f"eimage_{det}.fits" in files
        assert f"centroid_{det}.txt" in files
