"""Native C++ instance-catalog tokenizer (io/native/instcat.cc): field-
for-field equality with the Python reference parser, includeobj order,
gzip, dust markers, invalid-row skipping, unknown-type errors."""
import gzip
import os

import numpy as np
import pytest

from imsim_tpu.catalog.instcat import _parse_instcat
from imsim_tpu.catalog.native_instcat import parse_instcat_native

CAT = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "example_instance_catalog.txt")

LINES = """object 1001 30.01 -20.02 22.5 starSED/phoSimMLT/lte034.txt.gz 0 0 0 0 0 0 point none CCM 0.02 3.1
object 1002 30.02 -20.01 21.0 galaxySED/Exp.40E09.02Z.spec.gz 0.45 0.01 -0.02 0.003 0 0 sersic2d 1.2 0.6 35.0 1.3 CCM 0.3 3.1 CCM 0.05 3.1
object 1003 30.03 -20.03 20.5 galaxySED/Inst.10E09.spec.gz 0.3 0 0 0 0 0 knots 0.9 0.5 10.0 25 none CCM 0.04 3.1
object 1004 30.04 -20.04 23.0 starSED/wDs/bergeron.txt.gz 0 0 0 0 0 0 point CCM 0.1 2.9 none
object 1005 30.05 -20.05 55.0 starSED/a.txt 0 0 0 0 0 0 point none none
object 1006 30.06 -20.06 22.0 galaxySED/b.spec 0.2 0 0 0 0 0 sersic2d 0.4 0.9 10.0 2.0 none none
object 1007 30.07 -20.07 inf starSED/c.txt 0 0 0 0 0 0 point none none
object 1008 30.08 -20.08 19.5 galaxySED/d.spec 0.1 0.02 0.01 0.001 0 0 SERSIC2D 2.0 1.0 -15.0 0.55 none CCM 0.06 3.1
object 1009 30.09 -20.09 20.9 galaxySED/e.spec 0.15 0 0 0 0 0 knots 1.1 0.7 40.0 12
"""


def _assert_tables_equal(a, b):
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.id, b.id)
    np.testing.assert_array_equal(a.sed_name, b.sed_name)
    np.testing.assert_array_equal(a.obj_type, b.obj_type)
    np.testing.assert_array_equal(a.image_file, b.image_file)
    for f in ("ra", "dec", "magnorm", "redshift", "g1", "g2", "mu",
              "p0", "p1", "p2", "p3", "int_av", "int_rv", "mw_av",
              "mw_rv"):
        np.testing.assert_allclose(getattr(a, f), getattr(b, f),
                                   rtol=1e-14, atol=0, err_msg=f)


@pytest.mark.parametrize("flip_g2", [True, False])
def test_equality_synthetic(tmp_path, flip_g2):
    p = str(tmp_path / "cat.txt")
    with open(p, "w") as f:
        f.write("# header\nrightascension 30.0\n")
        f.write(LINES)
    py, ntot_py = _parse_instcat(p, flip_g2=flip_g2, force_python=True)
    nat, ntot_nat = parse_instcat_native(p, flip_g2=flip_g2)
    # 1005 (magnorm 55) and 1006 (a<b) skipped; 1007 (inf) not counted
    assert ntot_py == ntot_nat == 8
    assert len(py) == 6
    # 1009: knots with NO dust block -> defaults
    i = list(py.id).index("1009")
    assert py.int_av[i] == 0.0 and py.mw_rv[i] == 3.1
    _assert_tables_equal(py, nat)
    # spot-check dust semantics: internal-only (1004), both (1002)
    i = list(py.id).index("1004")
    assert py.int_av[i] == 0.1 and py.mw_av[i] == 0.0
    i = list(py.id).index("1002")
    assert py.int_av[i] == 0.3 and py.mw_av[i] == 0.05


def test_equality_gzip_includeobj(tmp_path):
    sub = tmp_path / "part.txt.gz"
    with gzip.open(sub, "wt") as f:
        f.write(LINES)
    main = tmp_path / "main.txt"
    with open(main, "w") as f:
        f.write("rightascension 30.0\n")
        f.write("object 2001 30.0 -20.0 21.5 starSED/x.txt 0 0 0 0 0 0"
                " point none none\n")
        f.write("includeobj part.txt.gz\n")
        f.write("object 2002 30.1 -20.1 21.6 starSED/y.txt 0 0 0 0 0 0"
                " point none none\n")
    py, _ = _parse_instcat(str(main), force_python=True)
    nat, _ = parse_instcat_native(str(main))
    _assert_tables_equal(py, nat)
    # encounter order preserved: 2001, (include block), 2002
    assert list(py.id)[0] == "2001" and list(py.id)[-1] == "2002"


def test_equality_example_catalog():
    py, ntot = _parse_instcat(CAT, force_python=True)
    nat, ntot_n = parse_instcat_native(CAT)
    assert ntot == ntot_n
    _assert_tables_equal(py, nat)


def test_unknown_type_raises(tmp_path):
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("object 1 1.0 1.0 20.0 s.txt 0 0 0 0 0 0 blob 1 2\n")
    with pytest.raises(RuntimeError, match="Unknown object type"):
        parse_instcat_native(p)
    with pytest.raises(RuntimeError, match="Unknown object type"):
        _parse_instcat(p, force_python=True)


def test_read_instcat_uses_cache(tmp_path):
    from imsim_tpu.catalog.instcat import (_parse_instcat_cached,
                                           read_instcat)

    p = str(tmp_path / "cat.txt")
    with open(p, "w") as f:
        f.write(LINES)
    _parse_instcat_cached.cache_clear()
    t1 = read_instcat(p)
    t2 = read_instcat(p, sort_mag=False)
    info = _parse_instcat_cached.cache_info()
    assert info.misses == 1 and info.hits == 1
    # sort_mag=True returns brightest (lowest magnorm) first
    assert t1.magnorm[0] == min(t2.magnorm)
