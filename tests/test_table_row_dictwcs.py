"""Tests for the RowData config value type (imsim/table_row.py parity)
and the Dict WCS factory (imsim/dict_wcs.py parity) — the two §2
components VERDICT r1 flagged as untested."""
import numpy as np
import pytest

from imsim_tpu.catalog.table_row import load_row, row_data
from imsim_tpu.config.interpreter import ConfigView, load_config


@pytest.fixture()
def table(tmp_path):
    p = tmp_path / "fea_offsets.csv"
    p.write_text(
        "det_name,dz,angle,comment\n"
        "R22_S11,12.5,30.0,center\n"
        "R01_S00,-3.0,45.0,corner\n")
    return str(p)


def test_load_row_selects_and_errors(table):
    row = load_row(table, "det_name", "R22_S11")
    assert row["dz"] == 12.5
    assert row["comment"] == "center"
    with pytest.raises(KeyError):
        load_row(table, "det_name", "R99_S99")
    # duplicate keys are an error (imsim/table_row.py:99-104 semantics)
    import pandas as pd

    dup = table.replace("fea_offsets", "dup")
    pd.DataFrame(dict(det_name=["A", "A"], v=[1, 2])).to_csv(
        dup, index=False)
    with pytest.raises(ValueError):
        load_row(dup, "det_name", "A")


def test_row_data_config_value_with_units(table):
    """{type: RowData} resolves through the config interpreter with
    unit conversion (to_unit), like the reference's RowData value."""
    cfg = load_config({"template": "imsim-config-instcat",
                       "input.instance_catalog.file_name": "x.txt"})
    view = ConfigView(cfg)
    node = {"type": "RowData", "file_name": table,
            "key_column": "det_name", "key_value": "R22_S11",
            "field": "dz", "to_unit": "um"}
    assert abs(row_data(node, view) - 12.5e-6) < 1e-12
    node2 = dict(node, field="angle", to_unit="deg")
    assert abs(row_data(node2, view) - np.radians(30.0)) < 1e-12


def test_dict_wcs_roundtrip():
    """image.wcs {type: Dict} builds a TAN WCS from FITS-card values
    (imsim/dict_wcs.py role); world<->pixel roundtrips and the pixel
    scale matches the CD matrix."""
    from imsim_tpu.config.registry import WCS_TYPES

    cfg = load_config({"template": "imsim-config-instcat",
                       "input.instance_catalog.file_name": "x.txt"})
    view = ConfigView(cfg)
    node = {"type": "Dict", "dict": {
        "CRPIX1": 2048.5, "CRPIX2": 2048.5,
        "CRVAL1": 53.125, "CRVAL2": -27.75,
        "CD1_1": -5.5e-5, "CD1_2": 0.0,
        "CD2_1": 0.0, "CD2_2": 5.5e-5}}
    wcs = WCS_TYPES["Dict"](node, view)
    # reference pixel maps to CRVAL
    ra, dec = wcs.xy_to_radec(np.array([2047.5]), np.array([2047.5]))
    assert abs(np.degrees(ra[0]) - 53.125) < 1e-9
    assert abs(np.degrees(dec[0]) + 27.75) < 1e-9
    # roundtrip away from the reference pixel
    x = np.array([100.0, 3000.0])
    y = np.array([200.0, 3900.0])
    ra, dec = wcs.xy_to_radec(x, y)
    xb, yb = wcs.radec_to_xy(ra, dec)
    assert np.abs(xb - x).max() < 1e-6
    assert np.abs(yb - y).max() < 1e-6
    # pixel scale = |CD| in deg/px -> 0.198 arcsec/px
    ra2, dec2 = wcs.xy_to_radec(np.array([2047.5]), np.array([2048.5]))
    scale = np.degrees(dec2[0] - np.radians(-27.75)) * 3600
    assert abs(scale - 5.5e-5 * 3600) < 1e-3
