"""Generic single-row table lookup value type — imsim/table_row.py parity
(RowData, :13-145): read one row of a tabular file selected by a key
column, exposing the other columns as config values, with simple unit
conversion.  Uses pandas (csv/ecsv/parquet) instead of astropy QTable.
"""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd

_UNIT_SCALE = {
    None: 1.0, "": 1.0,
    "deg": np.pi / 180.0, "degree": np.pi / 180.0,
    "arcsec": np.pi / 180.0 / 3600.0,
    "rad": 1.0,
    "um": 1e-6, "micron": 1e-6, "mm": 1e-3, "m": 1.0,
}


@functools.lru_cache(maxsize=32)
def _read_table(file_name: str) -> pd.DataFrame:
    if file_name.endswith((".parquet", ".pq")):
        return pd.read_parquet(file_name)
    if file_name.endswith(".ecsv"):
        # astropy ECSV: YAML header lines start with '#'
        return pd.read_csv(file_name, comment="#")
    return pd.read_csv(file_name)


def load_row(file_name: str, key_column: str, key_value) -> dict:
    df = _read_table(file_name)
    sel = df[df[key_column] == key_value]
    if len(sel) == 0:
        raise KeyError(f"{key_column}=={key_value!r} not in {file_name}")
    if len(sel) > 1:
        raise ValueError(f"{key_column}=={key_value!r} matches "
                         f"{len(sel)} rows in {file_name}")
    return dict(sel.iloc[0])


def row_data(node: dict, view) -> object:
    """Config entry: {type: RowData, file_name:..., key_column:...,
    key_value:..., field:..., [to_unit:...]}"""
    row = load_row(str(view.resolve(node["file_name"])),
                   str(view.resolve(node["key_column"])),
                   view.resolve(node["key_value"]))
    val = row[str(view.resolve(node["field"]))]
    unit = node.get("to_unit")
    if unit is not None and isinstance(val, (int, float, np.floating)):
        val = float(val) * _UNIT_SCALE.get(unit, 1.0)
    return val
