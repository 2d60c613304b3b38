"""Data-directory resolution (imsim/meta_data.py parity).

The reference resolves bare data-file names against a package data
directory overridable via ``IMSIM_DATA_DIR`` (imsim/meta_data.py:1-11,
consumed e.g. at imsim/vignetting.py:25-31).  This framework ships
generated instrument models instead of vendored measurement snapshots,
so the data dir is PURELY an override hook: point ``IMSIM_TPU_DATA_DIR``
(or the reference-compatible ``IMSIM_DATA_DIR``) at a directory holding
the measured files — e.g. the reference's own ``data/`` — and every
``file_name``-style config value resolves bare names against it.
"""
from __future__ import annotations

import os

ENV_VARS = ("IMSIM_TPU_DATA_DIR", "IMSIM_DATA_DIR")


def data_dir() -> str | None:
    for var in ENV_VARS:
        d = os.environ.get(var)
        if d:
            return d
    return None


def resolve_data_path(name):
    """Resolve a config file name: absolute paths and existing relative
    paths pass through; otherwise bare names are looked up under the
    data dir (matching the reference's fallback order,
    imsim/vignetting.py:25-31)."""
    if not name or not isinstance(name, (str, os.PathLike)):
        return name
    name = str(name)
    if os.path.isabs(name) or os.path.exists(name):
        return name
    d = data_dir()
    if d:
        cand = os.path.join(d, name)
        if os.path.exists(cand):
            return cand
    return name
