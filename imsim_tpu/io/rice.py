"""RICE_1 tile compression: ctypes binding of the native C++ codec +
FITS tiled-image-convention HDU (de)serialization.

The reference's amp files are RICE_1 CompImageHDUs written by astropy/
cfitsio (imsim/readout.py:500-526).  Here the codec is our own C++
(io/native/rice.cc), compiled on first use; the HDU layout follows the
FITS Tiled Image Compression convention: a BINTABLE with ZIMAGE=T,
ZCMPTYPE='RICE_1', one row per tile (tile = one image row), variable-
length byte arrays in the heap.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "rice.cc")
_SO = os.path.join(_HERE, "native", "_rice.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO])
    lib = ctypes.CDLL(_SO)
    lib.rice_encode_i32.restype = ctypes.c_long
    lib.rice_encode_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.rice_decode_i32.restype = ctypes.c_long
    lib.rice_decode_i32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
    lib.instcat_scan.restype = ctypes.c_long
    lib.instcat_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_long]
    _lib = lib
    return lib


def rice_encode(a: np.ndarray) -> bytes:
    """Compress a 1D int32 array."""
    lib = _load()
    a = np.ascontiguousarray(a, np.int32)
    out = np.empty(16 + 5 * a.size, np.uint8)
    n = lib.rice_encode_i32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), a.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:n].tobytes()


def rice_decode(buf: bytes, n: int) -> np.ndarray:
    lib = _load()
    a = np.empty(n, np.int32)
    raw = np.frombuffer(buf, np.uint8)
    r = lib.rice_decode_i32(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), raw.size,
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
    if r != n:
        raise ValueError("RICE decode failed")
    return a


def instcat_object_offsets(data: bytes) -> np.ndarray:
    """Native scan for 'object' line offsets in a catalog buffer."""
    lib = _load()
    max_lines = max(data.count(b"\n"), 16)
    out = np.empty(max_lines, np.int64)
    n = lib.instcat_scan(data, len(data),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                         max_lines)
    return out[:n]


# ---------------------------------------------------------------------------
# FITS tiled-image HDU (ZIMAGE BINTABLE) serialization
# ---------------------------------------------------------------------------


def serialize_rice_hdu(hdu) -> bytes:
    """Serialize an int32 image HDU as a RICE_1 tile-compressed BINTABLE
    (tile = one row), per the FITS Tiled Image Compression convention."""
    from .fits import _card, _header_bytes

    data = np.ascontiguousarray(hdu.data, np.int32)
    ny, nx = data.shape
    tiles = [rice_encode(data[y]) for y in range(ny)]
    heap = b"".join(tiles)
    # row entries: (nelem, offset) int32 pairs (1PB descriptor)
    desc = np.zeros((ny, 2), ">i4")
    off = 0
    for y, t in enumerate(tiles):
        desc[y, 0] = len(t)
        desc[y, 1] = off
        off += len(t)

    cards = [
        _card("XTENSION", "BINTABLE", "binary table extension"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", 8),          # one descriptor pair per row
        _card("NAXIS2", ny),
        _card("PCOUNT", len(heap)),
        _card("GCOUNT", 1),
        _card("TFIELDS", 1),
        _card("TTYPE1", "COMPRESSED_DATA"),
        _card("TFORM1", "1PB(%d)" % max(len(t) for t in tiles)),
        _card("ZIMAGE", True),
        _card("ZCMPTYPE", "RICE_1"),
        _card("ZBITPIX", 32),
        _card("ZNAXIS", 2),
        _card("ZNAXIS1", nx),
        _card("ZNAXIS2", ny),
        _card("ZTILE1", nx),
        _card("ZTILE2", 1),
        _card("ZNAME1", "BLOCKSIZE"),
        _card("ZVAL1", 32),
        _card("ZNAME2", "BYTEPIX"),
        _card("ZVAL2", 4),
    ]
    if hdu.name:
        cards.append(_card("EXTNAME", hdu.name))
    for k, v in hdu.header.items():
        cards.append(_card(k, v))
    payload = desc.tobytes() + heap
    pad = (-len(payload)) % 2880
    return _header_bytes(cards) + payload + b"\0" * pad


def deserialize_rice_hdu(cards: dict, raw_table: bytes) -> np.ndarray:
    """Inverse of serialize_rice_hdu for our reader."""
    nx = cards["ZNAXIS1"]
    ny = cards["ZNAXIS2"]
    table_bytes = cards["NAXIS1"] * cards["NAXIS2"]
    desc = np.frombuffer(raw_table[:table_bytes], ">i4").reshape(ny, 2)
    heap = raw_table[table_bytes:]
    img = np.empty((ny, nx), np.int32)
    for y in range(ny):
        nb, off = int(desc[y, 0]), int(desc[y, 1])
        img[y] = rice_decode(heap[off:off + nb], nx)
    return img
