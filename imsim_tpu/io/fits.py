"""Minimal-but-correct FITS reader/writer (no astropy dependency).

The reference assembles raw amp files and eimages with astropy.io.fits
(imsim/readout.py:479-526).  This module provides the standalone
equivalent: primary + image extensions + binary tables, int/float dtypes
with BSCALE/BZERO, gzip support.  RICE tile compression is provided by the
native C++ codec in imsim_tpu/io/_rice (see rice.py); uncompressed output
is always available.
"""
from __future__ import annotations

import gzip
import io
import os

import numpy as np

BLOCK = 2880


def _format_value(v):
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        s = f"{float(v):.16G}"
        if "." not in s and "E" not in s and "INF" not in s and "NAN" not in s:
            s += "."
        return s
    # string
    s = str(v).replace("'", "''")
    return f"'{s:<8s}'"


def _card(key, value=None, comment=None):
    key = key.upper()[:8]
    if key in ("COMMENT", "HISTORY", ""):
        text = f"{key:<8s}{str(value or ''):<72s}"[:80]
        return text.ljust(80)
    vs = _format_value(value)
    if vs.startswith("'"):
        body = f"{key:<8s}= {vs:<20s}"
    else:
        body = f"{key:<8s}= {vs:>20s}"
    if comment:
        body += f" / {comment}"
    return body[:80].ljust(80)


def _header_bytes(cards):
    text = "".join(cards) + "END".ljust(80)
    pad = (-len(text)) % BLOCK
    return (text + " " * pad).encode("ascii")


_BITPIX = {
    np.dtype(">u1"): 8, np.dtype(">i2"): 16, np.dtype(">i4"): 32,
    np.dtype(">i8"): 64, np.dtype(">f4"): -32, np.dtype(">f8"): -64,
}


class HDU:
    """One header-data unit: dict-like header + ndarray or None."""

    def __init__(self, data=None, header=None, name=None, is_primary=False,
                 compress=None):
        self.data = data
        self.header = dict(header or {})
        self.name = name
        self.is_primary = is_primary
        self.compress = compress  # None | 'rice'


def _serialize_image_hdu(hdu: HDU, primary: bool) -> bytes:
    data = hdu.data
    cards = []
    if data is None:
        if primary:
            cards.append(_card("SIMPLE", True, "conforms to FITS standard"))
            cards.append(_card("BITPIX", 8))
            cards.append(_card("NAXIS", 0))
            cards.append(_card("EXTEND", True))
        else:
            cards.append(_card("XTENSION", "IMAGE", "Image extension"))
            cards.append(_card("BITPIX", 8))
            cards.append(_card("NAXIS", 0))
            cards.append(_card("PCOUNT", 0))
            cards.append(_card("GCOUNT", 1))
        for k, v in hdu.header.items():
            cards.append(_card(k, v))
        return _header_bytes(cards)

    data = np.asarray(data)
    # Integer data with unsigned range uses BZERO convention
    bzero = 0
    if data.dtype == np.uint16:
        data = (data.astype(np.int32) - 32768).astype(np.int16)
        bzero = 32768
    elif data.dtype == np.uint32:
        data = (data.astype(np.int64) - 2147483648).astype(np.int32)
        bzero = 2147483648
    be = data.astype(data.dtype.newbyteorder(">"))
    bitpix = _BITPIX[be.dtype]
    if primary:
        cards = [_card("SIMPLE", True, "conforms to FITS standard"),
                 _card("BITPIX", bitpix),
                 _card("NAXIS", data.ndim)]
    else:
        cards = [_card("XTENSION", "IMAGE", "Image extension"),
                 _card("BITPIX", bitpix),
                 _card("NAXIS", data.ndim)]
    for i, n in enumerate(reversed(data.shape)):
        cards.append(_card(f"NAXIS{i + 1}", n))
    if not primary:
        cards.append(_card("PCOUNT", 0))
        cards.append(_card("GCOUNT", 1))
    if primary:
        cards.append(_card("EXTEND", True))
    if bzero:
        cards.append(_card("BZERO", bzero))
        cards.append(_card("BSCALE", 1))
    if hdu.name:
        cards.append(_card("EXTNAME", hdu.name))
    for k, v in hdu.header.items():
        cards.append(_card(k, v))
    payload = be.tobytes()
    pad = (-len(payload)) % BLOCK
    return _header_bytes(cards) + payload + b"\0" * pad


def write_fits(path, hdus, overwrite=True):
    """hdus: HDU list, or a bare ndarray (single image file)."""
    if isinstance(hdus, np.ndarray):
        hdus = [HDU(hdus)]
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    buf = io.BytesIO()
    for i, hdu in enumerate(hdus):
        if hdu.compress == "rice" and hdu.data is not None and i > 0:
            from .rice import serialize_rice_hdu
            buf.write(serialize_rice_hdu(hdu))
        else:
            buf.write(_serialize_image_hdu(hdu, primary=(i == 0)))
    raw = buf.getvalue()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb", compresslevel=6) as f:
            f.write(raw)
    else:
        with open(path, "wb") as f:
            f.write(raw)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


_DTYPES = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def read_fits(path):
    """Return list of (header_dict, ndarray-or-None)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()

    out = []
    offset = 0
    while offset < len(raw):
        # parse header starting at offset
        hdr_end = offset
        cards = {}
        while True:
            text = raw[hdr_end:hdr_end + BLOCK].decode("ascii", "replace")
            hdr_end += BLOCK
            stop = False
            for i in range(0, len(text), 80):
                card = text[i:i + 80]
                key = card[:8].strip()
                if key == "END":
                    stop = True
                    break
                if card[8:10] != "= ":
                    continue
                val = card[10:].split("/")[0].strip()
                if val.startswith("'"):
                    v = val[1:]
                    v = v[: v.index("'")].rstrip() if "'" in v else v
                elif val == "T":
                    v = True
                elif val == "F":
                    v = False
                else:
                    try:
                        v = int(val)
                    except ValueError:
                        try:
                            v = float(val)
                        except ValueError:
                            v = val
                cards[key] = v
            if stop:
                break
        naxis = cards.get("NAXIS", 0)
        shape = tuple(cards[f"NAXIS{naxis - i}"] for i in range(naxis))
        nelem = int(np.prod(shape)) if shape else 0
        pcount = cards.get("PCOUNT", 0)
        data = None
        nbytes = 0
        if cards.get("XTENSION", "").startswith("BINTABLE"):
            nbytes = cards["NAXIS1"] * cards["NAXIS2"] + pcount
            if cards.get("ZIMAGE") and cards.get("ZCMPTYPE",
                                                 "").startswith("RICE"):
                from .rice import deserialize_rice_hdu
                data = deserialize_rice_hdu(
                    cards, raw[hdr_end:hdr_end + nbytes])
            else:
                data = raw[hdr_end:hdr_end + nbytes]  # opaque table bytes
        elif nelem:
            dt = np.dtype(_DTYPES[cards["BITPIX"]])
            nbytes = nelem * dt.itemsize + pcount
            data = np.frombuffer(raw[hdr_end:hdr_end + nelem * dt.itemsize],
                                 dtype=dt).reshape(shape)
            if cards.get("BZERO") or cards.get("BSCALE", 1) != 1:
                data = data.astype(np.float64) * cards.get("BSCALE", 1) \
                    + cards.get("BZERO", 0)
                if cards.get("BZERO") in (32768, 2147483648) \
                        and cards.get("BSCALE", 1) == 1:
                    data = data.astype(np.uint16 if cards["BZERO"] == 32768
                                       else np.uint32)
        out.append((cards, data))
        offset = hdr_end + nbytes + ((-nbytes) % BLOCK)
    return out
