#!/usr/bin/env python
"""Assemble a focal-plane mosaic from per-CCD eimage FITS files.

Analog of the reference's devel-tools/eimage_mosaic.py (which places
eimages with lsst.afw cameraGeom): here the placement uses the
framework's own camera geometry (imsim_tpu.electronics.camera) — each
detector's image is block-averaged by ``--bin`` and dropped at its
focal-plane position (center_mm + yaw), producing one quick-look array
of the whole focal plane.

Usage:
    python tools/eimage_mosaic.py 'output/eimage_*.fits' -o mosaic.fits \
        --bin 32 [--camera LsstCamSim] [--log]

The detector is identified from the DET_NAME/DETNAME header keyword,
falling back to an R??_S?? match on the file name.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imsim_tpu.electronics.camera import PIXEL_SIZE_MM, get_camera  # noqa: E402
from imsim_tpu.io import fits as tfits  # noqa: E402

_DET_RE = re.compile(r"(R\d\d_S[WG]?\d\d?)")


def _det_name_for(path, header):
    for key in ("DET_NAME", "DETNAME", "RAFTBAY"):
        v = header.get(key)
        if v:
            if key == "RAFTBAY" and header.get("CCDSLOT"):
                return f"{v}_{header['CCDSLOT']}"
            if _DET_RE.fullmatch(str(v).strip()):
                return str(v).strip()
    m = _DET_RE.search(os.path.basename(path))
    return m.group(1) if m else None


def _binned(img, k):
    ny, nx = (img.shape[0] // k) * k, (img.shape[1] // k) * k
    return img[:ny, :nx].reshape(ny // k, k, nx // k, k).mean(axis=(1, 3))


def build_mosaic(paths, camera="LsstCamSim", bin_factor=32, log=False):
    cam = get_camera(camera)
    half_mm = 340.0
    step_mm = PIXEL_SIZE_MM * bin_factor
    n = int(2 * half_mm / step_mm) + 1
    mosaic = np.zeros((n, n), np.float32)
    placed = []
    for path in paths:
        data = header = None
        for hdr, arr in tfits.read_fits(path):
            if arr is not None and np.ndim(arr) == 2:
                data, header = np.asarray(arr, np.float32), hdr
                break
        if data is None:
            continue
        det = _det_name_for(path, header or {})
        if det is None or det not in cam:
            print(f"  skip {os.path.basename(path)}: unknown detector")
            continue
        ccd = cam[det]
        small = _binned(data, bin_factor)
        # snap the (few-arcmin) as-built yaw to the nearest quadrant
        rot = int(round(float(ccd.rot_deg) / 90.0)) % 4
        small = np.rot90(small, rot)
        cy = int((ccd.center_mm[1] + half_mm) / step_mm)
        cx = int((ccd.center_mm[0] + half_mm) / step_mm)
        y0, x0 = cy - small.shape[0] // 2, cx - small.shape[1] // 2
        ys, xs = slice(max(y0, 0), min(y0 + small.shape[0], n)), \
            slice(max(x0, 0), min(x0 + small.shape[1], n))
        mosaic[ys, xs] = small[:ys.stop - ys.start, :xs.stop - xs.start]
        placed.append(det)
    if log:
        mosaic = np.log1p(np.maximum(mosaic, 0.0))
    return mosaic, placed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("pattern", help="glob of eimage FITS files")
    p.add_argument("-o", "--output", default="mosaic.fits")
    p.add_argument("--camera", default="LsstCamSim")
    p.add_argument("--bin", type=int, default=32, dest="bin_factor")
    p.add_argument("--log", action="store_true",
                   help="store log1p of the signal")
    a = p.parse_args(argv)
    paths = sorted(glob.glob(a.pattern))
    if not paths:
        p.error(f"no files match {a.pattern!r}")
    mosaic, placed = build_mosaic(paths, a.camera, a.bin_factor, a.log)
    tfits.write_fits(a.output, [tfits.HDU(
        data=mosaic, is_primary=True,
        header={"NPLACED": len(placed), "BINFAC": a.bin_factor,
                "CAMERA": a.camera})])
    print(f"{a.output}: {len(placed)} detectors placed, "
          f"{mosaic.shape[0]}x{mosaic.shape[1]}")


if __name__ == "__main__":
    main()
