#!/usr/bin/env python
"""Derive the radial vignetting profile by raytracing the framework's
own telescope model.

Analog of the reference's devel-tools/vignetting/ scripts (which
raytrace batoid through the LSST prescription and fit a B-spline,
producing data/LSSTCam_vignetting_data.json): here the framework's JAX
raytracer traces an annular pupil ray bundle at each field radius and
records the unvignetted survival fraction, writing the two-column
(radius_mm, throughput) text file that ``input.vignetting.file_name``
loads (imsim_tpu/config/runner.py, imsim_tpu/image/vignetting.py).

Usage:
    python tools/fit_vignetting.py -o vignetting.txt \
        [--nfield 64] [--nrays 20000] [--band r]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imsim_tpu.image.vignetting import MM_PER_DEG  # noqa: E402
from imsim_tpu.optics.loader import load_telescope  # noqa: E402
from imsim_tpu.optics.trace import rays_from_field, trace  # noqa: E402


def raytraced_profile(nfield=64, nrays=20000, band="r", max_deg=2.5,
                      seed=0):
    """(radius_mm, survival_fraction) from the JAX raytracer."""
    loaded = load_telescope(band=band)
    tel = loaded.for_detector() if hasattr(loaded, "for_detector") \
        else loaded
    rng = np.random.default_rng(seed)
    # annular pupil samples (M1 outer 4.18 m, inner 2.55 m)
    r = np.sqrt(rng.uniform(2.55**2, 4.18**2, nrays))
    a = rng.uniform(0.0, 2 * np.pi, nrays)
    pu, pv = r * np.cos(a), r * np.sin(a)
    wl = np.full(nrays, 622.0)

    deg = np.linspace(0.0, max_deg, nfield)
    frac = np.empty(nfield)
    r_mm = np.empty(nfield)
    for i, d in enumerate(deg):
        thx = np.full(nrays, np.deg2rad(d))
        thy = np.zeros(nrays)
        rays = rays_from_field(np, thx, thy, pu, pv)
        out = trace(tel, *rays, wl, np)
        ok = ~np.asarray(out["vignette"])
        frac[i] = float(ok.mean())
        # focal radius from surviving rays (mm); fall back to plate scale
        if ok.any():
            r_mm[i] = float(np.hypot(out["x"][ok], out["y"][ok]).mean()
                            * 1000.0)
        else:
            r_mm[i] = d * MM_PER_DEG
    # normalize to the on-axis annulus throughput
    if frac[0] > 0:
        frac = frac / frac[0]
    return r_mm, frac


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-o", "--output", default="vignetting.txt")
    p.add_argument("--nfield", type=int, default=64)
    p.add_argument("--nrays", type=int, default=20000)
    p.add_argument("--band", default="r")
    a = p.parse_args(argv)
    r_mm, frac = raytraced_profile(a.nfield, a.nrays, a.band)
    np.savetxt(a.output, np.stack([r_mm, frac], axis=1),
               header="radius_mm throughput (raytraced, "
                      f"band={a.band}, nrays={a.nrays})")
    print(f"{a.output}: {len(r_mm)} samples, "
          f"edge throughput {frac[-1]:.3f}")


if __name__ == "__main__":
    main()
