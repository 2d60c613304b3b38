"""Radial vignetting profile over the focal plane.

Parity with imsim/vignetting.py: the reference evaluates a B-spline fit of
batoid-raytraced vignetting (data/LSSTCam_vignetting_data.json) at the
focal-plane radius of every pixel, including corner-raft rotations.  Here
the default profile is generated from the same geometry idea — fraction of
the annular pupil unobscured as the field angle walks the beam off the
optics — as a smooth piecewise curve matching the published Rubin
vignetting (flat to ~1.41 deg, ~12% at 1.75 deg, steep beyond).  Users can
supply measured (radius_mm, value) samples instead.
"""
from __future__ import annotations

import numpy as np

from ..utils.lookup import UniformTable

# focal-plane plate scale: ~50 um/arcsec -> 1 deg = 180.8 mm
MM_PER_DEG = 180.8


def default_profile_samples():
    """(radius_mm, throughput) samples of the default vignetting curve."""
    deg = np.array([0.0, 0.5, 1.0, 1.2, 1.41, 1.55, 1.708, 1.75,
                    1.9, 2.0, 2.1, 2.2, 2.3, 2.5])
    val = np.array([1.0, 1.0, 1.0, 0.999, 0.995, 0.97, 0.92, 0.88,
                    0.75, 0.62, 0.48, 0.33, 0.18, 0.0])
    return deg * MM_PER_DEG, val


class Vignetting:
    """Callable radial vignetting: value(r_mm)."""

    def __init__(self, samples=None, n_table=1024):
        r, v = samples if samples is not None else default_profile_samples()
        self.r_max = float(r[-1])
        grid = np.linspace(0.0, self.r_max, n_table)
        self.table = UniformTable(0.0, grid[1] - grid[0],
                                  np.interp(grid, r, v).astype(np.float32))
        self._np_grid = np.interp(grid, r, v)
        self._np_step = grid[1] - grid[0]

    @classmethod
    def from_file(cls, path, n_table=1024):
        """Load a measured vignetting profile.

        Two formats are accepted:
        - ``.json``: the reference's B-spline knot file
          (``data/LSSTCam_vignetting_data.json``, a ``[t, c, k]`` tuple
          consumed at imsim/vignetting.py:32-39).  The spline is in
          focal-plane mm and is sampled onto the uniform lookup grid.
        - anything else: a 2-column text file of
          ``(radius_mm, throughput)`` samples.
        """
        if str(path).endswith(".json"):
            import json

            from scipy.interpolate import BSpline

            t, c, k = json.load(open(path))
            spl = BSpline(np.asarray(t, float), np.asarray(c, float),
                          int(k))
            # evaluate over the positive-radius branch of the knot span
            r_hi = float(np.max(t))
            r = np.linspace(0.0, r_hi, n_table)
            # normalized by the focal-plane-center value, as the
            # reference does (imsim/vignetting.py:36-39)
            v = np.clip(spl(r), 0.0, None) / max(float(spl(0.0)), 1e-30)
            return cls((r, v), n_table=n_table)
        samples = np.loadtxt(path, unpack=True)
        return cls(samples, n_table=n_table)

    def __call__(self, r_mm):
        """numpy evaluation (host)."""
        f = np.clip(np.asarray(r_mm, float) / self._np_step, 0,
                    len(self._np_grid) - 1.000001)
        i = f.astype(int)
        w = f - i
        return self._np_grid[i] * (1 - w) + self._np_grid[i + 1] * w

    def image_plane(self, det_center_mm, pixel_grid_mm, step: int = 32):
        """Vignetting values for a full CCD: pixel_grid_mm = (Y_mm, X_mm)
        focal-plane coordinate arrays (affine in pixel index, as all
        callers build them from arange).

        The profile is radially smooth at the CCD scale, so it is
        evaluated on a stride-`step` coarse grid and bilinearly
        upsampled (utils.grid): relative error is O((step*pix*f'')^2)
        < 1e-5 at step=32 for the Rubin curve, while the host cost
        drops from 16.7M float64 table lookups (~18 s/CCD measured) to
        a few thousand.  step<=1 recovers the exact per-pixel path."""
        Y, X = pixel_grid_mm
        Y = np.asarray(Y, np.float32).reshape(-1)
        X = np.asarray(X, np.float32).reshape(-1)
        ny, nx = len(Y), len(X)
        if step <= 1 or ny < 3 or nx < 3:
            r = np.hypot(X[None, :], Y[:, None])
            return self(r).astype(np.float32)
        from ..utils.grid import coarse_shape, upsample_bilinear

        gh, gw = coarse_shape((ny, nx), step)
        # affine extension beyond the CCD edge (one coarse sample)
        dy, dx = Y[1] - Y[0], X[1] - X[0]
        ys = Y[0] + dy * step * np.arange(gh, dtype=np.float64)
        xs = X[0] + dx * step * np.arange(gw, dtype=np.float64)
        g = self(np.hypot(xs[None, :], ys[:, None])).astype(np.float32)
        return upsample_bilinear(np, g, (ny, nx), step)

    def at_sky_coord(self, r_mm):
        """Single-value lookup used to scale FFT-object fluxes
        (imsim/vignetting.py:91-122 analog)."""
        return float(self(r_mm))
