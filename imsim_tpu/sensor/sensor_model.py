"""Measured sensor-model ingestion: derive this framework's BF
interaction kernel from the reference's Poisson-solver pixel-vertex
data files (`data/sensor_models/lsst_{itl,e2v}_*.dat`, the files GalSim
SiliconSensor consumes — doc/features.rst:27-45, imsim config surface
`image.sensor` via stamp.py:562-572).

File format (Craig Lage's standalone Poisson solver output): a 9 x 9
pixel postage stamp with `CollectedCharge` electrons (100000, from the
companion .cfg) in the central pixel; one row per boundary vertex:

    X0 Y0 Theta X Y

(X0, Y0) the pixel center [um], Theta the vertex angle from the pixel
center, (X, Y) the DISTORTED vertex position [um] — where the drift
lines that bisect neighboring collection channels actually land when
the central pixel holds Q electrons.

Physics bridge to the field-formulation sensor (sensor/silicon.py):
our model displaces arriving photons by  d = -grad(K * Q)  for an
interaction potential kernel K.  A boundary vertex at radius r from
the charged pixel shifts INWARD by the same drift-line bend that
displaces photons OUTWARD, i.e. the measured radial vertex shift
m(r) = -d_r(r) = Q dK/dr.  Integrating the azimuthally averaged
profile therefore recovers the kernel the Poisson solver implies:

    K(r) = -(1/Q) int_r^inf m(r') dr'

with no shape assumption — the r-dependence comes entirely from the
measured vertices.  The pixel-area change (shoelace over each distorted
polygon) provides an independent check: to first order
dA_ij/A = -laplacian(K)_ij * Q (tests/test_sensor_model.py).
"""
from __future__ import annotations

import functools
import os
import re

import numpy as np


def read_cfg(path: str) -> dict:
    """Parse the companion .cfg (key = value, '#' comments)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            vals = v.split()
            conv = []
            for t in vals:
                try:
                    conv.append(float(t))
                except ValueError:
                    conv.append(t)
            out[k.strip()] = conv[0] if len(conv) == 1 else conv
    return out


@functools.lru_cache(maxsize=8)
def read_vertex_file(path: str):
    """-> (centers (P, 2), thetas (P, V), verts (P, V, 2)) [um], vertex
    rows grouped by pixel in file order (V = 4*NumVertices + 4)."""
    d = np.loadtxt(path, skiprows=1)
    centers, idx = np.unique(d[:, :2], axis=0, return_inverse=True)
    P = len(centers)
    V = len(d) // P
    order = np.lexsort((np.arange(len(d)), idx))
    thetas = d[order, 2].reshape(P, V)
    verts = d[order, 3:5].reshape(P, V, 2)
    return centers, thetas, verts


def _cfg_for(path: str):
    cfg_path = re.sub(r"\.dat$", ".cfg", path)
    if os.path.exists(cfg_path):
        cfg = read_cfg(cfg_path)
        q = float(cfg.get("CollectedCharge_0_0", 100000.0))
        cen = cfg.get("FilledPixelCoords_0_0", [55.0, 55.0])
        pix = float(cfg.get("PixelSizeX", 10.0))
        return q, (float(cen[0]), float(cen[1])), pix
    return 100000.0, (55.0, 55.0), 10.0


def pixel_areas(path: str):
    """Shoelace area of every distorted pixel polygon.
    -> (centers_px (P, 2) offsets from the charged pixel, area_frac (P,)
    fractional area change)."""
    centers, thetas, verts = read_vertex_file(path)
    q, (cx, cy), pix = _cfg_for(path)
    x, y = verts[..., 0], verts[..., 1]
    a = 0.5 * np.abs(np.sum(
        x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1))
    off = (centers - [cx, cy]) / pix
    return off, a / pix**2 - 1.0


def radial_displacement_profile(path: str, nbin: int = 48):
    """Azimuthally averaged radial vertex displacement m(r) [um vs px].

    The undistorted vertex position is taken from the ZERO-CHARGE
    geometry implied by the file itself: vertices of pixels far from
    the charged center (r > 3.5 px) measure the static (channel-stop /
    lattice) distortion shared by all pixels; we subtract the median
    far-field vertex offset pattern per theta so only the
    charge-induced part remains.
    -> (r_px (nbin,), m_um (nbin,)) with empty bins interpolated."""
    centers, thetas, verts = read_vertex_file(path)
    q, (cx, cy), pix = _cfg_for(path)
    P, V = thetas.shape
    # nominal vertex = intersection of the ray at theta with the square
    # pixel boundary (half-size pix/2)
    t = thetas
    ct, st = np.cos(t), np.sin(t)
    scale = (pix / 2) / np.maximum(np.abs(ct), np.abs(st))
    nomx = centers[:, None, 0] + scale * ct
    nomy = centers[:, None, 1] + scale * st
    dx = verts[..., 0] - nomx
    dy = verts[..., 1] - nomy
    # static per-theta pattern from far pixels (charge effect ~ 0 there)
    rpix = np.hypot(centers[:, 0] - cx, centers[:, 1] - cy) / pix
    far = rpix > 3.5
    dx0 = np.median(dx[far], axis=0)
    dy0 = np.median(dy[far], axis=0)
    dx = dx - dx0
    dy = dy - dy0
    # radial projection about the charged center
    vx = verts[..., 0] - cx
    vy = verts[..., 1] - cy
    r = np.hypot(vx, vy)
    rr = np.maximum(r, 1e-9)
    m = (dx * vx + dy * vy) / rr
    r_px = (r / pix).ravel()
    m = m.ravel()
    edges = np.linspace(0.0, r_px.max(), nbin + 1)
    which = np.clip(np.digitize(r_px, edges) - 1, 0, nbin - 1)
    num = np.bincount(which, m, minlength=nbin)
    den = np.bincount(which, minlength=nbin)
    prof = np.where(den > 0, num / np.maximum(den, 1), np.nan)
    cbin = 0.5 * (edges[:-1] + edges[1:])
    ok = np.isfinite(prof)
    prof = np.interp(cbin, cbin[ok], prof[ok])
    return cbin, prof


def bf_kernel_from_model(path: str, radius: int = 4,
                         strength: float = 1.0, ngrid: int = 64):
    """(2*radius+1)^2 interaction-potential kernel K [per electron]
    for sensor/silicon.py, derived from the vertex file's measured
    pixel-area response by inverting the discrete Poisson equation.

    In the field formulation photons displace by d = -grad(K * Q), so
    a pixel's effective area changes by dA/A = div(d)^(-) ... to first
    order dA/A = Q laplacian(K) at the pixel offset.  The area response
    IS the observable that sets the PTC a_ij covariances, so K is
    defined as the exact discrete inverse:

        K = laplacian^(-1) [ (dA/A) / Q ]      (FFT Poisson solve)

    This keeps the measured anisotropy (channel-stop x/y asymmetry)
    that an azimuthal average would erase, and by construction the
    rendered BF response reproduces the Poisson solver's pixel-area
    distortions on the full 9 x 9 measured footprint.

    `strength` scales the result (the image.sensor.strength config
    knob, default 1 = the file's own amplitude)."""
    q, (cx, cy), pix = _cfg_for(path)
    off, da = pixel_areas(path)
    g = np.zeros((ngrid, ngrid))
    for (ox, oy), a in zip(off, da):
        g[int(round(oy)) % ngrid, int(round(ox)) % ngrid] = a / q
    g -= g.mean()                      # solvability on the torus
    u = np.fft.fftfreq(ngrid) * 2 * np.pi
    lam = 2 * np.cos(u)[None, :] + 2 * np.cos(u)[:, None] - 4.0
    lam[0, 0] = 1.0
    Khat = np.fft.fft2(g) / lam
    Khat[0, 0] = 0.0
    K = np.real(np.fft.ifft2(Khat))
    # gauge: K -> 0 in the far field (grid corner, max torus distance)
    K = K - K[ngrid // 2, ngrid // 2]
    K = np.roll(K, (radius, radius), (0, 1))[:2 * radius + 1,
                                             :2 * radius + 1]
    return (strength * K).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _kernel_cached(path: str, radius: int, strength: float):
    return bf_kernel_from_model(path, radius, strength)


def resolve_sensor_model(name_or_path: str, search_dirs=()) -> str:
    """Accept a file path or a reference-style model name
    ('lsst_itl_50_32') resolved against `search_dirs`."""
    if os.path.exists(name_or_path):
        return name_or_path
    for d in search_dirs:
        p = os.path.join(d, name_or_path + ".dat")
        if os.path.exists(p):
            return p
        p = os.path.join(d, name_or_path)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"sensor model {name_or_path!r} not found "
                            f"in {list(search_dirs)}")
