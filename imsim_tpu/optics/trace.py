"""Vectorized sequential raytrace through the telescope.

The per-photon replacement for batoid's C++ `telescope.trace`
(imsim/photon_ops.py:109-124, imsim/batoid_wcs.py:352-373): a fixed,
unrolled chain of Newton surface intersections + reflect/refract over a
whole ray bundle.  Branch-free and fixed-shape, so the same function

  * jits on TPU in float32 for pooled photon batches (`xp=jax.numpy`),
  * runs in numpy float64 on host for WCS fitting and OPD maps
    (`xp=numpy`), where sub-micron accuracy matters.

Vignetting is a flag, not a filter: rays failing an aperture keep
propagating with vignette=True and their flux is zeroed by the caller
(photon_ops semantics, imsim/photon_ops.py:126-133).
"""
from __future__ import annotations

import numpy as np

from . import geometry as G
from .telescope import (DETECTOR, MIRROR, REFRACT_IN, REFRACT_OUT,
                        Telescope)


def _to_local(xp, R, vtx, px, py, pz, vx, vy, vz):
    """p_local = R^T (p - vtx), v_local = R^T v.  R is (3,3)."""
    dx, dy, dz = px - vtx[0], py - vtx[1], pz - vtx[2]
    plx = R[0, 0] * dx + R[1, 0] * dy + R[2, 0] * dz
    ply = R[0, 1] * dx + R[1, 1] * dy + R[2, 1] * dz
    plz = R[0, 2] * dx + R[1, 2] * dy + R[2, 2] * dz
    vlx = R[0, 0] * vx + R[1, 0] * vy + R[2, 0] * vz
    vly = R[0, 1] * vx + R[1, 1] * vy + R[2, 1] * vz
    vlz = R[0, 2] * vx + R[1, 2] * vy + R[2, 2] * vz
    return plx, ply, plz, vlx, vly, vlz


def _to_global(xp, R, vtx, px, py, pz, vx, vy, vz):
    pgx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + vtx[0]
    pgy = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + vtx[1]
    pgz = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + vtx[2]
    vgx = R[0, 0] * vx + R[0, 1] * vy + R[0, 2] * vz
    vgy = R[1, 0] * vx + R[1, 1] * vy + R[1, 2] * vz
    vgz = R[2, 0] * vx + R[2, 1] * vy + R[2, 2] * vz
    return pgx, pgy, pgz, vgx, vgy, vgz


def trace(tel: Telescope, px, py, pz, vx, vy, vz, wavelength_nm, xp,
          zk_textures=None, with_path=False):
    """Trace rays through every surface.

    Parameters
    ----------
    tel : Telescope pytree (params may be jnp or numpy arrays)
    p*, v* : (N,) ray positions [m] and unit directions (vz < 0 entering)
    wavelength_nm : (N,) for dispersion in the silica elements
    xp : jax.numpy or numpy
    zk_textures : optional dict {surface_index: (G, G, 2) slope texture}
        from build_zk_textures() — thin-screen kick for Zernike/FEA
        mirror perturbations.
    with_path : accumulate optical path length [m] (for OPD maps)

    Returns dict with focal-plane x, y [m], direction cosines vx, vy, vz,
    vignette mask, and optionally path.
    """
    n_silica = G.silica_index(xp, wavelength_nm)
    vignette = xp.zeros_like(px) > 1.0  # all False
    path = xp.zeros_like(px)

    z0 = np.asarray(tel.z0, np.float64) if xp is np else tel.z0
    cs = np.asarray(tel.c, np.float64) if xp is np else tel.c
    ks = np.asarray(tel.kappa, np.float64) if xp is np else tel.kappa
    cf = np.asarray(tel.coefs, np.float64) if xp is np else tel.coefs
    ap = np.asarray(tel.aper, np.float64) if xp is np else tel.aper
    sh = np.asarray(tel.shift, np.float64) if xp is np else tel.shift
    rot = np.asarray(tel.rot, np.float64) if xp is np else tel.rot

    for i, kind in enumerate(tel.kinds):
        vtx = (sh[i, 0], sh[i, 1], z0[i] + sh[i, 2])
        R = rot[i]
        lx, ly, lz, lvx, lvy, lvz = _to_local(
            xp, R, vtx, px, py, pz, vx, vy, vz)

        # static python floats for the asphere Horner loop length only;
        # the values stay as array scalars (no recompile on perturbation)
        coefs_i = [cf[i, k] for k in range(cf.shape[1])]
        x, y, z, t, Fres = G.intersect(xp, lx, ly, lz, lvx, lvy, lvz,
                                       cs[i], ks[i], coefs_i)
        # grazing-incidence rays may not converge in the fixed Newton
        # budget; their intersection is meaningless — flag as vignetted
        # (10 um tolerance: f32 arithmetic noise is < 1 um)
        vignette = vignette | (xp.abs(Fres) > 1e-5)
        if with_path:
            # t is the path to *reach* this surface: it was traveled in
            # silica iff the previous surface entered glass (REFRACT_IN),
            # i.e. iff this surface is the matching REFRACT_OUT.
            path = path + t * (n_silica if kind == REFRACT_OUT else 1.0)

        r = xp.sqrt(x * x + y * y)
        vignette = vignette | (r < ap[i, 0]) | (r > ap[i, 1])

        if kind == DETECTOR:
            return dict(x=x, y=y, vx=lvx, vy=lvy, vz=lvz,
                        vignette=vignette,
                        path=path if with_path else None)

        nx, ny, nz = G.surface_normal(xp, x, y, cs[i], ks[i], coefs_i)
        if kind == MIRROR:
            lvx, lvy, lvz = G.reflect(xp, lvx, lvy, lvz, nx, ny, nz)
            if zk_textures and i in zk_textures:
                tex = zk_textures[i]
                gx, gy, sag = _sample_slope(xp, tex, x / ap[i, 1],
                                            y / ap[i, 1])
                # mirror: reflected ray tilts by 2x the surface slope error
                lvx = lvx - 2.0 * gx / ap[i, 1]
                lvy = lvy - 2.0 * gy / ap[i, 1]
                if with_path:
                    # figure error shortens/lengthens the double pass
                    path = path - 2.0 * sag
        elif kind == REFRACT_IN:
            lvx, lvy, lvz = G.refract(xp, lvx, lvy, lvz, nx, ny, nz,
                                      1.0 / n_silica)
        elif kind == REFRACT_OUT:
            lvx, lvy, lvz = G.refract(xp, lvx, lvy, lvz, nx, ny, nz,
                                      n_silica)

        px, py, pz, vx, vy, vz = _to_global(
            xp, R, vtx, x, y, z, lvx, lvy, lvz)
    raise RuntimeError("prescription has no DETECTOR surface")


def _sample_slope(xp, tex, u, v):
    """Nearest sample of a (G, G, 3) (slope_x, slope_y, sag) texture
    over the unit disk [-1, 1]^2 (perturbation surfaces are smooth)."""
    Gn = tex.shape[0]
    iu = xp.clip(((u + 1.0) * 0.5 * (Gn - 1)).astype(np.int32), 0, Gn - 1)
    iv = xp.clip(((v + 1.0) * 0.5 * (Gn - 1)).astype(np.int32), 0, Gn - 1)
    flat = tex.reshape(-1, 3)
    idx = iv * Gn + iu
    g = flat[idx]
    return g[..., 0], g[..., 1], g[..., 2]


def build_zk_textures(tel: Telescope, grid=256):
    """Host: convert nonzero Zernike perturbation coefficients into
    (grid, grid, 3) (slope_x, slope_y, sag) textures in normalized-pupil
    units (the thin screen sampled by trace()); returns
    {surface_index: texture}."""
    from ..utils.zernike import zernike_eval, zernike_grad

    zk = np.asarray(tel.zk)
    out = {}
    u = np.linspace(-1, 1, grid)
    U, V = np.meshgrid(u, u)
    for i in range(zk.shape[0]):
        if not np.any(zk[i]):
            continue
        gx, gy = zernike_grad(zk[i], U, V)
        sag = zernike_eval(zk[i], U, V)
        inside = (U * U + V * V) <= 1.0
        tex = np.stack([gx * inside, gy * inside,
                        sag * inside], -1).astype(np.float32)
        out[i] = tex
    return out


def rays_from_field(xp, thx, thy, pupil_u, pupil_v, z_start=10.0):
    """Build entrance rays: field angle (thx, thy) [rad] and pupil
    position [m].  Direction points down into the telescope; the pupil
    coordinate is the ray's (x, y) at z = z_start (a good proxy for the
    M1 footprint at LSST's stop)."""
    vz = -1.0 / xp.sqrt(1.0 + thx * thx + thy * thy)
    vx = -thx * vz
    vy = -thy * vz
    px = pupil_u - thx * z_start
    py = pupil_v - thy * z_start
    pz = xp.zeros_like(px) + z_start
    return px, py, pz, vx, vy, vz
