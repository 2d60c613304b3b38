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
    """p_local = R^T (p - vtx), v_local = R^T v.  R is a row-major flat
    9-sequence (scalars or 0-d arrays — indexable with a single int, so
    the same code runs on tel pytree leaves AND on scalars read from a
    Pallas SMEM ref)."""
    dx, dy, dz = px - vtx[0], py - vtx[1], pz - vtx[2]
    plx = R[0] * dx + R[3] * dy + R[6] * dz
    ply = R[1] * dx + R[4] * dy + R[7] * dz
    plz = R[2] * dx + R[5] * dy + R[8] * dz
    vlx = R[0] * vx + R[3] * vy + R[6] * vz
    vly = R[1] * vx + R[4] * vy + R[7] * vz
    vlz = R[2] * vx + R[5] * vy + R[8] * vz
    return plx, ply, plz, vlx, vly, vlz


def _to_global(xp, R, vtx, px, py, pz, vx, vy, vz):
    pgx = R[0] * px + R[1] * py + R[2] * pz + vtx[0]
    pgy = R[3] * px + R[4] * py + R[5] * pz + vtx[1]
    pgz = R[6] * px + R[7] * py + R[8] * pz + vtx[2]
    vgx = R[0] * vx + R[1] * vy + R[2] * vz
    vgy = R[3] * vx + R[4] * vy + R[5] * vz
    vgz = R[6] * vx + R[7] * vy + R[8] * vz
    return pgx, pgy, pgz, vgx, vgy, vgz


def surface_scalars(tel: Telescope, xp):
    """Per-surface parameter tuples (z0z, c, kappa, coefs, ap_lo, ap_hi,
    vtx3, rot9) with every entry a scalar / 0-d array — the common
    currency of trace_surfaces below, buildable from the Telescope
    pytree (here) or from a Pallas SMEM parameter block
    (ops/raychain.py)."""
    z0 = np.asarray(tel.z0, np.float64) if xp is np else tel.z0
    cs = np.asarray(tel.c, np.float64) if xp is np else tel.c
    ks = np.asarray(tel.kappa, np.float64) if xp is np else tel.kappa
    cf = np.asarray(tel.coefs, np.float64) if xp is np else tel.coefs
    ap = np.asarray(tel.aper, np.float64) if xp is np else tel.aper
    sh = np.asarray(tel.shift, np.float64) if xp is np else tel.shift
    rot = np.asarray(tel.rot, np.float64) if xp is np else tel.rot
    out = []
    for i in range(len(tel.kinds)):
        vtx = (sh[i, 0], sh[i, 1], z0[i] + sh[i, 2])
        R9 = tuple(rot[i, r, c2] for r in range(3) for c2 in range(3))
        coefs_i = tuple(cf[i, k] for k in range(cf.shape[1]))
        out.append((cs[i], ks[i], coefs_i, ap[i, 0], ap[i, 1], vtx, R9))
    return out


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
    return trace_surfaces(xp, surface_scalars(tel, xp), tel.kinds,
                          px, py, pz, vx, vy, vz, wavelength_nm,
                          zk_textures=zk_textures, with_path=with_path)


def trace_surfaces(xp, surfs, kinds, px, py, pz, vx, vy, vz,
                   wavelength_nm, zk_textures=None, with_path=False):
    """The surface loop over per-surface scalar tuples (see
    surface_scalars).  Pure elementwise math per surface — runs under
    numpy f64 (host WCS/OPD), XLA jit (f32 photon batches), and inside
    the Pallas ray-chain kernel (ops/raychain.py), which feeds scalars
    read from an SMEM parameter block."""
    n_silica = G.silica_index(xp, wavelength_nm)
    vignette = xp.zeros_like(px) > 1.0  # all False
    path = xp.zeros_like(px)

    for i, kind in enumerate(kinds):
        c_i, k_i, coefs_i, ap_lo, ap_hi, vtx, R = surfs[i]
        lx, ly, lz, lvx, lvy, lvz = _to_local(
            xp, R, vtx, px, py, pz, vx, vy, vz)

        x, y, z, t, Fres = G.intersect(xp, lx, ly, lz, lvx, lvy, lvz,
                                       c_i, k_i,
                                       coefs_i if any(
                                           _nonzero(a) for a in coefs_i)
                                       else ())
        # rays that miss the near branch / graze have a meaningless
        # intersection — flag as vignetted (10 um tolerance: f32
        # arithmetic noise is < 1 um)
        vignette = vignette | (xp.abs(Fres) > 1e-5)
        if with_path:
            # t is the path to *reach* this surface: it was traveled in
            # silica iff the previous surface entered glass (REFRACT_IN),
            # i.e. iff this surface is the matching REFRACT_OUT.
            path = path + t * (n_silica if kind == REFRACT_OUT else 1.0)

        r = xp.sqrt(x * x + y * y)
        vignette = vignette | (r < ap_lo) | (r > ap_hi)

        if kind == DETECTOR:
            return dict(x=x, y=y, vx=lvx, vy=lvy, vz=lvz,
                        vignette=vignette,
                        path=path if with_path else None)

        nx, ny, nz = G.surface_normal(xp, x, y, c_i, k_i, coefs_i)
        if kind == MIRROR:
            lvx, lvy, lvz = G.reflect(xp, lvx, lvy, lvz, nx, ny, nz)
            if zk_textures and i in zk_textures:
                tex = zk_textures[i]
                gx, gy, sag = _sample_slope(xp, tex, x / ap_hi,
                                            y / ap_hi)
                # mirror: reflected ray tilts by 2x the surface slope error
                lvx = lvx - 2.0 * gx / ap_hi
                lvy = lvy - 2.0 * gy / ap_hi
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


def _nonzero(a):
    """True unless `a` is a CONCRETE zero: traced scalars conservatively
    count as nonzero (the Horner loop keeps them; identical math)."""
    try:
        return float(a) != 0.0
    except Exception:
        return True


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
