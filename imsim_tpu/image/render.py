"""Device-side pooled photon shooting + image assembly.

One jitted pipeline replaces the reference's per-stamp hot loop
(imsim/stamp.py draw + imsim/photon_pooling.py pooled pass):

    obj_idx (N,) -> gather object params -> sample intrinsic profile
    -> shear/magnify -> PSF kick -> pupil/time/wavelength sampling
    -> [photon ops chain] -> sensor accumulate

Everything is fixed-shape; dead photons ride along with weight zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..catalog.instcat import POINT, SERSIC, KNOTS, STREAK
from ..photons import profiles as P
from ..photons.batch import PhotonBatch
from ..utils.lookup import UniformTable
from .scene import DeviceScene


def _interp_rows(table: jax.Array, rows: jax.Array, u: jax.Array):
    """Per-photon linear interpolation into per-object tables:
    table (n_obj, K); rows (N,) int32; u (N,) in [0,1]."""
    K = table.shape[1]
    f = jnp.clip(u, 0.0, 1.0) * (K - 1.000001)
    j = jnp.floor(f).astype(jnp.int32)
    w = (f - j).astype(table.dtype)
    a = table[rows, j]
    b = table[rows, j + 1]
    return a * (1 - w) + b * w


def sample_intrinsic(key, scene: DeviceScene, obj_idx: jax.Array,
                     pixel_scale: float = 0.2):
    """Sample profile offsets (in pixels) for a pooled photon batch.

    Computes each family's sample and selects by object type — the Sersic
    path is the only expensive one and dominates anyway; points are free.
    Knot positions are deterministic per (object, knot) so every photon
    batch sees the same knot constellation (galsim.RandomKnots semantics).
    """
    n = obj_idx.shape[0]
    k_srs, k_knot, k_pick, k_box = jax.random.split(key, 4)

    q = scene.p2[obj_idx]
    beta = scene.p3[obj_idx]
    hlr_as = scene.p0[obj_idx]           # arcsec
    srs_n = scene.p1[obj_idx]

    # --- Sersic (also the underlying profile for knots: exponential) ----
    srs_n_eff = jnp.where(scene.obj_type[obj_idx] == KNOTS, 1.0, srs_n)
    sx, sy = P.sample_sersic(k_srs, n, srs_n_eff, hlr_as)

    # --- Knots: snap the sersic sample to one of npoints fixed knots ----
    npoints = jnp.maximum(srs_n, 1.0).astype(jnp.int32)  # p1 = npoints
    pick = (jax.random.uniform(k_pick, (n,)) *
            npoints.astype(jnp.float32)).astype(jnp.int32)
    # deterministic per-(obj, knot) radius/angle from a hashed stream
    knot_seed = obj_idx.astype(jnp.uint32) * jnp.uint32(2654435761) \
        + pick.astype(jnp.uint32) * jnp.uint32(40503)
    u1 = (knot_seed * jnp.uint32(1664525) + jnp.uint32(1013904223))
    u2 = (u1 * jnp.uint32(1664525) + jnp.uint32(1013904223))
    fu1 = u1.astype(jnp.float32) * (1.0 / 4294967296.0)
    fu2 = u2.astype(jnp.float32) * (1.0 / 4294967296.0)
    grid = jnp.asarray(P.sersic_cdf_grid())
    K = grid.shape[1]
    jj = jnp.clip((fu1 * (K - 1.000001)).astype(jnp.int32), 0, K - 2)
    # exponential (n=1) row of the grid: index of n=1.0 in SERSIC_N_GRID
    row_n1 = int(round((1.0 - P.SERSIC_N_GRID[0])
                       / (P.SERSIC_N_GRID[1] - P.SERSIC_N_GRID[0])))
    kr = grid[row_n1, jj] * hlr_as
    kth = fu2 * (2 * jnp.pi)
    kx, ky = kr * jnp.cos(kth), kr * jnp.sin(kth)

    # --- Streak: uniform box length x width rotated by pa --------------
    ub = jax.random.uniform(k_box, (n, 2)) - 0.5
    blen = scene.p0[obj_idx]
    bwid = scene.p1[obj_idx]
    bpa = scene.p2[obj_idx]
    bx0 = ub[:, 0] * blen
    by0 = ub[:, 1] * bwid
    bx = bx0 * jnp.cos(bpa) - by0 * jnp.sin(bpa)
    by = bx0 * jnp.sin(bpa) + by0 * jnp.cos(bpa)

    t = scene.obj_type[obj_idx]
    dx = jnp.where(t == SERSIC, sx, 0.0)
    dy = jnp.where(t == SERSIC, sy, 0.0)
    dx = jnp.where(t == KNOTS, kx, dx)
    dy = jnp.where(t == KNOTS, ky, dy)
    dx = jnp.where(t == STREAK, bx, dx)
    dy = jnp.where(t == STREAK, by, dy)

    # intrinsic ellipticity (sersic/knots only)
    is_ell = (t == SERSIC) | (t == KNOTS)
    ex, ey = P.apply_ellipse(dx, dy, jnp.where(is_ell, q, 1.0),
                             jnp.where(is_ell, beta, 0.0))
    # lensing
    gx, gy = P.apply_shear_mag(ex, ey, scene.g1[obj_idx], scene.g2[obj_idx],
                               scene.mu[obj_idx])
    lens_ok = is_ell  # reference applies lens() to galaxies/knots/fits only
    dx = jnp.where(lens_ok, gx, ex)
    dy = jnp.where(lens_ok, gy, ey)
    return dx / pixel_scale, dy / pixel_scale  # arcsec -> pixels


def shoot(key, scene: DeviceScene, obj_idx: jax.Array, weight: jax.Array,
          psf_tables: dict, exptime: float = 30.0,
          pupil_radius: float = 4.18, pupil_obscuration: float = 0.612,
          pixel_scale: float = 0.2) -> PhotonBatch:
    """Produce a fully-populated photon batch for one pooled batch.

    psf_tables: {"kolmogorov": UniformTable (arcsec), "gauss_sigma": float}
    — the analytic Kolmogorov * Gaussian PSF of the minimum slice
    (imsim/psf_utils.py:42-91 equivalent). The atmospheric-screen PSF and
    raytraced optics replace this in the full chain.
    """
    n = obj_idx.shape[0]
    keys = jax.random.split(key, 6)

    # intrinsic + lensing offsets
    dx, dy = sample_intrinsic(keys[0], scene, obj_idx, pixel_scale)

    # PSF: Kolmogorov kick + gaussian kick (arcsec -> pixels)
    kx, ky = P.sample_radial(keys[1], n, psf_tables["kolmogorov"])
    gx, gy = P.sample_gaussian(keys[2], n, psf_tables["gauss_sigma"])
    dx = dx + (kx + gx) / pixel_scale
    dy = dy + (ky + gy) / pixel_scale

    x = scene.x[obj_idx] + dx
    y = scene.y[obj_idx] + dy

    # wavelength from per-object inverse CDF
    u = jax.random.uniform(keys[3], (n,))
    wl = _interp_rows(scene.wl_icdf, obj_idx, u)

    # pupil position: uniform annulus (PupilAnnulusSampler equivalent,
    # config/imsim-config.yaml photon op #3)
    u1, u2 = jax.random.uniform(keys[4], (2, n))
    r = jnp.sqrt(pupil_obscuration**2 * pupil_radius**2
                 + u1 * (1 - pupil_obscuration**2) * pupil_radius**2)
    th = u2 * 2 * jnp.pi
    pu = r * jnp.cos(th)
    pv = r * jnp.sin(th)

    # arrival time: uniform over exposure (TimeSampler equivalent)
    t = jax.random.uniform(keys[5], (n,)) * exptime

    z = jnp.zeros((n,), jnp.float32)
    return PhotonBatch(x=x, y=y, flux=weight, wavelength=wl,
                       dxdz=z, dydz=z, pupil_u=pu, pupil_v=pv, time=t)
