"""Statistical spider diffraction (device, pure JAX).

Physics parity with imsim/diffraction.py: photons crossing the pupil near
a spider vane or aperture edge receive a random angular kick perpendicular
to the nearest edge, with standard deviation
    phi* = arctan(1 / (2 k delta)),  k = 2 pi / lambda
(heuristic from NASA 19990094899 eq 4.9), rotated with the field over the
exposure (earth-rotation alt-az field rotation).

Geometry: thick lines [nx, ny, d, thickness] + circles [cx, cy, r]; the
Rubin spider is 4 diagonal vanes + the two aperture circles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Rubin spider/aperture 2D projection (same physical constants as
# imsim/diffraction.py:32-42: vanes at +-45 deg offset 0.4 m, half-
# thickness 0.025 m; aperture annulus radii 2.558, 4.18 m).
S2 = 1.0 / np.sqrt(2.0)
SPIDER_LINES = np.array([
    [S2, S2, -0.4, 0.025],
    [-S2, S2, -0.4, 0.025],
    [S2, S2, 0.4, 0.025],
    [-S2, S2, 0.4, 0.025],
], np.float32)
SPIDER_CIRCLES = np.array([
    [0.0, 0.0, 2.558],
    [0.0, 0.0, 4.18],
], np.float32)

OMEGA_EARTH = 7.292115826090781e-05  # rad/s


def nearest_edge(px, py, lines=None, circles=None):
    """Distance and unit direction to the nearest geometry edge for pupil
    points (px, py). Returns (dist, nx, ny)."""
    lines = SPIDER_LINES if lines is None else lines
    circles = SPIDER_CIRCLES if circles is None else circles
    L = jnp.asarray(lines)
    C = jnp.asarray(circles)
    # thick lines: | |n.p - d| - t |
    nd = L[:, 0][:, None] * px[None, :] + L[:, 1][:, None] * py[None, :]
    dl = jnp.abs(jnp.abs(nd - L[:, 2][:, None]) - L[:, 3][:, None])  # (nl, N)
    il = jnp.argmin(dl, axis=0)
    dmin_l = jnp.min(dl, axis=0)
    # circles: | |p - c| - r |
    dxc = px[None, :] - C[:, 0][:, None]
    dyc = py[None, :] - C[:, 1][:, None]
    rr = jnp.hypot(dxc, dyc)
    dc = jnp.abs(rr - C[:, 2][:, None])
    ic = jnp.argmin(dc, axis=0)
    dmin_c = jnp.min(dc, axis=0)

    use_line = dmin_l < dmin_c
    dist = jnp.where(use_line, dmin_l, dmin_c)
    lnx = L[il, 0]
    lny = L[il, 1]
    cx = C[ic, 0]
    cy = C[ic, 1]
    dxn = cx - px
    dyn = cy - py
    nrm = jnp.maximum(jnp.hypot(dxn, dyn), 1e-12)
    nx = jnp.where(use_line, lnx, dxn / nrm)
    ny = jnp.where(use_line, lny, dyn / nrm)
    return dist, nx, ny


def field_rotation_angle(t, latitude, altitude, azimuth):
    """Field rotation angle theta(t) for an alt-az telescope: the rotation
    of the parallactic frame over time t [sec] from exposure start
    (imsim/diffraction.py:279-384 computes the same via e_z cross
    products; here in closed form via the rotation rate integral)."""
    # e_focal in equatorial frame at t=0
    e_z0 = jnp.array([np.cos(latitude), 0.0, np.sin(latitude)])
    e_east = jnp.array([0.0, 1.0, 0.0])
    e_north = jnp.array([-np.sin(latitude), 0.0, np.cos(latitude)])
    e_focal = (e_east * jnp.cos(altitude) * jnp.sin(azimuth)
               + e_north * jnp.cos(altitude) * jnp.cos(azimuth)
               + e_z0 * jnp.sin(altitude))
    # zenith direction at time t
    wt = OMEGA_EARTH * t
    e_zt = jnp.stack([jnp.cos(wt) * np.cos(latitude),
                      jnp.sin(wt) * np.cos(latitude),
                      jnp.full_like(t, np.sin(latitude))], axis=-1)
    e_h0 = jnp.cross(jnp.broadcast_to(e_focal, e_zt.shape), e_z0[None])
    e_ht = jnp.cross(jnp.broadcast_to(e_focal, e_zt.shape), e_zt)
    nrm = (jnp.linalg.norm(e_ht, axis=-1) * jnp.linalg.norm(e_h0, axis=-1))
    cos_t = jnp.sum(e_ht * e_h0, axis=-1) / nrm
    sin_t = jnp.sum(e_zt * e_h0, axis=-1) / nrm
    return jnp.arctan2(sin_t, cos_t)


def apply_diffraction(key, pupil_u, pupil_v, dxdz, dydz, wavelength_nm,
                      t=None, latitude=-0.5278, altitude=None, azimuth=None,
                      enable_field_rotation=True):
    """Return kicked (dxdz, dydz) slopes.

    The kick changes the transverse direction by d_tan_phi along the edge
    normal (imsim/diffraction.py:153-189), sampled as N(0, phi*^2).
    """
    if enable_field_rotation and t is not None and altitude is not None:
        theta = field_rotation_angle(t, latitude, altitude, azimuth)
        c, s = jnp.cos(theta), jnp.sin(theta)
        # rotate pupil coords backwards, kick, rotate kick forward
        pu = c * pupil_u + s * pupil_v
        pv = -s * pupil_u + c * pupil_v
    else:
        c = jnp.ones_like(pupil_u)
        s = jnp.zeros_like(pupil_u)
        pu, pv = pupil_u, pupil_v

    dist, nx, ny = nearest_edge(pu, pv)
    k = 2 * jnp.pi / (wavelength_nm * 1e-9)
    phi_star = jnp.arctan(1.0 / (2.0 * k * jnp.maximum(dist, 1e-9)))
    kick = phi_star * jax.random.normal(key, pupil_u.shape)
    du = kick * nx
    dv = kick * ny
    # rotate kick back to the sky frame
    du_r = c * du - s * dv
    dv_r = s * du + c * dv
    return dxdz + du_r, dydz + dv_r
