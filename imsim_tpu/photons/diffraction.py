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
    points (px, py). Returns (dist, nx, ny).

    Branch-free select chains instead of argmin+gather: TPU gathers cost
    ~130 ms per 16.7M elements even from a 4-row table, while selects
    are free VPU ops.  The geometry is a compile-time constant list."""
    lines = np.asarray(SPIDER_LINES if lines is None else lines)
    circles = np.asarray(SPIDER_CIRCLES if circles is None else circles)

    dist = None
    nx = ny = None
    for lnx, lny, d0, thick in lines:
        dl = jnp.abs(jnp.abs(lnx * px + lny * py - d0) - thick)
        if dist is None:
            dist, nx, ny = dl, jnp.full_like(px, lnx), jnp.full_like(px,
                                                                     lny)
        else:
            closer = dl < dist
            nx = jnp.where(closer, lnx, nx)
            ny = jnp.where(closer, lny, ny)
            dist = jnp.minimum(dl, dist)
    for cx, cy, r in circles:
        dxc = cx - px
        dyc = cy - py
        rr = jnp.maximum(jnp.hypot(dxc, dyc), 1e-12)
        dc = jnp.abs(rr - r)
        closer = dc < dist
        nx = jnp.where(closer, dxc / rr, nx)
        ny = jnp.where(closer, dyc / rr, ny)
        dist = jnp.minimum(dc, dist)
    return dist, nx, ny


def field_rotation_sincos(t, latitude, altitude, azimuth, xp=jnp):
    """(sin, cos) of the field rotation angle theta(t) for an alt-az
    telescope: the rotation of the parallactic frame over time t [sec]
    from exposure start (imsim/diffraction.py:279-384 computes the same
    via e_z cross products; here in closed form).

    Returned as a sin/cos PAIR (normalized): the photon chain only ever
    rotates by theta, and Mosaic has no atan2 lowering — the Pallas
    ray-chain kernel (ops/raychain.py) consumes this form directly.

    xp: jnp (device photon chain) or np — host callers (prepare_ccd's
    24-sample spike-sweep curve) pass np to avoid eager device
    dispatches, which cost an RPC round trip each on the tunnel.

    Written in flat per-COMPONENT form (no (..., 3) stacking): the
    stacked version materialized rank-(N, 3) temporaries per photon
    batch, and flat components are the only form the Pallas ray-chain
    kernel can run."""
    cl, sl = np.cos(latitude), np.sin(latitude)
    # e_focal in equatorial frame at t=0 (scalar components; altitude/
    # azimuth may be traced scalars)
    ca, sa = xp.cos(altitude), xp.sin(altitude)
    fx = -sl * ca * xp.cos(azimuth) + cl * sa
    fy = ca * xp.sin(azimuth)
    fz = cl * ca * xp.cos(azimuth) + sl * sa
    # e_h0 = e_focal x e_z0,  e_z0 = (cl, 0, sl)
    h0x = fy * sl
    h0y = fz * cl - fx * sl
    h0z = -fy * cl
    n_h0 = xp.sqrt(h0x * h0x + h0y * h0y + h0z * h0z)
    # zenith direction at time t (array components)
    wt = OMEGA_EARTH * t
    zx = xp.cos(wt) * cl
    zy = xp.sin(wt) * cl
    # zz = sl (constant)
    # e_ht = e_focal x e_zt
    htx = fy * sl - fz * zy
    hty = fz * zx - fx * sl
    htz = fx * zy - fy * zx
    nrm = xp.sqrt(htx * htx + hty * hty + htz * htz) * n_h0
    cos_t = (htx * h0x + hty * h0y + htz * h0z) / nrm
    sin_t = (zx * h0x + zy * h0y + sl * h0z) / nrm
    # sin_t's projection plane is not exactly the h0/ht plane (the
    # zenith sweeps relative to e_focal), so renormalize the pair
    r = 1.0 / xp.sqrt(sin_t * sin_t + cos_t * cos_t)
    return sin_t * r, cos_t * r


def field_rotation_angle(t, latitude, altitude, azimuth, xp=jnp):
    """Field rotation angle theta(t) [rad] — atan2 wrapper over
    field_rotation_sincos for host/analysis callers (NOT used inside
    the Pallas kernel: Mosaic has no atan2)."""
    s, c = field_rotation_sincos(t, latitude, altitude, azimuth, xp=xp)
    return xp.arctan2(s, c)


def field_rotation_rate(latitude, altitude, azimuth):
    """d(theta)/dt at t=0 [rad/s]: omega * cos(lat) * cos(az) / cos(alt)
    (the standard alt-az field-rotation rate; the exact curve
    field_rotation_angle is linear at the per-exposure level — 30 s of
    earth rotation bends it by < 1e-5 rad).  Scalar jnp ops: traces
    cleanly inside jit."""
    return (OMEGA_EARTH * jnp.cos(latitude) * jnp.cos(azimuth)
            / jnp.maximum(jnp.cos(altitude), 1e-6))


# atan(z)/z as a polynomial in z^2 on z in [0, 1] (Chebyshev LSQ fit,
# degree 8: max |error| 4.7e-8 rad in f64, 1.5e-7 in the f32 kernel —
# far below photon shot noise on the kick angle).  Mosaic has no atan
# lowering, so the Pallas ray-chain kernel needs this closed form.
_ATAN_COEF = (0.9999999880828048, -0.33333120781002346, 0.19993716142684706,
              -0.14213196196924144, 0.10681421032869046, -0.0759680986713322,
              0.043855599054352386, -0.016827448528019175,
              0.0030499680693706565)


def _atan_pos(x):
    """atan(x) for x > 0, in Mosaic-lowerable ops only (mul/add/div/
    select): range-reduce with atan(x) = pi/2 - atan(1/x), then an
    odd polynomial on [0, 1]."""
    big = x > 1.0
    z = jnp.where(big, 1.0 / x, x)
    t = z * z
    acc = jnp.full_like(z, _ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        acc = acc * t + c
    r = z * acc
    # weakly-typed Python float: keeps full precision for f64 callers
    # (x64 host/analysis paths) without changing the f32 kernel op set
    return jnp.where(big, np.pi / 2 - r, r)


def apply_diffraction(key, pupil_u, pupil_v, dxdz, dydz, wavelength_nm,
                      t=None, latitude=-0.5278, altitude=None, azimuth=None,
                      enable_field_rotation=True, rot_rate=None,
                      normal=None):
    """Return kicked (dxdz, dydz) slopes.

    normal: optional pre-drawn standard normal (same shape as pupil_u);
    when given, `key` is unused — the Pallas ray-chain kernel draws it
    OUTSIDE the kernel with the same key the XLA path would use, so the
    photon streams are bit-identical across backends.

    The kick changes the transverse direction by d_tan_phi along the edge
    normal (imsim/diffraction.py:153-189), sampled as N(0, phi*^2).

    Field rotation: on an alt-az mount the rotator tracks the sky, so in
    the (sky-fixed) photon frame the SPIDER rotates by -theta(t) over the
    exposure (imsim/photon_ops.py:211-358 applies the same sweep; the
    raytraced golden arrays in tests/data/fft-diffraction pin both the
    sign and the nonlinearity).  theta(t) is evaluated on the EXACT curve
    (field_rotation_angle) rather than rate*t: near zenith the curve is
    strongly super-linear (alt 88 deg: 8.7 deg linearized vs 17.8 deg
    exact over 300 s), and the exact form costs only a handful of VPU
    flops per photon — arithmetic is free on this chip, gathers are not.
    rot_rate short-circuits with the linear form (tests/microbenches).
    """
    if enable_field_rotation and t is not None and \
            (altitude is not None or rot_rate is not None):
        if rot_rate is None:
            s, c = field_rotation_sincos(jnp.asarray(t), latitude,
                                         altitude, azimuth)
        else:
            theta = rot_rate * t
            c, s = jnp.cos(theta), jnp.sin(theta)
        # spider at -theta(t) in the photon frame: rotate the photon's
        # pupil coords INTO the spider frame with R(+theta)...
        pu = c * pupil_u - s * pupil_v
        pv = s * pupil_u + c * pupil_v
    else:
        c = jnp.ones_like(pupil_u)
        s = jnp.zeros_like(pupil_u)
        pu, pv = pupil_u, pupil_v

    dist, nx, ny = nearest_edge(pu, pv)
    k = 2 * jnp.pi / (wavelength_nm * 1e-9)
    phi_star = _atan_pos(1.0 / (2.0 * k * jnp.maximum(dist, 1e-9)))
    if normal is None:
        normal = jax.random.normal(key, pupil_u.shape)
    kick = phi_star * normal
    du = kick * nx
    dv = kick * ny
    # ...and rotate the kick back to the photon frame with R(-theta)
    du_r = c * du + s * dv
    dv_r = -s * du + c * dv
    return dxdz + du_r, dydz + dv_r
