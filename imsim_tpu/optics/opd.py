"""Optical-path-difference maps + annular Zernike analysis — imsim/opd.py
parity (the `opd` extra output, :59-203).

The reference calls batoid.analysis.wavefront/zernike; here the same
quantity comes from our own trace: a pupil grid of rays traced with path
accumulation to the detector, referenced to the chief ray, fit with
annular Zernikes.  Host-side f64 (diagnostic, once per visit).
"""
from __future__ import annotations

import numpy as np

from ..utils.zernike import fit_zernikes
from .telescope import Telescope
from .trace import rays_from_field, trace

PUPIL_R_OUTER = 4.18
PUPIL_R_INNER = 2.558
OBSCURATION = PUPIL_R_INNER / PUPIL_R_OUTER


def opd_map(tel: Telescope, thx: float, thy: float,
            wavelength_nm: float = 622.0, nx: int = 255):
    """OPD map [nm] over the pupil at field angle (thx, thy) [rad].

    Returns (opd[nx, nx], mask[nx, nx], grid_x, grid_y); opd referenced
    to the pupil mean (piston removed), NaN outside the annulus —
    matching the reference's FITS conventions (imsim/opd.py:59-140).
    """
    u = np.linspace(-PUPIL_R_OUTER, PUPIL_R_OUTER, nx)
    U, V = np.meshgrid(u, u)
    R = np.hypot(U, V)
    mask = (R <= PUPIL_R_OUTER) & (R >= PUPIL_R_INNER)
    pu = U[mask]
    pv = V[mask]
    n = pu.size
    rays = rays_from_field(np, np.full(n, thx), np.full(n, thy), pu, pv)
    from .trace import build_zk_textures
    zk_tex = build_zk_textures(tel) if np.any(np.asarray(tel.zk)) else None
    out = trace(tel, *rays, np.full(n, wavelength_nm), np,
                zk_textures=zk_tex, with_path=True)
    path = out["path"]

    # reference sphere: remove piston + tilt (the image-position freedom);
    # OPD = -(path - mean) projected out of tilt across the pupil
    A = np.stack([np.ones(n), pu, pv], axis=-1)
    coef, *_ = np.linalg.lstsq(A, path, rcond=None)
    opd_nm = -(path - A @ coef) * 1e9

    img = np.full((nx, nx), np.nan)
    img[mask] = opd_nm
    return img, mask, u, u


def annular_zernikes(tel: Telescope, thx: float, thy: float,
                     wavelength_nm: float = 622.0, jmax: int = 28,
                     nx: int = 255, eps: float = None):
    """Annular-Zernike coefficients [nm] of the wavefront at one field
    angle (imsim/opd.py zernike output; `eps` = Rubin's 0.612).

    Uses a plain Zernike fit on the annulus samples — for a fit (not a
    projection) the annular and circular bases span the same space; the
    coefficients returned are for the circular Noll basis evaluated on
    r/R_outer, which is what downstream consumers (AOS-style sensitivity
    work) need to reproduce the wavefront.

    eps: inner annulus fraction for the fit domain (imsim/opd.py `eps`
    config key; default = the physical pupil obscuration, which the
    trace mask already encodes — a LARGER user eps narrows the fit
    annulus accordingly)."""
    img, mask, u, _ = opd_map(tel, thx, thy, wavelength_nm, nx)
    U, V = np.meshgrid(u, u)
    if eps is not None and eps > OBSCURATION:
        mask = mask & (np.hypot(U, V) >= eps * PUPIL_R_OUTER)
    x = (U[mask] / PUPIL_R_OUTER)
    y = (V[mask] / PUPIL_R_OUTER)
    return fit_zernikes(x, y, img[mask], jmax)


def opd_fits_header(thx, thy, wavelength_nm, telescope_name="LSST",
                    jmax=28, eps=OBSCURATION):
    """Provenance keywords like imsim/opd.py:141-203 writes."""
    return {
        "UNITS": "nm",
        "THX": np.degrees(thx),
        "THY": np.degrees(thy),
        "WAVELEN": wavelength_nm,
        "TELESCOP": telescope_name,
        "JMAX": jmax,
        "EPS": eps,
    }


def surface_sag_map(tel: Telescope, surface_name: str, nx: int = 255):
    """Surface sag map [m] with obscuration masking — the `sag` extra
    output (imsim/sag.py:28-95)."""
    from . import geometry as G

    i = tel.names.index(surface_name)
    aper = np.asarray(tel.aper, float)[i]
    c = float(np.asarray(tel.c)[i])
    k = float(np.asarray(tel.kappa)[i])
    coefs = list(np.asarray(tel.coefs, float)[i])
    u = np.linspace(-aper[1], aper[1], nx)
    U, V = np.meshgrid(u, u)
    R = np.hypot(U, V)
    mask = (R <= aper[1]) & (R >= aper[0])
    sag = G.surface_sag(np, U, V, c, k, coefs)
    # add Zernike figure perturbation if present
    zk = np.asarray(tel.zk, float)[i]
    if np.any(zk):
        from ..utils.zernike import zernike_eval
        sag = sag + zernike_eval(zk, U / aper[1], V / aper[1])
    sag = np.where(mask, sag, np.nan)
    return sag, mask, u
