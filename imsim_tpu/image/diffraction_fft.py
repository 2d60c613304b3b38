"""Diffraction-spike overlay for saturated stars — imsim/diffraction_fft.py
parity.

The statistical photon kick (photons.diffraction) produces correct spikes
for photon-shot objects; FFT-rendered bright stars need the same spikes
painted post-hoc.  The reference convolves the saturated-pixel region
with an analytic 4-fold spike PSF: a Lorentzian-profile antialiased
cross, smeared over the exposure's field rotation (:5-123), applied via
scipy convolve2d on a bounding box (:126-227).

TPU-first: the kernel is built once per (band, exposure) on host; the
overlay is one FFT convolution of the *saturation excess* image with the
kernel — a 4k x 4k rfft2 pair on the MXU, no bounding-box bookkeeping.
"""
from __future__ import annotations

import functools
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def spike_kernel(wavelength_nm: float = 622.0, pixel_scale: float = 0.2,
                 alpha_deg: float = 45.0, rot_smear_deg: float = 0.5,
                 n: int = 513, spike_flux_fraction: float = 0.02):
    """(n, n) kernel: central delta (1 - f) + 4 spikes carrying f.

    Radial profile ~ Lorentzian^2 in distance (the sinc^2 envelope of a
    strut, azimuthally averaged — the reference fits brightness =
    a / (b + (r/c)^2)^2 to photon-shooting output, :5-26).  The cross is
    rotated to the spider angle and smeared over the field rotation."""
    c = n // 2
    yy, xx = np.mgrid[-c:c + 1, -c:c + 1]
    # spike half-width scale in pixels: lambda/(strut width) diffraction
    # angle ~ lam/0.05m = 1.2e-5 rad ~ 2.5 arcsec ~ 12 px at 622nm
    r_scale = (wavelength_nm * 1e-9 / 0.05) / (pixel_scale * np.pi / 180
                                               / 3600)
    kern = np.zeros((n, n))
    n_rot = max(int(rot_smear_deg / 0.1), 1)
    for drot in np.linspace(-rot_smear_deg / 2, rot_smear_deg / 2, n_rot):
        for ang in np.radians(alpha_deg + drot) + np.arange(4) * np.pi / 2:
            ca, sa = np.cos(ang), np.sin(ang)
            along = xx * ca + yy * sa
            perp = xx * -sa + yy * ca
            on_spike = (along > 0.5)
            prof = 1.0 / (1.0 + (along / r_scale) ** 2) ** 1.5
            width = 1.0 + 0.02 * np.abs(along)      # slight flare
            lateral = np.exp(-0.5 * (perp / width) ** 2)
            kern += np.where(on_spike, prof * lateral, 0.0)
    kern /= kern.sum()
    kern *= spike_flux_fraction
    kern[c, c] += 1.0 - spike_flux_fraction
    return kern.astype(np.float32)


@partial(jax.jit, static_argnames=())
def apply_spikes(image, kernel, sat_level: float):
    """Redistribute the charge of saturated pixels through the spike
    kernel: excess = max(I - sat, 0) is convolved, the rest stays.
    Charge-conserving up to edge clipping; only saturated sources grow
    spikes (the reference's bounding-box criterion, :126-227; spikes
    are clipped to the stamp bounds exactly as the reference clips the
    overlay to fft_image bounds, imsim/stamp.py:520-524).

    image may carry leading batch dims: (..., H, W) — the FFT pair runs
    over the last two axes, so a whole stamp bucket is one call.
    """
    excess = jnp.maximum(image - sat_level, 0.0)
    base = image - excess
    H, W = image.shape[-2:]
    kH, kW = kernel.shape
    # FFT convolution, zero-padded to H+kH
    PH, PW = H + kH, W + kW
    F_img = jnp.fft.rfft2(excess, s=(PH, PW), axes=(-2, -1))
    F_k = jnp.fft.rfft2(kernel, s=(PH, PW))
    conv = jnp.fft.irfft2(F_img * F_k, s=(PH, PW), axes=(-2, -1))
    y0, x0 = kH // 2, kW // 2
    return base + conv[..., y0:y0 + H, x0:x0 + W]
