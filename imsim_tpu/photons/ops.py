"""Chromatic photon operators (device, pure JAX).

The reference's photon-ops chain (config/imsim-config.yaml:281-320) is
TimeSampler, PupilAnnulusSampler, PhotonDCR, RubinDiffractionOptics,
FocusDepth, Refraction.  Time/pupil sampling happen in image.render.shoot;
diffraction in photons.diffraction; optics raytrace in optics.raytrace.
This module provides the GalSim-equivalent chromatic ops:

  * photon_dcr        — differential chromatic refraction shift
  * focus_depth       — slope * depth defocus shift
  * silicon_refraction— slope refraction entering the silicon
  * bandpass_ratio    — flux reweighting between bandpasses
                        (imsim/photon_ops.py:506-533)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ARCSEC = np.pi / 180.0 / 3600.0


def air_refractive_index_minus_one(wave_nm, pressure_kpa=69.328,
                                   temperature_k=293.15, h2o_pressure_kpa=1.067):
    """(n - 1) for air, the standard Edlen-style formula GalSim uses for
    DCR (galsim.dcr semantics; conditions default to LSST site)."""
    sigma_squared = 1.0 / (wave_nm * 1.0e-3) ** 2  # 1/um^2
    n_minus_one = (64.328 + (29498.1 / (146.0 - sigma_squared))
                   + (255.4 / (41.0 - sigma_squared))) * 1.0e-6
    P = pressure_kpa * 7.50061683  # kPa -> mmHg
    T = temperature_k - 273.15
    W = h2o_pressure_kpa * 7.50061683
    n_minus_one *= P * (1.0 + (1.049 - 0.0157 * T) * 1.0e-6 * P) \
        / (720.883 * (1.0 + 0.003661 * T))
    n_minus_one -= (0.0624 - 0.000680 * sigma_squared) \
        / (1.0 + 0.003661 * T) * W * 1.0e-6
    return n_minus_one


def refraction_angle(wave_nm, zenith_angle, **kw):
    """Atmospheric refraction angle R(lambda, z) ~ r0 tan(z) [rad]."""
    n = 1.0 + air_refractive_index_minus_one(wave_nm, **kw)
    r0 = (n * n - 1.0) / (2.0 * n * n)
    return r0 * jnp.tan(zenith_angle)


def photon_dcr(x, y, wave_nm, base_wavelength, zenith_angle,
               parallactic_angle, pixel_scale=0.2, flip_sign=False, **kw):
    """Shift photon pixel positions by the differential refraction between
    their wavelength and the base wavelength, along the zenith direction
    projected at the parallactic angle (galsim.PhotonDCR behavior; enabled
    in the default chain at config/imsim-config.yaml:293-299)."""
    R = refraction_angle(wave_nm, zenith_angle, **kw)
    Rbase = refraction_angle(jnp.asarray(base_wavelength), zenith_angle, **kw)
    shift_amount = (R - Rbase) / ARCSEC / pixel_scale  # pixels
    if flip_sign:
        shift_amount = -shift_amount
    # shift towards zenith: direction (sin q, cos q) in image frame
    return (x + shift_amount * jnp.sin(parallactic_angle),
            y + shift_amount * jnp.cos(parallactic_angle))


def focus_depth(x, y, dxdz, dydz, depth_pixels):
    """Defocus: propagate photons an extra depth along their slopes
    (galsim.FocusDepth; config/imsim-config.yaml:300-306 uses the
    detector's intrafocal depth)."""
    return x + dxdz * depth_pixels, y + dydz * depth_pixels


def silicon_index(wave_nm):
    """Refractive index of silicon over 300-1100 nm (polynomial fit to
    published room-temperature data; 1% level)."""
    w = jnp.clip(wave_nm, 300.0, 1100.0) * 1e-3  # microns
    # Simple dispersion fit: n ~ 3.49 + 0.07/w^2 + 0.04/w^4 region-tuned
    return 3.42 + 0.159 / w**2 + 0.0324 / w**4


def silicon_refraction(dxdz, dydz, wave_nm):
    """Refraction entering the silicon: transverse direction components
    divide by n_Si (galsim.Refraction with index_ratio = n_si;
    config/imsim-config.yaml:307-311)."""
    n = silicon_index(wave_nm)
    return dxdz / n, dydz / n


def bandpass_ratio(flux, wave_nm, target_tput_table, initial_tput_table):
    """Reweight photon fluxes target/initial (BandpassRatio photon op,
    imsim/photon_ops.py:506-533): photons sampled from the fiducial
    airmass-1.2 bandpass get reweighted to the per-detector bandpass."""
    t = target_tput_table(wave_nm)
    i = initial_tput_table(wave_nm)
    return flux * jnp.where(i > 0, t / jnp.maximum(i, 1e-12), 0.0)
