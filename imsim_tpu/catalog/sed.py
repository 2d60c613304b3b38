"""SED machinery: load, normalize, redshift, extinguish, sample wavelengths.

Capability parity with the reference's SED pipeline (imsim/instcat.py:380-431):
  * phoSim SED files (two-column lambda[nm] f_lambda, optionally gzipped)
  * normalized so magnorm=0 corresponds to AB mag 0 at 500 nm
  * redshift, Milky Way extinction (parametrized R_V curve; the reference
    uses dust_extinction.F19 — we implement the closed-form CCM89/O'Donnell
    curve, which agrees with F19 to a few percent over the Rubin bands)
  * per-object photon-wavelength sampling = inverse-CDF table over the
    band grid, evaluated on device for the pooled photon batch.

All heavy per-object work happens once on host; the device only sees flat
(n_obj, n_lambda) CDF tables.
"""
from __future__ import annotations

import gzip
import os
from functools import lru_cache

import numpy as np

# AB mag 0 at 500 nm in photons / s / cm^2 / nm:
#   f_nu = 3630.78 Jy -> f_phot = f_nu / (h * lambda)
_H_ERG_S = 6.62607015e-27
_AB_FNU = 3.63078e-20  # erg/s/cm^2/Hz
MAGNORM_FLUX_DENSITY = _AB_FNU / (_H_ERG_S * 500e-7) * 1e-7  # ph/s/cm^2/nm
# = 1.0960e4


def load_sed_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a phoSim-style SED text file: two columns, wavelength [nm] and
    f_lambda (arbitrary normalization); '#' comments; optionally gzipped."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = np.loadtxt(f)
    return data[:, 0], data[:, 1]


def ccm89_extinction(wave_nm, a_v, r_v=3.1):
    """Cardelli, Clayton & Mathis (1989) A_lambda/A_V with O'Donnell (1994)
    optical coefficients; returns the flux attenuation factor
    10^(-0.4 * A_lambda). Valid 303 nm - 3.3 um (covers Rubin ugrizy)."""
    x = 1e3 / np.asarray(wave_nm, float)  # inverse microns
    a = np.empty_like(x)
    b = np.empty_like(x)

    # Infrared: 0.3 <= x < 1.1
    ir = x < 1.1
    a[ir] = 0.574 * x[ir] ** 1.61
    b[ir] = -0.527 * x[ir] ** 1.61

    # Optical/NIR: 1.1 <= x < 3.3 (O'Donnell 94)
    op = (x >= 1.1) & (x < 3.3)
    y = x[op] - 1.82
    a[op] = (1 + 0.104 * y - 0.609 * y**2 + 0.701 * y**3 + 1.137 * y**4
             - 1.718 * y**5 - 0.827 * y**6 + 1.647 * y**7 - 0.505 * y**8)
    b[op] = (1.952 * y + 2.908 * y**2 - 3.989 * y**3 - 7.985 * y**4
             + 11.102 * y**5 + 5.491 * y**6 - 10.805 * y**7 + 3.347 * y**8)

    # UV: 3.3 <= x < 8
    uv = x >= 3.3
    xu = np.minimum(x[uv], 8.0)
    fa = np.where(xu >= 5.9,
                  -0.04473 * (xu - 5.9) ** 2 - 0.009779 * (xu - 5.9) ** 3, 0.0)
    fb = np.where(xu >= 5.9,
                  0.2130 * (xu - 5.9) ** 2 + 0.1207 * (xu - 5.9) ** 3, 0.0)
    a[uv] = 1.752 - 0.316 * xu - 0.104 / ((xu - 4.67) ** 2 + 0.341) + fa
    b[uv] = -3.090 + 1.825 * xu + 1.206 / ((xu - 4.62) ** 2 + 0.263) + fb

    a_lam = a_v * (a + b / r_v)
    return 10.0 ** (-0.4 * a_lam)


class SED:
    """Tabulated SED in photons/s/cm^2/nm at observer-frame wavelengths."""

    __slots__ = ("wave", "fphot")

    def __init__(self, wave_nm, fphot):
        self.wave = np.asarray(wave_nm, float)
        self.fphot = np.asarray(fphot, float)

    @classmethod
    def from_flambda(cls, wave_nm, flambda):
        """f_lambda [erg/s/cm^2/nm-ish, arbitrary scale] -> photon density
        (photons proportional to f_lambda * lambda)."""
        wave_nm = np.asarray(wave_nm, float)
        return cls(wave_nm, np.asarray(flambda, float) * wave_nm)

    def normalized_magnorm0(self) -> "SED":
        """Scale so photon density at 500 nm equals the AB-mag-0 value
        (the reference's withFluxDensity(..., 500 nm) normalization,
        imsim/instcat.py:169-170,396-398)."""
        f500 = np.interp(500.0, self.wave, self.fphot)
        if f500 <= 0:
            raise ValueError("SED has no flux at 500 nm; cannot normalize")
        return SED(self.wave, self.fphot * (MAGNORM_FLUX_DENSITY / f500))

    def at_redshift(self, z: float) -> "SED":
        """Shift to observer frame. Photon *density* dilutes by 1/(1+z)
        (wavelength stretch), matching galsim.SED.atRedshift."""
        return SED(self.wave * (1.0 + z), self.fphot / (1.0 + z))

    def extinguished(self, a_v: float, r_v: float = 3.1) -> "SED":
        if a_v == 0.0:
            return self
        return SED(self.wave, self.fphot * ccm89_extinction(self.wave, a_v, r_v))

    def resample(self, grid_nm: np.ndarray) -> np.ndarray:
        return np.interp(grid_nm, self.wave, self.fphot, left=0.0, right=0.0)


@lru_cache(maxsize=512)
def _cached_raw_sed(path: str) -> SED:
    w, f = load_sed_file(path)
    return SED.from_flambda(w, f).normalized_magnorm0()


def build_object_sed(sed_name: str, redshift: float, mw_av: float,
                     mw_rv: float, sed_dirs: tuple[str, ...],
                     int_av: float = 0.0, int_rv: float = 3.1) -> SED:
    """Full per-object SED: load+cache raw file, internal (rest-frame)
    dust, redshift, Milky Way dust — in that order.

    Mirrors imsim/instcat.py:380-431 for load/normalize/redshift/MW
    extinction.  Internal extinction is parsed by the reference's
    catalog but left as a literal ``# TODO: apply internal extinction
    here`` (instcat.py:404); here it IS applied, at the physically
    correct point: in the galaxy rest frame, before the redshift
    stretch, using the same CCM89/O'Donnell curve.
    """
    for d in sed_dirs:
        full = os.path.join(d, sed_name)
        if os.path.isfile(full):
            break
    else:
        raise OSError(f"SED file {sed_name} not found in {sed_dirs}")
    sed = _cached_raw_sed(full)
    sed = sed.extinguished(int_av, int_rv)   # rest frame
    sed = sed.at_redshift(redshift)
    sed = sed.extinguished(mw_av, mw_rv)     # observer frame
    return sed
