"""Telescope loading + perturbations — imsim/telescope_loader.py parity.

The reference builds a batoid telescope from yaml and applies ordered
perturbations (shift / rotX / rotY / rotZ / Zernike sag per optic,
telescope_loader.py:210-238), FEA/AOS terms via batoid_rubin
(:26-118,253-283), the rotator angle rotTelPos (:242-246), focusZ
defocus (:247-250), and per-detector z offsets (DetectorTelescope
:354-415).  Same capabilities here on the jax-pytree Telescope:
perturbations are array updates, never recompiles.
"""
from __future__ import annotations

import numpy as np

from .telescope import Telescope, make_telescope

# chromatic best-focus offsets [m] applied to the detector per band
# (the reference encodes this as per-band batoid yamls selected by
# `telescope_format` / %(band)s; here it falls out of the design:
# computed by minimizing on-axis spot rms at each band's effective
# wavelength).
BAND_FOCUS_M = {
    "u": 5.224e-4, "g": 1.931e-4, "r": -6.4e-6,
    "i": -1.113e-4, "z": -1.763e-4, "y": -2.252e-4,
}

# Optic-name aliases: users address whole elements; surfaces are split
# into entrance/exit internally.
OPTIC_SURFACES = {
    "M1": ("M1",), "M2": ("M2",), "M3": ("M3",),
    "L1": ("L1_entrance", "L1_exit"),
    "L2": ("L2_entrance", "L2_exit"),
    "Filter": ("Filter_entrance", "Filter_exit"),
    "L3": ("L3_entrance", "L3_exit"),
    "LSSTCamera": ("L1_entrance", "L1_exit", "L2_entrance", "L2_exit",
                   "Filter_entrance", "Filter_exit", "L3_entrance",
                   "L3_exit", "Detector"),
    "Detector": ("Detector",),
}


def load_telescope(telescope: str = "LSST", band: str = "r",
                   perturbations=(), fea=None, rotTelPos: float = 0.0,
                   focusZ: float = 0.0) -> "LoadedTelescope":
    """Build the (possibly perturbed) telescope for one visit.

    Parameters mirror the reference's loader (telescope_loader.py:420-451):

    perturbations : dict or list of dicts, ordered:
        {"M2": {"shift": [dx, dy, dz], "rotX": angle_rad,
                "zernikes": {"coef": [...meters], "start_j": 4}}, ...}
    fea : optional dict of AOS degree-of-freedom style Zernike coefs per
        mirror, e.g. {"M1": [z4...z22 meters]} — the mock-FEA hook
        (batoid_rubin LSSTBuilder.with_* equivalent).
    rotTelPos : camera rotator angle [rad]; consumed by the WCS/photon
        ops as a focal-plane rotation (the camera optics are
        rotationally symmetric; perturbed-camera rotation is applied to
        the perturbation Zernikes).
    focusZ : extra detector defocus [m].
    """
    if telescope not in ("LSST", "LsstCam", "LsstCamSim", "ComCam",
                         "LsstComCamSim"):
        raise ValueError(f"unknown telescope {telescope}")
    tel = make_telescope()
    tel = tel.with_focus_shift(BAND_FOCUS_M.get(band, 0.0) + focusZ)

    if isinstance(perturbations, dict):
        perturbations = [perturbations]
    for pdict in perturbations:
        for optic, terms in pdict.items():
            for surf in OPTIC_SURFACES[optic]:
                for kind, val in terms.items():
                    if kind == "shift":
                        tel = tel.with_shift(surf, np.asarray(val, float))
                    elif kind in ("rotX", "rotY", "rotZ"):
                        tel = tel.with_rot(surf, kind[-1].lower(),
                                           float(val))
                    elif kind == "zernikes":
                        coef = np.asarray(val["coef"], float)
                        tel = tel.with_zernikes(
                            surf, coef, int(val.get("start_j", 1)))
                    else:
                        raise ValueError(f"unknown perturbation {kind}")
    if fea:
        if all(k in OPTIC_SURFACES for k in fea):
            # legacy shorthand: raw per-mirror Zernike lists
            for optic, coef in fea.items():
                for surf in OPTIC_SURFACES[optic]:
                    tel = tel.with_zernikes(surf, np.asarray(coef, float),
                                            start_j=4)
        else:
            # the reference's LSSTBuilder.with_* config surface
            # (telescope_loader.py:26-118) — see optics.fea
            from .fea import fea_instructions

            for inst in fea_instructions(fea):
                if inst[0] == "zern":
                    _, optic, coef, start_j = inst
                    for surf in OPTIC_SURFACES[optic]:
                        tel = tel.with_zernikes(surf, coef, start_j)
                elif inst[0] == "shift":
                    for surf in OPTIC_SURFACES[inst[1]]:
                        tel = tel.with_shift(surf, inst[2])
                elif inst[0] == "rot":
                    for surf in OPTIC_SURFACES[inst[1]]:
                        tel = tel.with_rot(surf, inst[2], inst[3])
    return LoadedTelescope(tel=tel, band=band, rotTelPos=float(rotTelPos))


class LoadedTelescope:
    """Fiducial telescope + per-detector variants (DetectorTelescope
    equivalent, telescope_loader.py:354-415): detectors sit at slightly
    different heights; the per-detector telescope shifts the detector
    surface by the ccd z-offset and caches the result."""

    def __init__(self, tel: Telescope, band: str, rotTelPos: float):
        self.fiducial = tel
        self.band = band
        self.rotTelPos = rotTelPos
        self._cache = {}

    def for_detector(self, det_name: str = None, z_offset: float = 0.0):
        key = (det_name, round(float(z_offset), 9))
        if key not in self._cache:
            self._cache[key] = self.fiducial.with_focus_shift(z_offset)
        return self._cache[key]
