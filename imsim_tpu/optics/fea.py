"""FEA / active-optics perturbations — the config surface of
imsim/telescope_loader.py:26-118 (batoid_rubin ``LSSTBuilder.with_*``).

The reference drives measured finite-element data shipped with
batoid_rubin (gravity print-through, thermal figure modes, actuator
lookup tables, 20+20 bending modes).  Those data files are not
available here, so each term is a *modeled* bending-mode basis:
deterministic per-(mirror, term) Zernike vectors with physically
motivated amplitudes and the exact same config keys, units, angle
parsing and composition order — a config written for the reference
parses unchanged and produces perturbations of the right character and
scale.

Supported terms (all composable, applied in config order):

  m1m3_gravity:      {zenith}                      [print-through]
  m1m3_temperature:  {m1m3_TBulk, m1m3_TxGrad, m1m3_TyGrad,
                      m1m3_TzGrad, m1m3_TrGrad}    [Celsius(/m)]
  m1m3_lut:          {zenith, error, seed}         [actuator LUT]
  m2_gravity:        {zenith}
  m2_temperature:    {m2_TzGrad, m2_TrGrad}
  camera_gravity:    {zenith, rotation}            [rigid-body sag]
  camera_temperature:{camera_TBulk}
  aos_dof:           {dof: 50 floats}              [AOS DOF vector]

The 50-element ``aos_dof`` vector follows the batoid_rubin convention:
  0    M2 dz [um]          1-2  M2 dx, dy [um]
  3-4  M2 rx, ry [arcsec]
  5    camera dz [um]      6-7  camera dx, dy [um]
  8-9  camera rx, ry [arcsec]
  10-29  M1M3 bending modes [um of surface]
  30-49  M2 bending modes [um of surface]
"""
from __future__ import annotations

import hashlib

import numpy as np

ARCSEC = np.pi / 180 / 3600
_JMIN, _JMAX = 4, 22          # Noll range of the modeled figure modes
_NJ = _JMAX - _JMIN + 1


def parse_angle(v) -> float:
    """Angle in radians from a float (radians) or a unit-ful string
    ('30 deg', '12 arcsec', '0.1 rad') — the reference parses *_angle
    args through galsim's Angle machinery (telescope_loader.py:110-114).
    """
    if isinstance(v, str):
        parts = v.split()
        x = float(parts[0])
        unit = parts[1].lower() if len(parts) > 1 else "rad"
        scale = {"deg": np.pi / 180, "degree": np.pi / 180,
                 "degrees": np.pi / 180, "rad": 1.0, "radians": 1.0,
                 "arcsec": ARCSEC, "arcmin": 60 * ARCSEC,
                 "hour": np.pi / 12, "hours": np.pi / 12}[unit]
        return x * scale
    return float(v)


def _basis(tag: str, n_modes: int = 1) -> np.ndarray:
    """(n_modes, _NJ) deterministic unit-RMS figure modes for a named
    term: reproducible across runs/processes (sha256, not hash())."""
    seed = int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4],
                          "little")
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(n_modes, _NJ))
    # low-order dominated: FEA figure errors are smooth
    B *= (1.0 / np.arange(1, _NJ + 1)) ** 0.7
    B /= np.sqrt((B ** 2).sum(axis=1, keepdims=True))
    return B


def _zern(surfs, coef_m):
    """One instruction: add Zernike figure [m] (Noll j=_JMIN.._JMAX) to
    each listed surface."""
    return [("zern", s, np.asarray(coef_m, float), _JMIN) for s in surfs]


def _m1m3_gravity_coef(zenith: float) -> np.ndarray:
    """Zenith-dependent print-through, zero at the build orientation
    (zenith = 0): sin/cos-zenith decomposition of the gravity vector,
    ~0.4 um rms surface at horizon (batoid_rubin m1m3 FEA scale)."""
    B = _basis("m1m3_gravity", 2)
    return 0.4e-6 * (np.sin(zenith) * B[0] + (np.cos(zenith) - 1.0) * B[1])


M1M3_TEMP_KEYS = ("m1m3_TBulk", "m1m3_TxGrad", "m1m3_TyGrad",
                  "m1m3_TzGrad", "m1m3_TrGrad")
M2_TEMP_KEYS = ("m2_TzGrad", "m2_TrGrad")


def fea_instructions(fea_cfg: dict) -> list:
    """Translate an fea config dict into an ordered instruction list:
    ("zern", surface, coef_m, start_j) | ("shift", optic, dxyz_m) |
    ("rot", optic, axis, angle_rad).  Surfaces named 'M1'/'M2'/'M3'/
    'LSSTCamera' are resolved by the loader's OPTIC_SURFACES aliases."""
    out = []
    for term, args in fea_cfg.items():
        args = dict(args or {})
        if term == "m1m3_gravity":
            z = parse_angle(args["zenith"])
            c = _m1m3_gravity_coef(z)
            # print-through splits across the shared M1M3 substrate
            out += _zern(("M1",), 0.7 * c) + _zern(("M3",), 0.3 * c)
        elif term == "m1m3_temperature":
            B = _basis("m1m3_temperature", 5)
            c = sum(float(args.get(k, 0.0)) * B[i]
                    for i, k in enumerate(M1M3_TEMP_KEYS)) * 0.1e-6
            out += _zern(("M1",), 0.7 * c) + _zern(("M3",), 0.3 * c)
        elif term == "m1m3_lut":
            # actuator lookup table: cancels the modeled gravity term,
            # imperfectly if a fractional actuator error is requested
            z = parse_angle(args["zenith"])
            c = -_m1m3_gravity_coef(z)
            err = float(args.get("error", 0.0))
            if err:
                rng = np.random.default_rng(int(args.get("seed", 0)))
                c = c * (1.0 + err * rng.normal(size=c.shape))
            out += _zern(("M1",), 0.7 * c) + _zern(("M3",), 0.3 * c)
        elif term == "m2_gravity":
            z = parse_angle(args["zenith"])
            B = _basis("m2_gravity", 2)
            c = 0.15e-6 * (np.sin(z) * B[0] + (np.cos(z) - 1.0) * B[1])
            out += _zern(("M2",), c)
        elif term == "m2_temperature":
            B = _basis("m2_temperature", 2)
            c = sum(float(args.get(k, 0.0)) * B[i]
                    for i, k in enumerate(M2_TEMP_KEYS)) * 0.05e-6
            out += _zern(("M2",), c)
        elif term == "camera_gravity":
            z = parse_angle(args["zenith"])
            rot = parse_angle(args.get("rotation", 0.0))
            # lateral camera sag rotates with the rotator; axial sag
            # follows cos(zenith); few-micron scale
            lat = 5e-6 * np.sin(z)
            dx = lat * np.cos(rot)
            dy = lat * np.sin(rot)
            dz = -2e-6 * (np.cos(z) - 1.0)
            out.append(("shift", "LSSTCamera", np.array([dx, dy, dz])))
        elif term == "camera_temperature":
            tb = float(args.get("camera_TBulk", 0.0))
            out.append(("shift", "LSSTCamera",
                        np.array([0.0, 0.0, 1e-6 * tb])))
        elif term == "aos_dof":
            dof = np.asarray(args["dof"], float)
            if dof.shape != (50,):
                raise ValueError("aos_dof.dof must have 50 elements")
            um = 1e-6
            out.append(("shift", "M2",
                        np.array([dof[1], dof[2], dof[0]]) * um))
            out.append(("rot", "M2", "x", dof[3] * ARCSEC))
            out.append(("rot", "M2", "y", dof[4] * ARCSEC))
            out.append(("shift", "LSSTCamera",
                        np.array([dof[6], dof[7], dof[5]]) * um))
            out.append(("rot", "LSSTCamera", "x", dof[8] * ARCSEC))
            out.append(("rot", "LSSTCamera", "y", dof[9] * ARCSEC))
            Bm13 = _basis("m1m3_bending", 20)
            c13 = (dof[10:30] @ Bm13) * um
            out += _zern(("M1",), 0.7 * c13) + _zern(("M3",), 0.3 * c13)
            Bm2 = _basis("m2_bending", 20)
            out += _zern(("M2",), (dof[30:50] @ Bm2) * um)
        else:
            raise ValueError(f"unknown fea term '{term}' (supported: "
                             "m1m3_gravity, m1m3_temperature, m1m3_lut, "
                             "m2_gravity, m2_temperature, camera_gravity, "
                             "camera_temperature, aos_dof)")
    return out
