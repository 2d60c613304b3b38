"""Per-detector WCS construction: ICRF -> observed -> field -> focal ->
pixel, fit as TAN-SIP.

Parity with imsim/batoid_wcs.py BatoidWCSFactory (:20-33 frames,
:352-373 field->focal by raytrace, :408-427 hexapolar sampling,
:429-453 FittedSIPWCS order-3 fit, :499-505 get_icrf_to_field).
Everything here is host-side float64 and runs once per CCD; the per-
photon hot path shares the same trace in float32 on device
(optics.trace), so sky truth, photon landing and the written WCS are
mutually consistent by construction.
"""
from __future__ import annotations

import numpy as np

from ..electronics.camera import CCD, PIXEL_SIZE_MM, focal_mm_to_pixel
from ..utils.coords import gnomonic_deproject, gnomonic_project
from .astrometry import Observation
from .loader import LoadedTelescope
from .trace import trace, rays_from_field
from .wcs import TanSipWCS, fit_tan_sip


class WCSFactory:
    def __init__(self, obs: Observation, telescope: LoadedTelescope,
                 wavelength_nm: float = 622.0, order: int = 3):
        self.obs = obs
        self.telescope = telescope
        self.wavelength = wavelength_nm
        self.order = order
        rt = telescope.rotTelPos
        self._crot = np.cos(rt)
        self._srot = np.sin(rt)
        # linear field->focal scale for inversion seeds
        self._efl = self._measure_efl()

    # --- field <-> focal (raytrace) --------------------------------------
    def field_to_focal_m(self, thx, thy, tel=None):
        """Chief-ray focal-plane position [m] for field angles [rad] in
        the camera frame (rotator already applied)."""
        thx = np.atleast_1d(np.asarray(thx, float))
        thy = np.atleast_1d(np.asarray(thy, float))
        n = thx.shape[0]
        px, py, pz, vx, vy, vz = rays_from_field(
            np, thx, thy, np.zeros(n), np.zeros(n))
        out = trace(tel if tel is not None else self.telescope.fiducial,
                    px, py, pz, vx, vy, vz,
                    np.full(n, self.wavelength), np)
        return out["x"], out["y"]

    def _measure_efl(self):
        x1, _ = self.field_to_focal_m(0.002, 0.0)
        x2, _ = self.field_to_focal_m(0.0021, 0.0)
        return float((x2[0] - x1[0]) / 0.0001)

    def focal_m_to_field(self, fx, fy, tel=None, niter=4):
        """Invert field->focal by Newton with numeric Jacobian
        (the reference least-squares inverts batoid similarly,
        batoid_wcs.py:375-406)."""
        fx = np.atleast_1d(np.asarray(fx, float))
        fy = np.atleast_1d(np.asarray(fy, float))
        thx = fx / self._efl
        thy = fy / self._efl
        h = 1e-6
        for _ in range(niter):
            X, Y = self.field_to_focal_m(thx, thy, tel)
            Xx, Yx = self.field_to_focal_m(thx + h, thy, tel)
            Xy, Yy = self.field_to_focal_m(thx, thy + h, tel)
            j11 = (Xx - X) / h
            j12 = (Xy - X) / h
            j21 = (Yx - Y) / h
            j22 = (Yy - Y) / h
            det = j11 * j22 - j12 * j21
            rx = fx - X
            ry = fy - Y
            thx = thx + (j22 * rx - j12 * ry) / det
            thy = thy + (-j21 * rx + j11 * ry) / det
        return thx, thy

    # --- ICRF <-> field ---------------------------------------------------
    def icrf_to_field(self, ra, dec):
        """ICRF -> camera-frame field angles (the photon-op input;
        imsim/batoid_wcs.py:499-505)."""
        az, alt = self.obs.icrf_to_observed(np.asarray(ra, float),
                                            np.asarray(dec, float))
        # gnomonic about the observed boresight on the az/alt sphere;
        # u toward +az (compass east), v toward +alt (zenith-ward)
        u, v = gnomonic_project(az, alt, self.obs.bore_az,
                                self.obs.bore_alt)
        # rotator: camera frame = R(-rotTelPos) x alt-az frame
        thx = self._crot * u + self._srot * v
        thy = -self._srot * u + self._crot * v
        return thx, thy

    def field_to_icrf(self, thx, thy):
        u = self._crot * thx - self._srot * thy
        v = self._srot * thx + self._crot * thy
        az, alt = gnomonic_deproject(u, v, self.obs.bore_az,
                                     self.obs.bore_alt)
        return self.obs.observed_to_icrf(az, alt)

    # --- full WCS per detector ---------------------------------------------
    def det_field_center(self, ccd: CCD, tel=None):
        fx = ccd.center_mm[0] * 1e-3
        fy = ccd.center_mm[1] * 1e-3
        thx, thy = self.focal_m_to_field(fx, fy, tel)
        return float(thx[0]), float(thy[0])

    def field_samples(self, ccd: CCD, tel=None, rings=6):
        """Hexapolar field-angle grid covering the detector + margin
        (batoid_wcs.py:408-427 equivalent)."""
        cx, cy = self.det_field_center(ccd, tel)
        # detector half-diagonal in field angle + 10% margin
        half_mm = 0.5 * np.hypot(ccd.bounds.width, ccd.bounds.height) \
            * PIXEL_SIZE_MM
        r_max = 1.1 * half_mm * 1e-3 / self._efl
        thx = [cx]
        thy = [cy]
        for k in range(1, rings + 1):
            r = r_max * k / rings
            m = 6 * k
            a = np.arange(m) * 2 * np.pi / m
            thx.extend(cx + r * np.cos(a))
            thy.extend(cy + r * np.sin(a))
        return np.array(thx), np.array(thy)

    def get_wcs(self, ccd: CCD, z_offset: float = None) -> TanSipWCS:
        """Fit the order-3 TAN-SIP pixel->ICRF WCS for one detector.

        z_offset defaults to the detector's focal height offset
        (imsim/batoid_wcs.py:36,407-411 det_z_offset semantics)."""
        if z_offset is None:
            z_offset = getattr(ccd, "height_mm", 0.0) * 1e-3
        tel = self.telescope.for_detector(ccd.det_name, z_offset)
        thx, thy = self.field_samples(ccd, tel)
        fx, fy = self.field_to_focal_m(thx, thy, tel)
        x, y = focal_mm_to_pixel(ccd, fx * 1e3, fy * 1e3)
        ra, dec = self.field_to_icrf(thx, thy)
        return fit_tan_sip(x, y, ra, dec, order=self.order)

    # convenience used by catalog culling
    def make_culling_wcs(self, ccd: CCD):
        wcs = self.get_wcs(ccd)
        return wcs


def make_wcs_factory(boresight_ra, boresight_dec, mjd, band="r",
                     rotTelPos=0.0, telescope: LoadedTelescope = None,
                     wavelength_nm=None, order: int = 3, **weather):
    """One-call builder mirroring BatoidWCSBuilder defaults
    (imsim/batoid_wcs.py:568-640: T=280 K, pressure from the site
    altitude, H2O 1 kPa, wavelength from the bandpass; SIP fit order 3
    via `image.wcs.order`)."""
    from .loader import load_telescope

    BAND_WL = dict(u=370.0, g=480.0, r=622.0, i=755.0, z=870.0, y=975.0)
    wl = wavelength_nm or BAND_WL.get(band, 622.0)
    obs = Observation(boresight_ra, boresight_dec, mjd, wavelength_nm=wl,
                      **weather)
    tel = telescope or load_telescope(band=band, rotTelPos=rotTelPos)
    return WCSFactory(obs, tel, wavelength_nm=wl, order=order)
