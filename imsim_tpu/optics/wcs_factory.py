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


# Orthogonal map from our trace's focal frame to the DVCS focal plane
# the camera geometry lives in (composition of the reference's EDCS->
# DVCS x/y exchange, imsim/batoid_wcs.py:370-373, with the relation
# between batoid's and our field-angle/dircos sign conventions).
FOCAL_FRAME = np.array([[0.0, 1.0], [-1.0, 0.0]])


class WCSFactory:
    def __init__(self, obs: Observation, telescope: LoadedTelescope,
                 wavelength_nm: float = 622.0, order: int = 3):
        self.obs = obs
        self.telescope = telescope
        self.wavelength = wavelength_nm
        self.order = order
        # Sky tangent -> camera field is ONE involutory reflection,
        #     (thx, thy) = Ref(rotTelPos - q) @ (e_east, n_north),
        # with (e, n) the gnomonic tangent basis at the OBSERVED
        # boresight in observed ra/dec and q the observed parallactic
        # angle (position angle of zenith, N through E; erfa hd2pa in
        # the reference, imsim/batoid_wcs.py:256-268).  Derivation:
        # the reference's field frame is tube-aligned (thx ~ +azimuth,
        # thy ~ +altitude at the boresight, batoid_wcs.py:323-333 —
        # zenith sits at position angle q, hence the q in the axis) and
        # the camera is physically rotated by rotTelPos against the
        # tube.  The reflection axis was SOLVED, not guessed, from the
        # reference's written solutions read in textbook FITS
        # convention (tools/solve_frame.py): the golden eimage WCS of
        # visit 449053 pins Ref(rotTelPos - q) to 0.001 deg; the DC2
        # wcs_466749.yaml replay (different epoch/band/q/rotator)
        # agrees to ~1 deg (PhoSim-era solution, SIP ignored in the
        # solve).  Because q enters only through the physical zenith
        # direction, the zenith lands at a pointing-INDEPENDENT pixel
        # angle (rotTelPos - 180 deg in FITS-convention pixels), which
        # both oracles satisfy — the signature of a rigid
        # camera-on-rotator, and what makes diffraction spikes land at
        # 45 deg - rotTelPos for every pointing.
        q = obs.parallactic_angle_observed()
        self._q = float(q)
        ax = telescope.rotTelPos - self._q
        self._cax = float(np.cos(ax))
        self._sax = float(np.sin(ax))
        self._bore_rob, self._bore_dob = obs.azalt_to_observed_radec(
            np.atleast_1d(obs.bore_az), np.atleast_1d(obs.bore_alt))
        self._bore_rob = float(self._bore_rob[0])
        self._bore_dob = float(self._bore_dob[0])
        # linear field->focal scale for inversion seeds
        self._efl = self._measure_efl()

    def altaz_to_field_jacobian(self):
        """2x2 orthogonal Jacobian of the boresight-tangent alt-az ->
        camera field map, measured numerically from THIS factory's own
        observed->field chain (so photon-op kicks computed in the
        alt-az frame — DCR zenith vectors, spider-spike deflections —
        land exactly where the written WCS expects, whatever the frame
        conventions resolve to).  Columns: image of the horizontal
        (+azimuth) and zenith-ward (+altitude) unit tangents,
        field = J @ (d_horiz, d_alt).  Unit-orthogonal to ~1e-5
        (asserted); parity is not assumed."""
        eps = 1e-7
        az0, alt0 = self.obs.bore_az, self.obs.bore_alt

        def field_of(az, alt):
            ra, dec = self.obs.observed_to_icrf(np.atleast_1d(az),
                                                np.atleast_1d(alt))
            thx, thy = self.icrf_to_field(ra, dec)
            return np.array([float(thx[0]), float(thy[0])])

        f0 = field_of(az0, alt0)
        je = (field_of(az0 + eps / np.cos(alt0), alt0) - f0) / eps
        jn = (field_of(az0, alt0 + eps) - f0) / eps
        J = np.stack([je, jn], axis=1)
        assert np.allclose(J @ J.T, np.eye(2), atol=1e-4), J
        # exact orthogonalization of the finite-difference estimate
        u, _, vt = np.linalg.svd(J)
        return u @ vt

    # --- field <-> focal (raytrace) --------------------------------------
    def field_to_focal_m(self, thx, thy, tel=None):
        """Chief-ray focal-plane position [m] in DVCS for field angles
        [rad] in the camera frame (rotator already applied).  The trace
        works in the raytracer's EDCS; the reference exchanges x/y
        between EDCS and the DVCS focal plane the camera geometry lives
        in (imsim/batoid_wcs.py:370-373), applied here when
        FOCAL_SWAP_XY."""
        thx = np.atleast_1d(np.asarray(thx, float))
        thy = np.atleast_1d(np.asarray(thy, float))
        n = thx.shape[0]
        px, py, pz, vx, vy, vz = rays_from_field(
            np, thx, thy, np.zeros(n), np.zeros(n))
        out = trace(tel if tel is not None else self.telescope.fiducial,
                    px, py, pz, vx, vy, vz,
                    np.full(n, self.wavelength), np)
        F = FOCAL_FRAME
        return (F[0, 0] * out["x"] + F[0, 1] * out["y"],
                F[1, 0] * out["x"] + F[1, 1] * out["y"])

    def _measure_efl(self):
        x1, y1 = self.field_to_focal_m(0.002, 0.0)
        x2, y2 = self.field_to_focal_m(0.0021, 0.0)
        return float(np.hypot(x2[0] - x1[0], y2[0] - y1[0]) / 0.0001)

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
    def _sky_to_field(self, e_east, n_north):
        """The pinned frame reflection Ref(rotTelPos - q): involutory,
        so this is also the field -> tangent map (see __init__)."""
        return (self._cax * e_east + self._sax * n_north,
                self._sax * e_east - self._cax * n_north)

    def icrf_to_field(self, ra, dec):
        """ICRF -> camera-frame field angles (the photon-op input;
        imsim/batoid_wcs.py:499-505): gnomonic about the OBSERVED
        boresight in observed ra/dec, then the single pinned
        reflection Ref(rotTelPos - q) (rotator included)."""
        rob, dob = self.obs.icrf_to_observed_radec(
            np.asarray(ra, float), np.asarray(dec, float))
        e, n = gnomonic_project(rob, dob, self._bore_rob, self._bore_dob)
        return self._sky_to_field(e, n)

    def field_to_icrf(self, thx, thy):
        e, n = self._sky_to_field(thx, thy)   # involution: self-inverse
        rob, dob = gnomonic_deproject(e, n, self._bore_rob,
                                      self._bore_dob)
        return self.obs.observed_radec_to_icrf(rob, dob)

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
