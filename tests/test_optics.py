"""Raytracer, WCS and full photon-chain tests (cf. the reference's
tests/test_batoid_wcs.py and tests/test_image.py photometry criteria)."""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

from imsim_tpu.electronics.camera import get_camera, focal_mm_to_pixel
from imsim_tpu.image.scene import DeviceScene, WL_CDF_K
from imsim_tpu.optics.loader import load_telescope
from imsim_tpu.optics.trace import trace, rays_from_field
from imsim_tpu.optics.wcs_factory import make_wcs_factory
from imsim_tpu.utils.zernike import (fit_zernikes, zernike_eval,
                                     zernike_grad, zernike_xy_coeffs)

DEG = np.pi / 180


def _pupil(n, seed=0):
    rng = np.random.default_rng(seed)
    r = np.sqrt(rng.uniform(2.558**2, 4.18**2, n))
    a = rng.uniform(0, 2 * np.pi, n)
    return r * np.cos(a), r * np.sin(a)


def test_trace_focus_and_scale():
    """On-axis spots small; EFL ~ 10.31 m (0.2''/10um pixel)."""
    tel = load_telescope(band="r").fiducial
    pu, pv = _pupil(500)
    for th, max_rms in ((0.0, 8e-6), (1.2 * DEG, 10e-6)):
        px, py, pz, vx, vy, vz = rays_from_field(
            np, np.full(500, th), np.zeros(500), pu, pv)
        out = trace(tel, px, py, pz, vx, vy, vz, np.full(500, 622.0), np)
        x, y = out["x"], out["y"]
        rms = np.hypot(x - x.mean(), y - y.mean()).std()
        assert rms < max_rms, (th, rms)
    x1 = trace(tel, *rays_from_field(np, np.full(9, 0.002), np.zeros(9),
                                     *_pupil(9)), np.full(9, 622.0),
               np)["x"].mean()
    x2 = trace(tel, *rays_from_field(np, np.full(9, 0.003), np.zeros(9),
                                     *_pupil(9)), np.full(9, 622.0),
               np)["x"].mean()
    efl = (x2 - x1) / 0.001
    assert abs(efl - 10.31) < 0.02


def test_intersect_closed_form_residuals():
    """The closed-form conic root (+ Newton polish) lands ON each
    surface: |z - sag(r)| residual at sub-nm (f64) for every surface
    of the real prescription — mirrors (strong conics + aspheres),
    lenses, flat filters and the detector — across the full aperture.
    Guards the quadratic-branch selection (near-vertex vs far sheet)."""
    from imsim_tpu.optics.geometry import intersect

    tel = load_telescope(band="r").fiducial
    rng = np.random.default_rng(3)
    n = 4000
    a = rng.uniform(0, 2 * np.pi, n)
    # rays inside each surface's REAL clear aperture, with beam-scale
    # convergence angles; outside the aperture rays are vignetted by
    # trace() and their intersection is never consumed
    for i in range(len(tel.kinds)):
        c = float(np.asarray(tel.c)[i])
        k = float(np.asarray(tel.kappa)[i])
        coefs = [float(v) for v in np.asarray(tel.coefs)[i]]
        r_in, r_out = [float(v) for v in np.asarray(tel.aper)[i]]
        r = np.sqrt(rng.uniform(r_in**2, (0.98 * r_out)**2, n))
        px, py = r * np.cos(a), r * np.sin(a)
        vx = rng.uniform(-0.25, 0.25, n)
        vy = rng.uniform(-0.25, 0.25, n)
        vz = -np.sqrt(1.0 - np.clip(vx**2 + vy**2, 0, 0.9))
        x, y, z, t, F = intersect(np, px, py,
                                  np.full(n, 1.0), vx, vy, vz, c, k,
                                  coefs if any(coefs) else [])
        # mm-scale asphere sag (M2's a4 r^4 ~ 1 mm at full aperture)
        # leaves ~6 nm after the single polish step — 3 orders below
        # the 10 um spot scale and the f32 arithmetic noise
        assert np.abs(F).max() < 2e-8, (i, np.abs(F).max())


def test_raychain_pallas_matches_xla():
    """The Pallas ray-chain kernel (interpret mode) reproduces the XLA
    composition of field_to_sensor: same functions, same key-derived
    diffraction normal, so outputs agree to f32 rounding."""
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.ops.raychain import field_to_sensor_pallas
    from imsim_tpu.photons.optics_ops import (_field_to_sensor_xla,
                                              make_optics_context)

    cam = get_camera()
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    octx = make_optics_context(fac, cam["R22_S11"])
    tel32 = fac.telescope.for_detector("R22_S11")
    n = 1 << 18
    rng = np.random.default_rng(11)
    pu, pv = _pupil(n, seed=11)
    args = (jnp.asarray(rng.uniform(-0.008, 0.008, n), jnp.float32),
            jnp.asarray(rng.uniform(-0.008, 0.008, n), jnp.float32),
            jnp.asarray(pu, jnp.float32), jnp.asarray(pv, jnp.float32),
            jnp.asarray(rng.uniform(552, 691, n), jnp.float32),
            jnp.asarray(rng.uniform(0, 30, n), jnp.float32),
            jnp.ones((n,), jnp.float32))
    key = jax.random.PRNGKey(5)
    ref = _field_to_sensor_xla(key, tel32, octx, *args)
    out = field_to_sensor_pallas(key, tel32, octx, *args,
                                 interpret=True)
    # Same functions, but compiled-XLA fusion (fma contraction, op
    # reordering) vs the kernel's op-by-op evaluation differ at f32
    # rounding, and 1 ULP at the ~10 m ray scale is ~1 um = 0.1 px —
    # the same floor test_trace_f32_matches_f64 allows against f64.
    # Rays landing far off the detector amplify that noise
    # geometrically (and are cropped by accumulate), so the pixel
    # comparison is over on/near-detector rays.
    rl = np.asarray(ref[4]) > 0
    ol = np.asarray(out[4]) > 0
    assert rl.mean() > 0.9
    # vignette decisions agree except borderline-grazing rays
    assert (rl != ol).mean() < 5e-4, (rl != ol).mean()
    x, y = np.asarray(ref[0]), np.asarray(ref[1])
    on = rl & ol & (x > -64) & (x < 4160) & (y > -64) & (y < 4160)
    assert on.sum() > 1000
    # slope noise 5e-4 over the ~100 um silicon depth is < 0.005 px
    for a, b, tol in ((ref[0], out[0], 0.35), (ref[1], out[1], 0.35),
                      (ref[2], out[2], 5e-4), (ref[3], out[3], 5e-4)):
        d = np.abs(np.asarray(a) - np.asarray(b))[on]
        assert d.max() <= tol, (tol, d.max())


def test_raychain_fused_silicon_matches_xla():
    """The fused silicon tail (depth + lateral travel + diffusion
    inside the ray-chain kernel) reproduces the XLA composition given
    the same draws — same depth_diffusion_displace function, shared
    (u, g1, g2)."""
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.ops.raychain import field_to_sensor_pallas
    from imsim_tpu.photons.optics_ops import (_field_to_sensor_xla,
                                              make_optics_context)
    from imsim_tpu.sensor.silicon import (SiliconParams,
                                          absorption_length_poly,
                                          depth_diffusion_displace)

    cam = get_camera()
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    octx = make_optics_context(fac, cam["R22_S11"])
    tel32 = fac.telescope.for_detector("R22_S11")
    sil = SiliconParams.make()
    n = 1 << 16
    rng = np.random.default_rng(13)
    pu, pv = _pupil(n, seed=13)
    wl = jnp.asarray(rng.uniform(552, 691, n), jnp.float32)
    args = (jnp.asarray(rng.uniform(-0.008, 0.008, n), jnp.float32),
            jnp.asarray(rng.uniform(-0.008, 0.008, n), jnp.float32),
            jnp.asarray(pu, jnp.float32), jnp.asarray(pv, jnp.float32),
            wl,
            jnp.asarray(rng.uniform(0, 30, n), jnp.float32),
            jnp.ones((n,), jnp.float32))
    key = jax.random.PRNGKey(7)
    statics = (float(sil.thickness_um), float(sil.pixel_um),
               float(sil.diffusion_um))
    draws = (jnp.asarray(rng.uniform(1e-7, 1, n), jnp.float32),
             jnp.asarray(rng.normal(0, 1, n), jnp.float32),
             jnp.asarray(rng.normal(0, 1, n), jnp.float32))

    rx, ry, rdx, rdy, rf = _field_to_sensor_xla(key, tel32, octx, *args)
    labs = absorption_length_poly(wl)
    rx, ry, rf = depth_diffusion_displace(
        draws[0], draws[1], draws[2], rx, ry, rdx, rdy, rf, labs,
        *statics)
    ox, oy, _, _, of = field_to_sensor_pallas(
        key, tel32, octx, *args, interpret=True,
        silicon_statics=statics, si_draws=draws)

    rl = np.asarray(rf) > 0
    ol = np.asarray(of) > 0
    assert rl.mean() > 0.85
    assert (rl != ol).mean() < 1e-3
    x, y = np.asarray(rx), np.asarray(ry)
    on = rl & ol & (x > -64) & (x < 4160) & (y > -64) & (y < 4160)
    assert on.sum() > 1000
    for a, b in ((rx, ox), (ry, oy)):
        d = np.abs(np.asarray(a) - np.asarray(b))[on]
        assert d.max() <= 0.35, d.max()


def test_trace_f32_matches_f64():
    tel = load_telescope(band="r").fiducial
    pu, pv = _pupil(200)
    rays = rays_from_field(np, np.full(200, 0.01), np.zeros(200), pu, pv)
    o64 = trace(tel, *rays, np.full(200, 622.0), np)

    @jax.jit
    def t32(tel, *args):
        o = trace(tel, *args, jnp)
        return o["x"], o["y"]

    x32, y32 = t32(tel, *[jnp.asarray(a, jnp.float32) for a in rays],
                   jnp.full((200,), 622.0, jnp.float32))
    # f32 noise must be far below the 35 um FWHM PSF scale
    assert np.abs(np.asarray(x32) - o64["x"]).max() < 3e-6


def test_band_focus():
    """Per-band detector offsets keep all bands in focus."""
    pu, pv = _pupil(300)
    for band, wl in dict(u=370.0, g=480.0, z=870.0).items():
        tel = load_telescope(band=band).fiducial
        rays = rays_from_field(np, np.full(300, 0.009), np.zeros(300),
                               pu, pv)
        o = trace(tel, *rays, np.full(300, wl), np)
        rms = np.hypot(o["x"] - o["x"].mean(), o["y"] - o["y"].mean()).std()
        assert rms < 10e-6, (band, rms)


def test_perturbation_api():
    """Shifting M2 moves the image; Zernike perturbation changes spots."""
    base = load_telescope(band="r")
    pert = load_telescope(band="r", perturbations={
        "M2": {"shift": [100e-6, 0.0, 0.0]}})
    pu, pv = _pupil(200)
    rays = rays_from_field(np, np.full(200, 0.0), np.zeros(200), pu, pv)
    x0 = trace(base.fiducial, *rays, np.full(200, 622.0), np)["x"].mean()
    x1 = trace(pert.fiducial, *rays, np.full(200, 622.0), np)["x"].mean()
    assert 1e-6 < abs(x1 - x0) < 1e-3  # decenter -> image shift


def test_wcs_roundtrip_and_scale():
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r",
                           rotTelPos=10 * DEG)
    cam = get_camera("LsstCamSim")
    wcs = fac.get_wcs(cam["R22_S11"])
    assert abs(wcs.pixel_scale() - 0.2) < 0.004
    x = np.linspace(50, 4000, 5)
    y = np.linspace(50, 3950, 5)
    ra, dec = wcs.xy_to_radec(x, y)
    xb, yb = wcs.radec_to_xy(ra, dec)
    np.testing.assert_allclose(xb, x, atol=1e-6)
    np.testing.assert_allclose(yb, y, atol=1e-6)


def test_full_chain_photometry():
    """Photons shot through the full chain (DCR+diffraction+raytrace)
    land at the WCS-predicted pixels — the test_image.py 4-sigma
    criterion, applied to the centroid."""
    from imsim_tpu.image.render import shoot_full
    from imsim_tpu.photons.optics_ops import make_optics_context

    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    wcs = fac.get_wcs(ccd)
    ctx = make_optics_context(fac, ccd)
    tel32 = fac.telescope.for_detector(ccd.det_name)

    # two point sources at known pixels
    x_t = np.array([1000.0, 3000.0])
    y_t = np.array([2000.0, 500.0])
    ra, dec = wcs.xy_to_radec(x_t, y_t)
    thx, thy = fac.icrf_to_field(ra, dec)

    wl = np.linspace(550.0, 690.0, WL_CDF_K, dtype=np.float32)
    scene = DeviceScene.from_columns(
        x=thx, y=thy, obj_type=np.zeros(2), p0=np.zeros(2),
        p1=np.ones(2), p2=np.ones(2), p3=np.zeros(2),
        g1=np.zeros(2), g2=np.zeros(2), mu=np.ones(2),
        wl_icdf=np.broadcast_to(wl, (2, WL_CDF_K)))

    n = 4096
    obj_idx = jnp.asarray(np.repeat([0, 1], n // 2), jnp.int32)
    weight = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(key, scene, obj_idx, weight, tel, ctx):
        ph = shoot_full(key, scene, obj_idx, weight, tel, ctx)
        return ph.x, ph.y, ph.flux

    x, y, flux = run(jax.random.PRNGKey(1), scene, obj_idx, weight,
                     tel32, ctx)
    x, y, flux = np.asarray(x), np.asarray(y), np.asarray(flux)
    assert flux.sum() > 0.97 * n        # R22 center: no vignetting
    for i, (xt, yt) in enumerate(zip(x_t, y_t)):
        sel = slice(i * n // 2, (i + 1) * n // 2)
        w = flux[sel]
        cx = np.average(x[sel], weights=w)
        cy = np.average(y[sel], weights=w)
        # spot+diffraction ~ 0.1''; centroid sigma ~ spot/sqrt(N)
        assert abs(cx - xt) < 1.0, (i, cx, xt)
        assert abs(cy - yt) < 1.0, (i, cy, yt)


def test_zernike_basis():
    """Orthonormality over the unit disk + gradient correctness."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 200_000)
    y = rng.uniform(-1, 1, 200_000)
    m = x * x + y * y <= 1.0
    x, y = x[m], y[m]
    for j in (2, 4, 7, 11):
        zj = zernike_eval(np.eye(12)[j - 1], x, y)
        assert abs(np.mean(zj**2) - 1.0) < 0.02, j       # unit RMS
        for k in (3, 6, 10):
            if k == j:
                continue
            zk = zernike_eval(np.eye(12)[k - 1], x, y)
            assert abs(np.mean(zj * zk)) < 0.02, (j, k)
    # gradient by finite difference
    coef = rng.normal(0, 1, 10)
    gx, gy = zernike_grad(coef, 0.3, -0.2)
    h = 1e-6
    fx = (zernike_eval(coef, 0.3 + h, -0.2)
          - zernike_eval(coef, 0.3 - h, -0.2)) / (2 * h)
    assert abs(gx - fx) < 1e-5
    # fit recovers coefficients
    z = zernike_eval(coef, x[:5000], y[:5000])
    rec = fit_zernikes(x[:5000], y[:5000], z, 10)
    np.testing.assert_allclose(rec, coef, atol=1e-8)


def test_detector_yaw_consistency():
    """Per-detector rotation (cameraGeom Orientation yaw): the pixel
    transforms, the fitted WCS, and the photon raytrace must all carry
    the same yaw, so photons still land at WCS-predicted pixels."""
    from imsim_tpu.electronics.camera import (focal_mm_to_pixel,
                                              pixel_to_focal_mm)

    cam = get_camera("LsstCamSim")
    ccd = cam["R22_S11"]
    # LsstCamSim defaults to zero yaw (WCS parity with the reference's
    # simulated camera; tests/test_golden_wcs.py) — drive the measured-
    # data override path with an explicit as-built yaw instead.
    assert getattr(ccd, "rot_deg", 0.0) == 0.0
    old = ccd.rot_deg
    ccd.rot_deg = 0.13
    try:
        # transform roundtrip with rotation
        fx, fy = pixel_to_focal_mm(ccd, np.array([100.0]),
                                   np.array([3000.0]))
        xb, yb = focal_mm_to_pixel(ccd, fx, fy)
        assert abs(xb[0] - 100.0) < 1e-9 and abs(yb[0] - 3000.0) < 1e-9
        # rotation actually shears the corner by the expected amount
        fx0 = ccd.center_mm[0] + (100.0 - (ccd.bounds.width - 1) / 2) \
            * 0.01
        assert abs(fx[0] - fx0) > 1e-5
    finally:
        ccd.rot_deg = old


def test_dcr_amplitude_and_direction():
    """End-to-end differential chromatic refraction: monochromatic blue
    and red photons through the FULL chain separate along the
    zenith-ward direction by (k1(l1)-k1(l2))*tan z (+ cubic term) —
    checked against an independent evaluation of the Edlen index and
    the parallactic geometry (PhotonDCR physics,
    config/imsim-config.yaml:288-296)."""
    from imsim_tpu.image.render import shoot_full
    from imsim_tpu.image.scene import WL_CDF_K, DeviceScene
    from imsim_tpu.optics import geometry as G
    from imsim_tpu.photons.optics_ops import make_optics_context

    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    ccd = get_camera("LsstCamSim")["R22_S11"]
    wcs = fac.get_wcs(ccd)
    ctx = make_optics_context(fac, ccd)
    tel32 = fac.telescope.for_detector(ccd.det_name)
    ra, dec = wcs.xy_to_radec(np.array([2048.0]), np.array([2048.0]))
    thx, thy = fac.icrf_to_field(ra, dec)

    def centroid(wl_nm):
        wl = np.full(WL_CDF_K, wl_nm, np.float32)
        scene = DeviceScene.from_columns(
            x=thx, y=thy, obj_type=np.zeros(1), p0=np.zeros(1),
            p1=np.ones(1), p2=np.ones(1), p3=np.zeros(1),
            g1=np.zeros(1), g2=np.zeros(1), mu=np.ones(1),
            wl_icdf=wl[None, :])
        n = 16384
        obj_idx = jnp.zeros((n,), jnp.int32)
        w = jnp.ones((n,), jnp.float32)

        @jax.jit
        def run(key):
            ph = shoot_full(key, scene, obj_idx, w, tel32, ctx)
            return ph.x, ph.y, ph.flux

        x, y, f = map(np.asarray, run(jax.random.PRNGKey(3)))
        keep = f > 0
        # median: robust to diffraction tails
        return np.median(x[keep]), np.median(y[keep])

    l_blue, l_red = 420.0, 950.0
    xb, yb = centroid(l_blue)
    xr, yr = centroid(l_red)
    dx_px = xb - xr
    dy_px = yb - yr

    # independent expectation: dalt = (k1_b - k1_r) tz + (k2_b - k2_r) tz^3
    obs = fac.obs
    beta = 0.001254
    out = {}
    for L in (l_blue, l_red):
        xi = G.air_index_excess(np, np.array([L]), obs.pressure_kpa,
                                obs.temperature_k,
                                obs.h2o_pressure_kpa)[0]
        out[L] = (xi * (1 - beta), -xi * (beta + xi * 0.5))
    tz = np.tan(np.pi / 2 - obs.bore_alt)
    dalt = (out[l_blue][0] - out[l_red][0]) * tz \
        + (out[l_blue][1] - out[l_red][1]) * tz ** 3    # radians
    # blue refracts MORE -> shifts toward zenith (higher altitude).
    # Map the (thx, thy) shift (srot*dalt, crot*dalt) to pixels via the
    # local WCS jacobian of the photon path itself: trace two nearby
    # field points achromatically? Simpler: compare magnitudes and
    # verify direction alignment with the alt-az +v axis.
    # zenith-ward FIELD direction J @ (0,1), mapped to pixel axes by
    # the field->pixel rotation R(-90) (trace + FOCAL_FRAME; det yaw 0)
    zfx = float(np.asarray(ctx.j01))
    zfy = float(np.asarray(ctx.j11))
    zx, zy = zfy, -zfx
    plate_rad_per_px = 0.2 * np.pi / 180 / 3600
    expect_px = dalt / plate_rad_per_px
    meas_px = np.hypot(dx_px, dy_px)
    assert abs(meas_px - abs(expect_px)) < 0.25 * abs(expect_px) + 0.3, \
        (meas_px, expect_px)
    # direction: parallel (or antiparallel per pixel-axis orientation)
    # to the zenith-ward field direction J @ (0, 1)
    dirdot = (dx_px * zx + dy_px * zy) / max(meas_px, 1e-9) \
        / np.hypot(zx, zy)
    assert abs(abs(dirdot) - 1.0) < 0.2, dirdot
