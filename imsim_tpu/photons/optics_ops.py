"""Device photon ops: DCR, spider diffraction, optics raytrace, silicon
refraction — the pooled-batch replacements for the reference's photon-op
chain (config/imsim-config.yaml:281-320: TimeSampler, PupilAnnulusSampler,
PhotonDCR, RubinDiffractionOptics, FocusDepth, Refraction; classes in
imsim/photon_ops.py).

Design: each op is a pure jnp function over (N,) arrays; the whole chain
composes under ONE jit per photon batch (`field_to_sensor`), tracing
every photon through the real telescope (optics.trace f32) — the batoid
C++ per-photon trace of imsim/photon_ops.py:109-124 without leaving the
device.  FocusDepth is inherent here: the trace lands on the per-detector
detector surface directly.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..optics import geometry as G
from ..optics.trace import rays_from_field, trace
from . import diffraction as D

ARCSEC = np.pi / 180 / 3600
XI_WAVE_MIN, XI_WAVE_MAX, XI_N = 300.0, 1100.0, 256


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OpticsContext:
    """Per-visit scalars the device chain needs (all jnp 0-d or python
    floats via aux). Built host-side once per CCD by
    `make_optics_context`."""

    bore_alt: jax.Array       # observed boresight altitude [rad]
    bore_az: jax.Array
    # orthogonal alt-az -> camera field Jacobian at the boresight,
    # field = [[j00, j01], [j10, j11]] @ (d_horiz, d_alt); inverse is
    # the transpose (wcs_factory.altaz_to_field_jacobian)
    j00: jax.Array
    j01: jax.Array
    j10: jax.Array
    j11: jax.Array
    # cos/sin rotTelPos: spider-kick frame -> camera field (see
    # field_to_sensor; the reference's 45deg - rotTelPos spike law)
    crot: jax.Array
    srot: jax.Array
    k1_ref: jax.Array         # refraction coefs at the WCS wavelength
    k2_ref: jax.Array
    det_cx_mm: jax.Array      # detector center in focal plane
    det_cy_mm: jax.Array
    det_crot: jax.Array       # cos/sin of the detector yaw
    det_srot: jax.Array       #   (cameraGeom Orientation rotation)
    xi_table: jax.Array       # (256,) air index excess over XI_WAVE grid
    det_nx: int
    det_ny: int
    latitude: float
    pressure_kpa: float
    temperature_k: float
    h2o_kpa: float

    def tree_flatten(self):
        return ((self.bore_alt, self.bore_az, self.j00, self.j01,
                 self.j10, self.j11, self.crot, self.srot,
                 self.k1_ref, self.k2_ref, self.det_cx_mm, self.det_cy_mm,
                 self.det_crot, self.det_srot, self.xi_table),
                (self.det_nx, self.det_ny, self.latitude,
                 self.pressure_kpa, self.temperature_k, self.h2o_kpa))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def make_optics_context(wcs_factory, ccd) -> OpticsContext:
    obs = wcs_factory.obs
    # k1_ref/k2_ref MUST use the same weather the Observation used, or a
    # spurious constant refraction offset leaks into every photon.
    f = jnp.float32
    wgrid = np.linspace(XI_WAVE_MIN, XI_WAVE_MAX, XI_N)
    xi = G.air_index_excess(np, wgrid, obs.pressure_kpa,
                            obs.temperature_k, obs.h2o_pressure_kpa)
    # The alt-az -> camera tangent map is MEASURED from the WCS
    # factory's own observed->field chain (numeric Jacobian at the
    # boresight) rather than re-derived from rotTelPos/parallactic-
    # angle conventions, so photon-op kicks (DCR zenith vectors,
    # spider-spike deflections) stay exactly consistent with the
    # written WCS by construction.
    J = wcs_factory.altaz_to_field_jacobian()
    rtp = wcs_factory.telescope.rotTelPos
    return OpticsContext(
        bore_alt=f(obs.bore_alt), bore_az=f(obs.bore_az),
        j00=f(J[0, 0]), j01=f(J[0, 1]),
        j10=f(J[1, 0]), j11=f(J[1, 1]),
        crot=f(np.cos(rtp)), srot=f(np.sin(rtp)),
        k1_ref=f(obs.k1), k2_ref=f(obs.k2),
        det_cx_mm=f(ccd.center_mm[0]), det_cy_mm=f(ccd.center_mm[1]),
        det_crot=f(np.cos(np.radians(getattr(ccd, "rot_deg", 0.0)))),
        det_srot=f(np.sin(np.radians(getattr(ccd, "rot_deg", 0.0)))),
        xi_table=jnp.asarray(xi, jnp.float32),
        det_nx=ccd.bounds.width, det_ny=ccd.bounds.height,
        latitude=float(obs.lat), pressure_kpa=float(obs.pressure_kpa),
        temperature_k=float(obs.temperature_k),
        h2o_kpa=float(obs.h2o_pressure_kpa))


def dcr_kick(ctx: OpticsContext, thx, thy, wavelength_nm):
    """Differential chromatic refraction as a field-angle kick
    (PhotonDCR equivalent, config/imsim-config.yaml:288-296; the
    reference evaluates the same Edlen index difference in GalSim C++).

    The WCS (and therefore the object's nominal field angle) includes
    refraction at the band's reference wavelength; each photon gets the
    *differential* altitude shift R(lambda) - R(lambda_ref), applied
    zenith-ward (the +v axis of the alt-az field frame).

    TPU note: the Edlen index is evaluated analytically per photon —
    ~10 VPU flops — instead of a table gather (random gathers cost
    ~8.6 ns/row on this chip regardless of width; flops are free)."""
    # altitude offset of this photon: camera -> alt-az via J^T (J is
    # orthogonal; see make_optics_context)
    v = ctx.j01 * thx + ctx.j11 * thy
    alt = ctx.bore_alt + v
    xi = G.air_index_excess(jnp, wavelength_nm, ctx.pressure_kpa,
                            ctx.temperature_k, ctx.h2o_kpa)
    beta = 0.001254
    k1 = xi * (1.0 - beta)
    k2 = -xi * (beta + xi * 0.5)
    tz = jnp.tan(jnp.clip(0.5 * jnp.pi - alt, 0.0, 1.5))
    dalt = (k1 - ctx.k1_ref) * tz + (k2 - ctx.k2_ref) * tz**3
    # zenith-ward kick: alt-az delta (0, dalt) through J
    return thx + ctx.j01 * dalt, thy + ctx.j11 * dalt


def silicon_refraction(vx, vy, vz, wavelength_nm):
    """Refract exit-ray direction into the silicon (the `Refraction`
    photon op with silicon index, config/imsim-config.yaml:312-316)."""
    from .ops import silicon_index

    inv = 1.0 / silicon_index(wavelength_nm)
    tx = vx * inv
    ty = vy * inv
    tz = jnp.sqrt(jnp.maximum(1.0 - tx * tx - ty * ty, 1e-6))
    return tx / tz, ty / tz      # slopes dx/dz, dy/dz inside silicon


def field_to_sensor(key, tel, ctx: OpticsContext, thx, thy, pupil_u,
                    pupil_v, wavelength_nm, time_s, flux,
                    apply_dcr=True, apply_diffraction=True,
                    field_rotation=True, silicon=None, si_key=None):
    """The fused RubinDiffractionOptics(+DCR+Refraction) chain: field
    angles -> detector pixels + in-silicon slopes.  Returns
    (x_pix, y_pix, dxdz, dydz, flux) with vignetted flux zeroed.
    The three flags are the photon-op config surface (stamp.photon_ops:
    PhotonDCR presence, RubinDiffraction[Optics] presence, and its
    disable_field_rotation option, imsim/photon_ops.py:184,231-250).

    On TPU at pooled-batch sizes the WHOLE chain dispatches to one
    Pallas kernel (ops/raychain.py) — same numerics functions, one HBM
    pass instead of ~25 XLA kLoop fusions (95 -> ~35 ms per
    16.7M-photon batch on v5e); the XLA composition below is the
    reference path and serves CPU meshes and small stamps.  The split
    is jax.lax.platform_dependent (lowering-time, correct under
    forced-CPU virtual meshes — see sensor/silicon.displacement_field).
    IMSIM_TPU_NO_RAYCHAIN=1 disables the kernel for A/B debugging.

    With `silicon` (a SiliconParams) and `si_key`, the image-
    independent silicon depth/diffusion displacement
    (sensor.silicon.depth_diffusion_displace) is applied to the
    outputs on BOTH platforms — inside the Pallas kernel on TPU —
    and the returned x/y are FINAL sub-pixel positions (dxdz/dydz
    come back as zeros).  The draws are shared by both branches, so
    the platforms stay bit-comparable."""
    import os as _os

    from ..ops import raychain

    sil_statics = draws = None
    if silicon is not None:
        from ..sensor.silicon import (absorption_length_poly,
                                      depth_diffusion_displace)

        sil_statics = (float(silicon.thickness_um),
                       float(silicon.pixel_um),
                       float(silicon.diffusion_um))
        n = thx.shape[0]
        k_z, k_d = jax.random.split(si_key)
        u_z = jax.random.uniform(k_z, (n,), minval=1e-7, maxval=1.0)
        g = jax.random.normal(k_d, (n, 2))
        draws = (u_z, g[:, 0], g[:, 1])

    def _displace_xla(out, wl):
        if silicon is None:
            return out
        x, y, dxdz, dydz, f = out
        labs = absorption_length_poly(wl)
        x, y, f = depth_diffusion_displace(
            draws[0], draws[1], draws[2], x, y, dxdz, dydz, f, labs,
            *sil_statics)
        z = jnp.zeros_like(x)
        return (x, y, z, z, f)

    if raychain.size_ok(thx.shape[0]) \
            and not _os.environ.get("IMSIM_TPU_NO_RAYCHAIN"):
        def _xla(*args):
            return jnp.stack(_displace_xla(_field_to_sensor_xla(
                *args, apply_dcr=apply_dcr,
                apply_diffraction=apply_diffraction,
                field_rotation=field_rotation), args[7]))

        def _pl(*args):
            return jnp.stack(raychain.field_to_sensor_pallas(
                *args, apply_dcr=apply_dcr,
                apply_diffraction=apply_diffraction,
                field_rotation=field_rotation,
                silicon_statics=sil_statics, si_draws=draws))

        packed = jax.lax.platform_dependent(
            key, tel, ctx, thx, thy, pupil_u, pupil_v, wavelength_nm,
            time_s, flux, tpu=_pl, default=_xla)
        return tuple(packed[i] for i in range(5))
    return _displace_xla(
        _field_to_sensor_xla(key, tel, ctx, thx, thy, pupil_u,
                             pupil_v, wavelength_nm, time_s, flux,
                             apply_dcr=apply_dcr,
                             apply_diffraction=apply_diffraction,
                             field_rotation=field_rotation),
        wavelength_nm)


def _field_to_sensor_xla(key, tel, ctx, thx, thy, pupil_u, pupil_v,
                         wavelength_nm, time_s, flux, apply_dcr=True,
                         apply_diffraction=True, field_rotation=True):
    """XLA composition of the chain (reference path; see
    field_to_sensor)."""
    if apply_dcr:
        thx, thy = dcr_kick(ctx, thx, thy, wavelength_nm)
    if apply_diffraction:
        # spider diffraction kicks the arrival *angle*; equal in the
        # slope and field-angle domains to first order
        dthx, dthy = jnp.zeros_like(thx), jnp.zeros_like(thy)
        dthx, dthy = D.apply_diffraction(
            key, pupil_u, pupil_v, dthx, dthy, wavelength_nm,
            t=time_s, latitude=ctx.latitude,
            altitude=ctx.bore_alt, azimuth=ctx.bore_az,
            enable_field_rotation=field_rotation)
        # Spider-kick frame -> camera field: rotate by -rotTelPos.  The
        # reference's convention (implemented identically in its FFT
        # overlay, imsim/diffraction_fft.py:152 "rottelpos = pi/4 -
        # rottelpos", asserted by its tests and its own raytrace golden
        # at rtp=20: tests/data/fft-diffraction/*.npz angle=25.07 deg)
        # is that spikes land at 45 deg - rotTelPos in pixel
        # coordinates at any pointing.  Our field->pixel map is the
        # det-yaw rotation composed with R(-90), a pure rotation, so
        # arms at 45-fold rotated by -rotTelPos in field coordinates
        # land exactly there; field rotation sweeps them by -theta(t)
        # inside D.apply_diffraction.  (Note this frame is the
        # reference's MODEL, not tube-fixed physics: a tube-fixed
        # spider would make pixel spikes co-rotate with +rotTelPos, the
        # sense the written-WCS zenith invariant follows.)
        thx = thx + (ctx.crot * dthx + ctx.srot * dthy)
        thy = thy + (-ctx.srot * dthx + ctx.crot * dthy)

    px, py, pz, vx, vy, vz = rays_from_field(jnp, thx, thy, pupil_u,
                                             pupil_v)
    out = trace(tel, px, py, pz, vx, vy, vz, wavelength_nm, jnp)
    flux = jnp.where(out["vignette"], 0.0, flux)
    # focal mm -> detector pixels through the detector's yaw
    # (electronics.camera.focal_mm_to_pixel, kept in scalar form here);
    # trace frame -> focal DVCS via the same FOCAL_FRAME map the WCS
    # factory applies (optics.wcs_factory.FOCAL_FRAME; reference
    # EDCS->DVCS exchange, imsim/batoid_wcs.py:370-373)
    from ..optics.wcs_factory import FOCAL_FRAME as _FF
    fx = _FF[0, 0] * out["x"] + _FF[0, 1] * out["y"]
    fy = _FF[1, 0] * out["x"] + _FF[1, 1] * out["y"]
    ux = fx * 1e3 - ctx.det_cx_mm
    uy = fy * 1e3 - ctx.det_cy_mm
    x_pix = (ctx.det_crot * ux + ctx.det_srot * uy) * 100.0 \
        + (ctx.det_nx - 1) / 2.0
    y_pix = (-ctx.det_srot * ux + ctx.det_crot * uy) * 100.0 \
        + (ctx.det_ny - 1) / 2.0
    dxdz, dydz = silicon_refraction(out["vx"], out["vy"], out["vz"],
                                    wavelength_nm)
    return x_pix, y_pix, dxdz, dydz, flux
