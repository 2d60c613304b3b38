"""Pallas TPU kernel for the fused photon ray chain (DCR + spider
diffraction + 12-surface raytrace + silicon refraction).

Why a kernel: the chain is pure per-photon VPU arithmetic with ZERO
gathers, yet under XLA it compiles to ~25 separate kLoop fusions whose
intermediate (N,)-sized live sets round-trip HBM between kernels —
measured 95 ms per 16.7M-photon batch on v5e where the arithmetic
floor is ~30 ms and the true memory floor (8 reads + 5 writes of 67 MB)
is ~1 ms.  One Pallas program keeps the whole chain's live set in
VMEM/registers: one HBM read per input block, one write per output.

Numerics are NOT duplicated: the kernel body calls the same functions
the XLA path uses — photons.optics_ops.dcr_kick,
photons.diffraction.apply_diffraction (with the normal pre-drawn
outside so photon streams are bit-comparable), optics.trace's
trace_surfaces over scalar tuples read from an SMEM parameter block,
and photons.ops.silicon_refraction.  Reference physics:
imsim/photon_ops.py (PhotonDCR, RubinDiffractionOptics, Refraction).

Layout: photons reshape to (rows, LANES) and tile over row blocks;
telescope surfaces + visit scalars ride in SMEM.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024
# Block sizing is VMEM-budgeted, not throughput-tuned: at _ROWS=64 the
# 13 I/O blocks (double-buffered) plus the 12-surface trace's live set
# peaked at 16.07 MB of scoped VMEM -- 72 KB over the default 16 MB
# stack limit -- so production batches (>=2^18 photons) failed to
# compile on the real chip (BENCH_r04).  _ROWS=32 halves both terms
# (~8 MB peak), and the pallas_call below additionally raises
# vmem_limit_bytes so a future few-KB regression degrades double
# buffering instead of killing the compile.
_ROWS = 32          # block = (32, 1024) f32 = 128 KB; 13 io blocks ~1.6 MB

# scal layout (1, 16) f32 SMEM
_SCAL = ("bore_alt", "bore_az", "j00", "j01", "j10", "j11", "crot",
         "srot", "k1_ref", "k2_ref", "det_cx_mm", "det_cy_mm",
         "det_crot", "det_srot")


def _surf_matrix(tel):
    """(S, 16+K) parameter block: [c, kappa, coefs(K), ap_lo, ap_hi,
    vtx_x, vtx_y, vtx_z, rot(9 row-major)] per surface."""
    S = len(tel.kinds)
    c = jnp.asarray(tel.c, jnp.float32).reshape(S, 1)
    k = jnp.asarray(tel.kappa, jnp.float32).reshape(S, 1)
    cf = jnp.asarray(tel.coefs, jnp.float32)
    ap = jnp.asarray(tel.aper, jnp.float32)
    sh = jnp.asarray(tel.shift, jnp.float32)
    vtx = jnp.stack([sh[:, 0], sh[:, 1],
                     jnp.asarray(tel.z0, jnp.float32) + sh[:, 2]], axis=1)
    rot = jnp.asarray(tel.rot, jnp.float32).reshape(S, 9)
    return jnp.concatenate([c, k, cf, ap, vtx, rot], axis=1)


def _kernel(scal, surf, thx_ref, thy_ref, pu_ref, pv_ref, wl_ref, t_ref,
            w_ref, nrm_ref, *refs, kinds, n_coef, statics, apply_dcr,
            apply_diffr, field_rotation, silicon_statics):
    if silicon_statics is None:
        u_ref = g1_ref = g2_ref = None
        x_ref, y_ref, dxdz_ref, dydz_ref, flux_ref = refs
    else:
        # fused silicon tail: the depth/diffusion draws ride in as
        # blocks (XLA threefry is ~free; in-kernel PRNG would change
        # the stream) and the displaced pixel positions come out —
        # the separate XLA displacement stage and its 5-array HBM
        # round-trip disappear (~25 ms per 16.7M-photon batch).
        u_ref, g1_ref, g2_ref, x_ref, y_ref, flux_ref = refs
        dxdz_ref = dydz_ref = None
    from ..optics.trace import rays_from_field, trace_surfaces
    from ..optics.wcs_factory import FOCAL_FRAME
    from ..photons import diffraction as D
    from ..photons.ops import silicon_refraction as _si_refract
    from ..photons.optics_ops import OpticsContext, dcr_kick

    (latitude, pressure_kpa, temperature_k, h2o_kpa,
     det_nx, det_ny) = statics
    s = lambda i: scal[0, i]
    ctx = OpticsContext(
        bore_alt=s(0), bore_az=s(1), j00=s(2), j01=s(3), j10=s(4),
        j11=s(5), crot=s(6), srot=s(7), k1_ref=s(8), k2_ref=s(9),
        det_cx_mm=s(10), det_cy_mm=s(11), det_crot=s(12),
        det_srot=s(13), xi_table=None, det_nx=det_nx, det_ny=det_ny,
        latitude=latitude, pressure_kpa=pressure_kpa,
        temperature_k=temperature_k, h2o_kpa=h2o_kpa)

    thx = thx_ref[...]
    thy = thy_ref[...]
    pu = pu_ref[...]
    pv = pv_ref[...]
    wl = wl_ref[...]
    t = t_ref[...]
    flux = w_ref[...]

    if apply_dcr:
        thx, thy = dcr_kick(ctx, thx, thy, wl)
    if apply_diffr:
        z = jnp.zeros_like(thx)
        dthx, dthy = D.apply_diffraction(
            None, pu, pv, z, z, wl, t=t, latitude=latitude,
            altitude=ctx.bore_alt, azimuth=ctx.bore_az,
            enable_field_rotation=field_rotation, normal=nrm_ref[...])
        thx = thx + (ctx.crot * dthx + ctx.srot * dthy)
        thy = thy + (-ctx.srot * dthx + ctx.crot * dthy)

    px, py, pz, vx, vy, vz = rays_from_field(jnp, thx, thy, pu, pv)
    K = n_coef
    surfs = []
    for i in range(len(kinds)):
        coefs_i = tuple(surf[i, 2 + j] for j in range(K))
        surfs.append((surf[i, 0], surf[i, 1], coefs_i,
                      surf[i, 2 + K], surf[i, 3 + K],
                      (surf[i, 4 + K], surf[i, 5 + K], surf[i, 6 + K]),
                      tuple(surf[i, 7 + K + j] for j in range(9))))
    out = trace_surfaces(jnp, surfs, kinds, px, py, pz, vx, vy, vz, wl)

    flux = jnp.where(out["vignette"], 0.0, flux)
    ff = np.asarray(FOCAL_FRAME, np.float32)
    fx = ff[0, 0] * out["x"] + ff[0, 1] * out["y"]
    fy = ff[1, 0] * out["x"] + ff[1, 1] * out["y"]
    ux = fx * 1e3 - ctx.det_cx_mm
    uy = fy * 1e3 - ctx.det_cy_mm
    xpix = (ctx.det_crot * ux + ctx.det_srot * uy) * 100.0 \
        + (det_nx - 1) / 2.0
    ypix = (-ctx.det_srot * ux + ctx.det_crot * uy) * 100.0 \
        + (det_ny - 1) / 2.0
    dxdz, dydz = _si_refract(out["vx"], out["vy"], wl)
    if silicon_statics is None:
        x_ref[...] = xpix
        y_ref[...] = ypix
        dxdz_ref[...] = dxdz
        dydz_ref[...] = dydz
        flux_ref[...] = flux
    else:
        from ..sensor.silicon import (absorption_length_poly,
                                      depth_diffusion_displace)

        thick, pix_um, diff_um = silicon_statics
        labs = absorption_length_poly(wl)
        xpix, ypix, flux = depth_diffusion_displace(
            u_ref[...], g1_ref[...], g2_ref[...], xpix, ypix, dxdz,
            dydz, flux, labs, thick, pix_um, diff_um)
        x_ref[...] = xpix
        y_ref[...] = ypix
        flux_ref[...] = flux


def field_to_sensor_pallas(key, tel, ctx, thx, thy, pu, pv, wl, t, flux,
                           apply_dcr=True, apply_diffraction=True,
                           field_rotation=True, interpret=False,
                           silicon_statics=None, si_draws=None):
    """Drop-in for photons.optics_ops.field_to_sensor's fused chain.
    Same outputs (x_pix, y_pix, dxdz, dydz, flux); the diffraction
    normal is drawn with `key` exactly as the XLA path draws it.

    With silicon_statics=(thickness_um, pixel_um, diffusion_um) and
    si_draws=(u, g1, g2) the kernel also applies the image-independent
    silicon depth/diffusion displacement (sensor.silicon.
    depth_diffusion_displace) and returns (x, y, zeros, zeros, flux)
    with x/y FINAL sub-pixel positions."""
    n = thx.shape[0]
    nrm = jax.random.normal(key, (n,)) if apply_diffraction \
        else jnp.zeros((n,), jnp.float32)

    BLK = _ROWS * _LANES
    np_ = ((n + BLK - 1) // BLK) * BLK
    rows = np_ // _LANES

    def shape2(a):
        a = jnp.asarray(a, jnp.float32)
        if np_ != n:
            a = jnp.pad(a, (0, np_ - n), mode="edge")
        return a.reshape(rows, _LANES)

    ins = [shape2(a) for a in (thx, thy, pu, pv, wl, t, flux, nrm)]
    if silicon_statics is not None:
        ins += [shape2(a) for a in si_draws]
    scal = jnp.stack([
        ctx.bore_alt, ctx.bore_az, ctx.j00, ctx.j01, ctx.j10, ctx.j11,
        ctx.crot, ctx.srot, ctx.k1_ref, ctx.k2_ref, ctx.det_cx_mm,
        ctx.det_cy_mm, ctx.det_crot, ctx.det_srot,
        jnp.float32(0.0), jnp.float32(0.0)]).astype(
            jnp.float32).reshape(1, 16)
    surf = _surf_matrix(tel)
    statics = (float(ctx.latitude), float(ctx.pressure_kpa),
               float(ctx.temperature_k), float(ctx.h2o_kpa),
               int(ctx.det_nx), int(ctx.det_ny))

    grid = (rows // _ROWS,)
    blk = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    n_in = len(ins)
    n_out = 5 if silicon_statics is None else 3
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * n_out
    fn = pl.pallas_call(
        functools.partial(
            _kernel, kinds=tuple(tel.kinds), n_coef=surf.shape[1] - 16,
            statics=statics, apply_dcr=apply_dcr,
            apply_diffr=apply_diffraction, field_rotation=field_rotation,
            silicon_statics=silicon_statics),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * n_in,
        out_specs=[blk] * n_out,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2500 * np_, bytes_accessed=(n_in + n_out) * 4 * np_,
            transcendentals=25 * np_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    outs = fn(scal, surf, *ins)
    outs = tuple(o.reshape(np_)[:n] for o in outs)
    if silicon_statics is not None:
        z = jnp.zeros((n,), jnp.float32)
        return outs[0], outs[1], z, z, outs[2]
    return outs


def size_ok(n: int) -> bool:
    """Worth dispatching: pallas_call fixed overhead is amortized for
    pooled-batch sizes; tiny stamp traces stay on the XLA path."""
    return n >= (1 << 18)
