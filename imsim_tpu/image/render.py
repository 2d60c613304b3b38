"""Device-side pooled photon shooting + image assembly.

One jitted pipeline replaces the reference's per-stamp hot loop
(imsim/stamp.py draw + imsim/photon_pooling.py pooled pass):

    obj_idx (N,) -> ONE row-gather of packed object params
    -> sample intrinsic profile -> shear/magnify -> PSF kick
    -> pupil/time/wavelength sampling -> [photon ops chain]
    -> sensor accumulate

Everything is fixed-shape; dead photons ride along with weight zero.
Per-photon parameter access is a single (N, N_COLS) row-gather — measured
45x faster on TPU v5e than per-column gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..catalog.instcat import SERSIC, KNOTS, STREAK, FITSIMAGE
from ..photons import profiles as P
from ..photons.batch import PhotonBatch
from .scene import (DeviceScene, COL_X, COL_Y, COL_TYPE, COL_P0, COL_P1,
                    COL_P2, COL_P3, COL_G1, COL_G2, COL_MU)


def _interp_rows(table: jax.Array, rows: jax.Array, u: jax.Array):
    """Per-photon linear interpolation into per-object tables:
    table (n_obj, K); rows (N,) int32; u (N,) in [0,1].
    One paired row-gather (gathers cost ~8.6 ns per ROW on this TPU,
    independent of row width; pairing halves the op count)."""
    K = table.shape[1]
    pairs = jnp.stack([table[:, :-1], table[:, 1:]],
                      axis=-1).reshape(-1, 2)
    f = jnp.clip(u, 0.0, 1.0) * (K - 1.000001)
    j = jnp.floor(f).astype(jnp.int32)
    w = (f - j).astype(table.dtype)
    g = pairs[rows * (K - 1) + j]
    return g[:, 0] * (1 - w) + g[:, 1] * w


def _interp_rows2(table_a: jax.Array, table_b: jax.Array, rows: jax.Array,
                  u: jax.Array):
    """Interpolate TWO per-object tables sharing the same (row, u) index
    with ONE width-4 row-gather (row width is free; op count is the TPU
    gather cost): returns (a(u), b(u)).  Used to fetch the photon
    wavelength and its silicon absorption length together."""
    K = table_a.shape[1]
    quad = jnp.stack([table_a[:, :-1], table_a[:, 1:],
                      table_b[:, :-1], table_b[:, 1:]],
                     axis=-1).reshape(-1, 4)
    f = jnp.clip(u, 0.0, 1.0) * (K - 1.000001)
    j = jnp.floor(f).astype(jnp.int32)
    w = (f - j).astype(table_a.dtype)
    g = quad[rows * (K - 1) + j]
    return (g[:, 0] * (1 - w) + g[:, 1] * w,
            g[:, 2] * (1 - w) + g[:, 3] * w)


def _sample_sersic_flat(key, srs_n, hlr, dtype=jnp.float32):
    """Sersic radial sampling, gather-free: the 2-D Chebyshev inverse
    CDF x(u, n) (profiles.sample_sersic_poly, bulk error < 0.3% — finer
    than the old bilinear table) costs ~600 fma/photon vs a ~8.6 ns
    table gather."""
    n = srs_n.shape[0]
    ku, kt = jax.random.split(key)
    u = jax.random.uniform(ku, (n,), dtype)
    r = P.sample_sersic_poly(u, srs_n) * hlr
    theta = jax.random.uniform(kt, (n,), dtype, 0.0, 2 * jnp.pi)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def sample_intrinsic(key, row, obj_idx, pixel_scale: float = 0.2,
                     aux_cloud=None, families=None):
    """Sample profile offsets (in pixels) for a pooled photon batch.

    row: (N_COLS+, N) per-photon object parameters, photon-minor
    (photon_pooling.materialize_rows_T orientation: each parameter is
    a contiguous full-lane slice).
    aux_cloud: (M, CLOUD_K, 2) FITS-stamp point clouds (arcsec).
    families: optional static collection of the object-type codes
    PRESENT in the scene (host-known at trace time) — absent families'
    sampling branches are dropped from the compiled program (the pooled
    batch is VPU-compute-bound here; a star/Sersic-only scene skips the
    knot/streak trig + RNG entirely).  None keeps every branch.

    Computes each present family's sample and selects by object type —
    the Sersic path is the only expensive one and dominates anyway;
    points are free.  Knot positions are deterministic per (object,
    knot) so every photon batch sees the same knot constellation
    (galsim.RandomKnots semantics).
    """
    n = obj_idx.shape[0]
    has = (lambda c: True) if families is None else \
        (lambda c: c in families)
    if not (has(SERSIC) or has(KNOTS) or has(STREAK) or has(FITSIMAGE)):
        z = jnp.zeros((n,), row.dtype)           # pure star field
        return z, z
    k_srs, k_pick, k_box = jax.random.split(key, 3)

    t = row[COL_TYPE].astype(jnp.int32)
    q = row[COL_P2]
    beta = row[COL_P3]
    hlr_as = row[COL_P0]
    srs_n = row[COL_P1]

    dx = dy = jnp.zeros((n,), row.dtype)
    if has(SERSIC) or has(KNOTS):
        # --- Sersic (knots use an exponential disk: n = 1) ---------------
        srs_n_eff = jnp.where(t == KNOTS, 1.0, srs_n) if has(KNOTS) \
            else srs_n
        sx, sy = _sample_sersic_flat(k_srs, srs_n_eff, hlr_as)
        dx = jnp.where(t == SERSIC, sx, 0.0)
        dy = jnp.where(t == SERSIC, sy, 0.0)

    if has(KNOTS):
        # --- Knots: deterministic per-(obj, knot) position ---------------
        npoints = jnp.maximum(srs_n, 1.0).astype(jnp.int32)  # p1=npoints
        pick = (jax.random.uniform(k_pick, (n,))
                * npoints.astype(jnp.float32)).astype(jnp.int32)
        knot_seed = obj_idx.astype(jnp.uint32) * jnp.uint32(2654435761) \
            + pick.astype(jnp.uint32) * jnp.uint32(40503)
        u1 = (knot_seed * jnp.uint32(1664525) + jnp.uint32(1013904223))
        u2 = (u1 * jnp.uint32(1664525) + jnp.uint32(1013904223))
        fu1 = u1.astype(jnp.float32) * (1.0 / 4294967296.0)
        fu2 = u2.astype(jnp.float32) * (1.0 / 4294967296.0)
        # exponential-disk radius via the gather-free PolyCDF (random
        # gathers cost ~8.6 ns/photon on TPU; the Chebyshev eval is free)
        kr = P.exp_disk_poly()(fu1) * hlr_as
        kth = fu2 * (2 * jnp.pi)
        dx = jnp.where(t == KNOTS, kr * jnp.cos(kth), dx)
        dy = jnp.where(t == KNOTS, kr * jnp.sin(kth), dy)

    if has(STREAK):
        # --- Streak: uniform box length x width rotated by pa ------------
        ub = jax.random.uniform(k_box, (n, 2)) - 0.5
        bx0 = ub[:, 0] * row[COL_P0]
        by0 = ub[:, 1] * row[COL_P1]
        bpa = row[COL_P2]
        dx = jnp.where(t == STREAK,
                       bx0 * jnp.cos(bpa) - by0 * jnp.sin(bpa), dx)
        dy = jnp.where(t == STREAK,
                       bx0 * jnp.sin(bpa) + by0 * jnp.cos(bpa), dy)

    # --- FITS postage stamps: gather from the per-object point cloud ----
    if has(FITSIMAGE) and aux_cloud is not None and aux_cloud.shape[0] > 1:
        Kc = aux_cloud.shape[1]
        cloud_row = row[COL_P2].astype(jnp.int32)
        pick_c = (jax.random.uniform(k_pick, (n,))
                  * Kc).astype(jnp.int32) % Kc
        flat_c = aux_cloud.reshape(-1, 2)
        g = flat_c[jnp.clip(cloud_row, 0, aux_cloud.shape[0] - 1) * Kc
                   + pick_c]
        dx = jnp.where(t == FITSIMAGE, g[:, 0], dx)
        dy = jnp.where(t == FITSIMAGE, g[:, 1], dy)

    # intrinsic ellipticity (sersic/knots only; FITS clouds carry theirs)
    is_ell = (t == SERSIC) | (t == KNOTS) if has(KNOTS) else (t == SERSIC)
    ex, ey = P.apply_ellipse(dx, dy, jnp.where(is_ell, q, 1.0),
                             jnp.where(is_ell, beta, 0.0))
    # lensing applies to every extended type
    is_lensed = (is_ell | (t == FITSIMAGE)) if has(FITSIMAGE) else is_ell
    gx, gy = P.apply_shear_mag(ex, ey, row[COL_G1], row[COL_G2],
                               row[COL_MU])
    dx = jnp.where(is_lensed, gx, ex)
    dy = jnp.where(is_lensed, gy, ey)
    return dx / pixel_scale, dy / pixel_scale  # arcsec -> pixels


def shoot(key, scene: DeviceScene, obj_idx: jax.Array, weight: jax.Array,
          psf_tables: dict, exptime: float = 30.0,
          pupil_radius: float = 4.18, pupil_obscuration: float = 0.612,
          pixel_scale: float = 0.2, row: jax.Array = None,
          families=None) -> PhotonBatch:
    """Produce a fully-populated photon batch for one pooled batch.

    psf_tables: {"kolmogorov": UniformTable (arcsec), "gauss_sigma": float}
    — the analytic Kolmogorov * Gaussian PSF of the minimum slice
    (imsim/psf_utils.py:42-91 equivalent). The atmospheric-screen PSF and
    raytraced optics replace this in the full chain.
    """
    n = obj_idx.shape[0]
    keys = jax.random.split(key, 6)

    if row is None:
        # row-gather for all scalar params, then photon-minor orientation
        row = scene.params[obj_idx].T

    # intrinsic + lensing offsets
    dx, dy = sample_intrinsic(keys[0], row, obj_idx, pixel_scale,
                              aux_cloud=scene.aux_cloud,
                              families=families)

    # PSF: Kolmogorov kick + gaussian kick (arcsec -> pixels)
    kx, ky = P.sample_radial(keys[1], n, psf_tables["kolmogorov"])
    gx, gy = P.sample_gaussian(keys[2], n, psf_tables["gauss_sigma"])
    dx = dx + (kx + gx) / pixel_scale
    dy = dy + (ky + gy) / pixel_scale

    x = row[COL_X] + dx
    y = row[COL_Y] + dy

    # wavelength (+ absorption length) from per-object inverse CDF
    u = jax.random.uniform(keys[3], (n,))
    if scene.labs_icdf is not None:
        wl, labs = _interp_rows2(scene.wl_icdf, scene.labs_icdf,
                                 obj_idx, u)
    else:
        wl = _interp_rows(scene.wl_icdf, obj_idx, u)
        labs = None

    # pupil position: uniform annulus (PupilAnnulusSampler equivalent,
    # config/imsim-config.yaml photon op #3)
    u1, u2 = jax.random.uniform(keys[4], (2, n))
    r = jnp.sqrt(pupil_obscuration**2 * pupil_radius**2
                 + u1 * (1 - pupil_obscuration**2) * pupil_radius**2)
    th = u2 * 2 * jnp.pi
    pu = r * jnp.cos(th)
    pv = r * jnp.sin(th)

    # arrival time: uniform over exposure (TimeSampler equivalent)
    t = jax.random.uniform(keys[5], (n,)) * exptime

    z = jnp.zeros((n,), jnp.float32)
    return PhotonBatch(x=x, y=y, flux=weight, wavelength=wl,
                       dxdz=z, dydz=z, pupil_u=pu, pupil_v=pv, time=t,
                       abs_len=labs)


def shoot_full(key, scene: DeviceScene, obj_idx: jax.Array,
               weight: jax.Array, tel, ctx, screens=None, sk_table=None,
               exptime: float = 30.0, pupil_radius: float = 4.18,
               pupil_obscuration: float = 0.612,
               row: jax.Array = None,
               pupil_pairing: int = 1,
               screen_share: int = 1,
               chromatic_exponent: float = 0.0,
               wl_ref: float = 622.0,
               apply_dcr: bool = True,
               apply_diffraction: bool = True,
               diffraction_field_rotation: bool = True,
               silicon=None, si_key=None, families=None) -> PhotonBatch:
    """Full physics chain for a pooled batch: the per-photon equivalent of
    the reference's photon_ops pipeline (imsim/stamp.py:527-573 with
    config/imsim-config.yaml:281-320):

        object field angle (COL_X/COL_Y in *radians*, optics scene)
        + intrinsic profile offset (+ lensing)          [sample_intrinsic]
        + atmospheric first kick (phase screens)        [psf.atmosphere]
        + second kick (high-k turbulence + diffraction) [sk_table]
        + DCR + spider diffraction + raytrace + silicon refraction
                                                        [photons.optics_ops]

    With ``pupil_pairing > 1``, pupil/time sampling uses BLOCK
    ANTITHETIC PAIRING: the `pair` slots {s, s+m, ..} (m = n/pair)
    share one (pupil point, arrival time) draw and one phase-screen
    gather.  This is ONLY valid when obj_idx/row come from the pooled
    block-paired layout (photon_pooling.build_obj_map with matching
    pair): that layout puts ADJACENT global photons in those slots,
    i.e. almost always the same object, so the pair's field angles
    agree to the profile-offset scale (< 0.1 m at the highest screen
    layer).  The default is the always-correct pair=1; the pooled path
    passes its configured pairing explicitly.  With an arbitrary
    layout and pair>1, screen kicks would be evaluated at the wrong
    objects' field angles for (pair-1)/pair of the photons.  Each photon keeps its own wavelength,
    profile offset, DCR, diffraction draw and sensor randomness, so
    per-pixel statistics stay Poisson-consistent.  The block layout
    makes every pairing op FREE on TPU: member 0 is the contiguous
    slice [:m] and the broadcast back is reshape((pair, m) -> n) —
    the previous interleaved jnp.repeat cost ~200 ms per paired array
    per 16.7M-photon batch in consumer-fusion lane shuffles.

    Returns a PhotonBatch in *detector pixel* coordinates with in-silicon
    slopes, ready for the (silicon) sensor accumulate.
    """
    from ..photons.optics_ops import field_to_sensor
    from ..psf.atmosphere import first_kick_angles
    from ..sensor.silicon import absorption_length_poly
    from ..utils.lookup import clenshaw_cols
    from .scene import N_COLS

    arcsec = jnp.float32(np.pi / 180 / 3600)
    n = obj_idx.shape[0]
    keys = jax.random.split(key, 8)

    if row is None:
        # per-photon row-gather; callers on the pooled path pass the
        # gather-free materialize_rows_T result instead
        row = scene.params[obj_idx]
        if scene.wl_cheb is not None:
            row = jnp.concatenate([row, scene.wl_cheb[obj_idx]], axis=1)
        row = row.T
    thx = row[COL_X]
    thy = row[COL_Y]

    # intrinsic + lensing offsets in arcsec (pixel_scale=1 -> arcsec)
    dx_as, dy_as = sample_intrinsic(keys[0], row, obj_idx, pixel_scale=1.0,
                                    aux_cloud=scene.aux_cloud,
                                    families=families)
    thx = thx + dx_as * arcsec
    thy = thy + dy_as * arcsec

    # wavelength + silicon absorption length, gather-free when the
    # scene carries Chebyshev inverse-CDF rows (materialized into the
    # row matrix next to params); else ONE fused row-gather
    u = jax.random.uniform(keys[1], (n,))
    if scene.wl_cheb is not None and row.shape[0] > N_COLS:
        # arcsin-stretched Chebyshev variable (see scene.fit_wl_cheb)
        x_u = jnp.arcsin(2.0 * u - 1.0) * jnp.float32(2.0 / np.pi)
        wl = clenshaw_cols(row[N_COLS:], x_u)
        labs = absorption_length_poly(wl)
    elif scene.labs_icdf is not None:
        wl, labs = _interp_rows2(scene.wl_icdf, scene.labs_icdf,
                                 obj_idx, u)
    else:
        wl = _interp_rows(scene.wl_icdf, obj_idx, u)
        labs = None

    pair = pupil_pairing if n % pupil_pairing == 0 else 1
    # weak-layer screen sharing needs the matching two-level block
    # layout (photon_pooling.member_offsets); only meaningful with
    # block pairing and a divisible batch
    share = screen_share if (pair > 1 and n % (pair * screen_share) == 0) \
        else 1
    m = n // pair

    def blk(x):
        # (m,) -> (n,) block broadcast: virtual until fused, no shuffle
        return jnp.broadcast_to(x, (pair, m)).reshape(n) if pair > 1 \
            else x

    u1, u2 = jax.random.uniform(keys[2], (2, m))
    r = jnp.sqrt(pupil_obscuration**2 * pupil_radius**2
                 + u1 * (1 - pupil_obscuration**2) * pupil_radius**2)
    a = u2 * 2 * jnp.pi
    pu_h = r * jnp.cos(a)
    pv_h = r * jnp.sin(a)
    t_h = jax.random.uniform(keys[3], (m,)) * exptime

    # atmosphere: first kick (screens) + isotropic second kick
    if screens is not None:
        ddx, ddy = first_kick_angles(pu_h, pv_h, t_h, screens,
                                     theta_x=thx[:m],
                                     theta_y=thy[:m], share=share)
        if chromatic_exponent:
            # ChromaticAtmosphere scaling of the screen PSF
            # (imsim/atmPSF.py:298-318: alpha = atm_psf.exponent, -0.3
            # Kolmogorov): each photon's geometric kick scales by
            # (lambda / lambda_eff)^alpha — elementwise exp/log, free
            scale = jnp.exp(jnp.float32(chromatic_exponent)
                            * jnp.log(wl / jnp.float32(wl_ref)))
            thx = thx + blk(ddx) * scale
            thy = thy + blk(ddy) * scale
        else:
            thx = thx + blk(ddx)
            thy = thy + blk(ddy)
    pu = blk(pu_h)
    pv = blk(pv_h)
    t = blk(t_h)
    if sk_table is not None:
        skx, sky = P.sample_radial(keys[4], n, sk_table)  # arcsec
        thx = thx + skx * arcsec
        thy = thy + sky * arcsec

    # with `silicon` + `si_key`: the image-independent depth/diffusion
    # displacement fuses into the same chain (in the Pallas kernel on
    # TPU) and x/y come back FINAL; accumulate_silicon is then called
    # with pre_displaced=True (the BF/tree-ring continuity update is
    # image-space and unaffected)
    x_pix, y_pix, dxdz, dydz, flux = field_to_sensor(
        keys[5], tel, ctx, thx, thy, pu, pv, wl, t, weight,
        apply_dcr=apply_dcr, apply_diffraction=apply_diffraction,
        field_rotation=diffraction_field_rotation,
        silicon=silicon, si_key=si_key)
    return PhotonBatch(x=x_pix, y=y_pix, flux=flux, wavelength=wl,
                       dxdz=dxdz, dydz=dydz, pupil_u=pu, pupil_v=pv,
                       time=t, abs_len=labs)
