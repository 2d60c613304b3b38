"""Silicon sensor physics: conversion depth, diffusion, tree rings,
brighter-fatter — the TPU-native replacement for GalSim's SiliconSensor
(Silicon.cpp) that the reference drives at imsim/stamp.py:562-572 and
imsim/photon_pooling.py:195-225.

Model (physics-equivalent, vector-friendly):

1. Conversion depth: z ~ Exp(l_abs(lambda)), l_abs from the published
   silicon absorption curve; photons converting deeper than the device
   thickness are lost (NIR transparency).
2. Lateral travel: (dxdz, dydz) slopes (after silicon_refraction) times z.
3. Diffusion: sigma_d = D_f * sqrt(z_drift / thickness) — charge generated
   at depth z drifts (thickness - z) to the collection plane at the BOTTOM?
   No: LSST CCDs are back-illuminated; photons enter the back (z=0) and
   charge drifts the *remaining* thickness to the channel; sigma grows
   with drift distance.
4. Tree rings: radial displacement of the effective photon position from
   the per-detector oscillatory profile (imsim/treerings.py:31-48).
5. Brighter-fatter: accumulated charge Q distorts drift lines.  Instead
   of polygonal pixel-boundary bookkeeping (Silicon.cpp), we use the
   equivalent field formulation: photons are displaced by
       dx_bf = -alpha * d/dx (K * Q),
   a convolution of the accumulated image with a short-range kernel K
   (the longitudinal-dipole Green's function integrated over drift).  The
   displacement field is recomputed every `nrecalc` photons — exactly the
   resume/recalc cadence of photon pooling (imsim/photon_pooling.py:159).

All stages are pure jnp ops (convs on the MXU, gathers on the VPU); the
scatter-add goes through the same binning path as the simple sensor.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..photons.batch import PhotonBatch
from ..utils.lookup import UniformTable
from .simple import accumulate


# --- absorption length of silicon (microns), 250-1100 nm ------------------
# log10(l_abs/um) piecewise-linear fit to published Si data (Green 2008).
_ABS_WAVE = np.array([250, 300, 350, 400, 450, 500, 550, 600, 650, 700,
                      750, 800, 850, 900, 950, 1000, 1050, 1100], float)
_ABS_LEN_UM = np.array([0.006, 0.006, 0.01, 0.1, 0.4, 0.9, 1.7, 2.9, 4.5,
                        6.9, 10.5, 15.0, 23.0, 37.0, 62.0, 120.0, 400.0,
                        2000.0], float)


# Domain of the absorption lookup table; shared with the profiling
# harness (benchmarks/profile_stages.py) so both always index the same
# table layout.
ABS_TABLE_MIN_NM = 250.0
ABS_TABLE_MAX_NM = 1100.0


def absorption_length_table():
    grid = np.linspace(ABS_TABLE_MIN_NM, ABS_TABLE_MAX_NM, 256)
    vals = 10 ** np.interp(grid, _ABS_WAVE, np.log10(_ABS_LEN_UM))
    return UniformTable(ABS_TABLE_MIN_NM, grid[1] - grid[0],
                        vals.astype(np.float32))


_ABS_CHEB = None


def absorption_length_poly(wavelength_nm):
    """Gather-free absorption length: 10**Cheb(log10 l_abs) fit over
    [300, 1100] nm — silicon absorption is object-independent and
    smooth in log space, so ~30 fma replace the per-photon table
    gather (~9 ns/photon on v5e).  Agreement with the table is ~2%
    (at the piecewise-linear kinks), inside the data's own uncertainty;
    bounded in tests/test_silicon.py."""
    global _ABS_CHEB
    if _ABS_CHEB is None:
        # fit the smooth region only: below ~430 nm l_abs < 0.3 um,
        # i.e. conversion is at the surface regardless (z/thickness
        # < 0.3%), so the clamp-at-edge behavior there is harmless
        w = np.linspace(430.0, 1100.0, 512)
        y = np.interp(w, _ABS_WAVE, np.log10(_ABS_LEN_UM))
        x = 2.0 * (w - 430.0) / 670.0 - 1.0
        # keep the cache as NUMPY: a jnp array created under an active
        # trace would leak a tracer into later jit scopes
        _ABS_CHEB = np.polynomial.chebyshev.chebfit(
            x, y, 28).astype(np.float32)
    c = _ABS_CHEB
    x = jnp.clip(2.0 * (wavelength_nm - 430.0) / 670.0 - 1.0, -1.0, 1.0)
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for k in range(c.shape[0] - 1, 0, -1):
        b1, b2 = c[k] + 2.0 * x * b1 - b2, b1
    return 10.0 ** (c[0] + x * b1 - b2)


def default_bf_kernel(radius=4, strength=0.4):
    """Short-range BF interaction kernel K (unitless), radius in pixels.

    The displacement potential is phi = K * Q; K falls off ~ 1/r as the
    transverse field of a charge column seen over one drift length, with
    a finite core.  The default `strength` is calibrated against the
    measured LSST BF scale: a point source near full well (~5e5 e- in a
    sigma = 1.5 px spot) grows its sigma by ~2.5% (see
    tests/test_brighter_fatter.py)."""
    r = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(r, r)
    rr = np.hypot(X, Y)
    K = strength / np.sqrt(rr**2 + 0.8**2)
    return (K / 1e5).astype(np.float32)  # per-electron scale


@lru_cache(maxsize=8)
def vendor_bf_kernel(vendor: str, strength: float = 0.4,
                     radius: int = 4) -> np.ndarray:
    """Measured per-vendor BF kernel: the SHAPE (incl. the channel-stop
    x/y anisotropy — the x first-neighbor coupling is ~1.4x the y one)
    comes from the committed 9x9 kernels derived from the reference's
    GalSim Poisson-solver vertex files (imsim_tpu/data/
    bf_kernel_{itl,e2v}.npy, produced by
    sensor_model.bf_kernel_from_model on the reference's
    lsst_{itl,e2v}_50_32.dat); the AMPLITUDE is rescaled so the
    central-pixel area response (the discrete laplacian at the core,
    which sets the PTC a00) matches the calibrated isotropic default at
    the same `strength` — default runs gain the measured anisotropy
    without moving the PTC calibration
    (tests/test_bf_quantitative.py).  Falls back to the isotropic
    kernel for unknown vendors.  `strength` remains the config scale
    knob (image.sensor.strength)."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data",
        f"bf_kernel_{str(vendor).lower()}.npy")
    iso = default_bf_kernel(radius=radius, strength=strength)
    if not os.path.isfile(path):
        return iso
    K = np.load(path).astype(np.float32)
    if K.shape != iso.shape:
        return iso
    c = radius

    def lap(M):
        return float(M[c, c + 1] + M[c, c - 1] + M[c + 1, c]
                     + M[c - 1, c] - 4.0 * M[c, c])

    return (K * (lap(iso) / lap(K))).astype(np.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SiliconParams:
    thickness_um: float = 100.0
    pixel_um: float = 10.0
    diffusion_um: float = 4.0       # sigma at full drift
    abs_y: jax.Array = None         # absorption-length table values
    bf_kernel: jax.Array = None     # (2R+1, 2R+1)
    # (2,) pixels — a LEAF (not aux) so per-CCD SiliconParams stack
    # along a mesh 'ccd' axis (parallel/visit.py run_visit_mesh)
    treering_center: jax.Array = None
    treering_y: jax.Array = None    # radial displacement profile (pixels)
    treering_rmax: float = 8000.0
    # analytic tree-ring parameters (gather-free eval: the 40-sinusoid
    # sum costs ~free VPU flops vs ~8.6 ns/photon for the table gather);
    # waves: (nfreq, 3) rows of (2*pi/period, phase, amplitude),
    # tr_env: (3,) array (a, b, norm) of  norm * wave(r) * (a + b r^4)
    tr_waves: jax.Array = None
    tr_env: jax.Array = None
    # static (aux) flag: marks a non-trivial tree-ring profile (lets
    # callers skip the static-field work entirely).  NOTE: aux data must
    # be identical across detectors for parallel.visit.stack_pytrees,
    # so only all-or-nothing metadata lives here — per-detector values
    # (e.g. the coarse-grid stride) are derived in tree_ring_field.
    tr_active: bool = False

    def tree_flatten(self):
        return ((self.abs_y, self.bf_kernel, self.treering_center,
                 self.treering_y, self.tr_waves, self.tr_env),
                (self.thickness_um, self.pixel_um, self.diffusion_um,
                 self.treering_rmax, self.tr_active))

    @classmethod
    def tree_unflatten(cls, aux, children):
        abs_y, bf_kernel, trc, treering_y, tr_waves, tre = children
        th, px, diff, trr, tra = aux
        return cls(th, px, diff, abs_y, bf_kernel, trc, treering_y, trr,
                   tr_waves, tre, tra)

    @classmethod
    def make(cls, treering_center=(-1000.0, -1000.0), treering_profile=None,
             thickness_um=100.0, diffusion_um=4.0, bf_strength=0.4,
             treering_model=None):
        abs_t = absorption_length_table()
        tr_waves = None
        tr_env = None
        if treering_model is not None:
            treering_center = treering_model.center
            treering_profile = treering_model.profile
            tr_waves = jnp.asarray(treering_model.waves, jnp.float32)
            tr_env = jnp.asarray([float(v) for v in treering_model.env],
                                 jnp.float32)
        tr = treering_profile if treering_profile is not None \
            else np.zeros(2048, np.float32)
        tr_active = bool(np.any(np.asarray(tr) != 0.0)) or tr_waves is not None
        return cls(
            thickness_um=thickness_um,
            diffusion_um=diffusion_um,
            abs_y=jnp.asarray(abs_t.y),
            bf_kernel=jnp.asarray(default_bf_kernel(strength=bf_strength)),
            treering_center=jnp.asarray(
                [float(v) for v in treering_center], jnp.float32),
            treering_y=jnp.asarray(tr),
            tr_waves=tr_waves,
            tr_env=tr_env,
            tr_active=tr_active,
        )


def _table_lookup(y, x0, dx, x):
    """Linear interp via one paired row-gather (gathers are the TPU
    bottleneck; see utils.lookup.UniformTable)."""
    n = y.shape[0]
    f = jnp.clip((x - x0) / dx, 0.0, n - 1.000001)
    i = jnp.floor(f).astype(jnp.int32)
    w = f - i
    y2 = jnp.stack([y[:-1], y[1:]], axis=-1)
    g = y2[i]
    return g[..., 0] * (1 - w) + g[..., 1] * w


def _treering_dr(r, params: SiliconParams):
    """Radial tree-ring displacement dr(r): analytic sinusoid sum when
    wave parameters exist, table lookup otherwise."""
    if params.tr_waves is not None:
        a_env, b_env, norm = params.tr_env
        wave = jnp.zeros_like(r)
        for k in range(params.tr_waves.shape[0]):
            wave = wave + params.tr_waves[k, 2] * jnp.sin(
                params.tr_waves[k, 0] * r + params.tr_waves[k, 1])
        return norm * wave * (a_env + b_env * r ** 4)
    return _table_lookup(params.treering_y, 0.0,
                         params.treering_rmax
                         / (params.treering_y.shape[0] - 1), r)


def tree_ring_step(params: SiliconParams) -> int:
    """Coarse-grid stride for tree_ring_field: >= 16 samples per
    shortest sinusoid period (linear-interp error of sin with spacing h
    is (omega h)^2/8 < 1.2% of that component there); table-only
    profiles fall back to stride 1 (content unknown).  Derived here —
    NOT stored in SiliconParams — because it is per-detector while
    pytree aux data must match across stacked per-CCD params."""
    if params.tr_waves is None or not params.tr_waves.shape[0]:
        return 1
    min_period = float(2.0 * np.pi / np.max(np.asarray(
        params.tr_waves)[:, 0]))
    return max(1, min(8, int(min_period / 16.0)))


def tree_ring_field(params: SiliconParams, shape, step: int | None = None):
    """Static tree-ring displacement field (dx, dy) at pixel centers.

    Tree rings are a FIXED property of the detector (the doping pattern
    frozen into the boule), so unlike the charge-dependent BF field this
    can be evaluated once per CCD per visit and then folded into the
    same continuity-form redistribution pass as BF (bf_redistribute) —
    displacements are ~0.01-0.1 px, squarely in the first-order-valid
    regime.  This removes the per-photon 40-sinusoid evaluation
    (~60 ms per 16.7M-photon batch on v5e) from the hot loop.

    Evaluated on a coarse grid with the given stride (default: derived
    by tree_ring_step from the concrete wave params — call outside jit)
    and bilinearly upsampled; stride 1 degenerates to direct
    evaluation.  Reference physics: imsim/treerings.py:31-48 (radial
    displacement toward/away from the ring center), consumed by
    GalSim's SiliconSensor treering args."""
    if step is None:
        step = tree_ring_step(params)
    return _tree_ring_field_jit(params, shape, step)


@partial(jax.jit, static_argnames=("shape", "step"))
def _tree_ring_field_jit(params: SiliconParams, shape, step: int):
    H, W = shape
    cx, cy = params.treering_center
    if step <= 1:
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        rx = xs[None, :] - cx
        ry = ys[:, None] - cy
        r = jnp.maximum(jnp.sqrt(rx * rx + ry * ry), 1e-6)
        dr = _treering_dr(r, params)
        return dr * rx / r, dr * ry / r
    gh = (H - 1) // step + 2
    gw = (W - 1) // step + 2
    xs = jnp.arange(gw, dtype=jnp.float32) * step
    ys = jnp.arange(gh, dtype=jnp.float32) * step
    rx = xs[None, :] - cx
    ry = ys[:, None] - cy
    r = jnp.maximum(jnp.sqrt(rx * rx + ry * ry), 1e-6)
    dr = _treering_dr(r, params)
    fx = dr * rx / r
    fy = dr * ry / r

    def up(g, n, axis):
        # bilinear upsample along one axis: fine index k reads coarse
        # slots floor(k/step), floor(k/step)+1 (contiguous row gathers)
        f = jnp.arange(n, dtype=jnp.float32) / step
        i0 = jnp.floor(f).astype(jnp.int32)
        w = f - i0
        g0 = jnp.take(g, i0, axis=axis)
        g1 = jnp.take(g, i0 + 1, axis=axis)
        wshape = [1, 1]
        wshape[axis] = n
        w = w.reshape(wshape)
        return g0 * (1.0 - w) + g1 * w

    fx = up(up(fx, W, 1), H, 0)
    fy = up(up(fy, W, 1), H, 0)
    return fx, fy


def displacement_field(image, params: SiliconParams):
    """BF displacement field from accumulated charge: conv of Q with the
    *gradient* of the interaction kernel.

    TPU note: a 1-channel NHWC conv gets its channel dim padded to the
    128-lane register width by XLA — a 9x9 SAME conv on a 4k x 4k image
    tried to allocate ~8 GB of HBM temp.  On the TPU backend this runs
    as the Pallas row-tiled VMEM stencil (ops/stencil.py: both outputs
    share every input tap, one HBM read + two writes; ~10x the XLA
    shifted-slice formulation).  Elsewhere the small-kernel conv is
    unrolled into shifted-slice adds over one padded copy (pure VPU
    elementwise, fuses into a single pass, zero temp beyond the pad).

    The TPU/other split is jax.lax.platform_dependent — resolved at
    LOWERING time per target platform, so the same traced program is
    correct under jit, shard_map, and virtual CPU meshes (in this
    dev environment `jax.default_backend()` reports the tunnel TPU
    even when the computation is placed on forced-CPU devices, so a
    trace-time backend probe picks the wrong branch)."""
    K = params.bf_kernel  # (2R+1, 2R+1)
    k = K.shape[0]
    R = k // 2
    # d(phi)/dx as a conv kernel: central difference of K along x/y
    Kp = jnp.pad(K, 1)
    dKx = 0.5 * (Kp[1:-1, 2:] - Kp[1:-1, :-2])   # (k, k) + support 1 wider
    dKy = 0.5 * (Kp[2:, 1:-1] - Kp[:-2, 1:-1])
    from ..ops import stencil
    if stencil.size_ok(image):
        packed = jax.lax.platform_dependent(
            image, dKx, dKy,
            tpu=lambda im, kx, ky: jnp.stack(
                stencil.stencil_pair(im, kx, ky)),
            default=lambda im, kx, ky: jnp.stack(
                _displacement_slices(im, kx, ky)))
        return packed[0], packed[1]
    return _displacement_slices(image, dKx, dKy)


def _displacement_slices(image, dKx, dKy):
    """Shifted-slice formulation of the two-tap-set correlation (the
    non-TPU branch of displacement_field)."""
    k = dKx.shape[0]
    R = k // 2
    H, W = image.shape
    pad = R + 1
    P = jnp.pad(image, pad)
    dx = jnp.zeros_like(image)
    dy = jnp.zeros_like(image)
    for i in range(k):
        for j in range(k):
            # cross-correlation: out(y,x) += dK(i,j) * in(y+i-R, x+j-R);
            # for correlation with the kernel *gradient* this directly
            # yields -d(phi)/dx (check: K = delta -> dx = -dQ/dx)
            sl = jax.lax.dynamic_slice(P, (pad + i - R, pad + j - R),
                                       (H, W))
            dx = dx + dKx[i, j] * sl
            dy = dy + dKy[i, j] * sl
    return dx, dy


def depth_diffusion_displace(u, g1, g2, x, y, dxdz, dydz, flux, labs,
                             thickness_um, pixel_um, diffusion_um):
    """Pure per-photon depth + lateral-travel + diffusion displacement
    (the image-independent part of apply_silicon_displacements, with
    the randoms PASSED IN): conversion depth z = -labs*ln(u) truncated
    at the device thickness (deeper photons are lost), lateral travel
    along the refracted slopes over z, Gaussian diffusion over the
    remaining drift.  Shared verbatim by the XLA composition and the
    fused Pallas ray-chain kernel (ops/raychain.py) so both platforms
    are bit-comparable given the same draws.  Returns (x, y, flux)."""
    z = -labs * jnp.log(u)
    alive = z < thickness_um
    flux = jnp.where(alive, flux, 0.0)
    z = jnp.minimum(z, thickness_um)
    x = x + dxdz * z / pixel_um
    y = y + dydz * z / pixel_um
    drift = jnp.maximum(thickness_um - z, 0.0)
    sigma = diffusion_um * jnp.sqrt(drift / thickness_um) / pixel_um
    return x + sigma * g1, y + sigma * g2, flux


def apply_silicon_displacements(key, photons: PhotonBatch,
                                params: SiliconParams,
                                disp_x=None, disp_y=None,
                                treerings: bool = True) -> PhotonBatch:
    """Conversion depth + lateral travel + diffusion + tree rings + BF.

    treerings=False skips the per-photon tree-ring displacement (used
    when the caller folds the static tree_ring_field into the
    continuity-form image update instead)."""
    n = photons.n
    k_z, k_d = jax.random.split(key)

    # conversion depth (um), truncated at device thickness; photons that
    # would convert deeper are lost (flux -> 0).  The absorption length
    # rides along with the photon when the producer pre-fetched it in
    # the fused wavelength gather; else one table lookup here.
    if photons.abs_len is not None:
        labs = photons.abs_len
    else:
        labs = _table_lookup(params.abs_y, 250.0,
                             (1100.0 - 250.0) / (params.abs_y.shape[0] - 1),
                             photons.wavelength)
    u = jax.random.uniform(k_z, (n,), minval=1e-7, maxval=1.0)
    z = -labs * jnp.log(u)
    alive = z < params.thickness_um
    flux = jnp.where(alive, photons.flux, 0.0)
    z = jnp.minimum(z, params.thickness_um)

    px = params.pixel_um
    # lateral travel along refracted slopes over conversion depth
    x = photons.x + photons.dxdz * z / px
    y = photons.y + photons.dydz * z / px

    # diffusion over remaining drift (thickness - z)
    drift = jnp.maximum(params.thickness_um - z, 0.0)
    sigma = params.diffusion_um * jnp.sqrt(drift / params.thickness_um) / px
    g = jax.random.normal(k_d, (n, 2))
    x = x + sigma * g[:, 0]
    y = y + sigma * g[:, 1]

    # tree rings: radial displacement profile around the ring center.
    # Analytic (40-sinusoid) evaluation when wave parameters are
    # available — pure VPU transcendentals; table gather otherwise.
    if not treerings:
        pass
    elif params.tr_waves is not None:
        cx, cy = params.treering_center
        rx = x - cx
        ry = y - cy
        r = jnp.maximum(jnp.hypot(rx, ry), 1e-6)
        a_env, b_env, norm = params.tr_env
        wave = jnp.zeros_like(r)
        for k in range(params.tr_waves.shape[0]):
            wave = wave + params.tr_waves[k, 2] * jnp.sin(
                params.tr_waves[k, 0] * r + params.tr_waves[k, 1])
        dr = norm * wave * (a_env + b_env * r ** 4)
        x = x + dr * rx / r
        y = y + dr * ry / r
    elif params.treering_y is not None:
        cx, cy = params.treering_center
        rx = x - cx
        ry = y - cy
        r = jnp.maximum(jnp.hypot(rx, ry), 1e-6)
        dr = _table_lookup(params.treering_y, 0.0,
                           params.treering_rmax
                           / (params.treering_y.shape[0] - 1), r)
        x = x + dr * rx / r
        y = y + dr * ry / r

    # brighter-fatter displacement sampled at the (pre-BF) pixel
    # position; disp is packed (H, W, 2) so one row-gather fetches both
    # components
    if disp_x is not None:
        disp = disp_x if disp_y is None else jnp.stack(
            [disp_x, disp_y], axis=-1)
        H, W = disp.shape[:2]
        ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        g = disp.reshape(-1, 2)[iy * W + ix]
        x = x + g[:, 0]
        y = y + g[:, 1]

    return photons.replace(x=x, y=y, flux=flux)


def bf_redistribute(chunk_img, dx, dy):
    """First-order continuity update for the BF displacement field:
    newly collected charge Q moving by d(x) changes the pixelized
    density by -div(Q d).  Central-difference divergence form is
    charge-conserving.  Valid because BF displacements are << 1 px
    (0.01-0.1 px near full well); replaces the per-photon displacement
    gather (~85 ms per 16.7M-photon batch on v5e) with three
    elementwise passes over the frame (~2 ms)."""
    fx = chunk_img * dx
    fy = chunk_img * dy
    div = (0.5 * (jnp.roll(fx, -1, 1) - jnp.roll(fx, 1, 1))
           + 0.5 * (jnp.roll(fy, -1, 0) - jnp.roll(fy, 1, 0)))
    return chunk_img - div


@partial(jax.jit, static_argnames=("nsub", "bf_mode", "pre_displaced"))
def accumulate_silicon(key, photons: PhotonBatch, image, params: SiliconParams,
                       nsub: int = 4, bf_mode: str = "image",
                       tr_field=None, pre_displaced: bool = False):
    """Accumulate a pooled batch through the silicon model, recomputing the
    BF displacement field every batch/nsub photons (the nrecalc cadence,
    imsim/photon_pooling.py:159,195-225).

    bf_mode: 'image' (default) bins the chunk then applies the BF
    displacement as the charge-conserving continuity update
    (bf_redistribute) — identical to first order in |d| and measured
    equivalent on PTC/spot-growth observables (tests);
    'photon' displaces every photon through a gather of the packed
    field before binning (the round-1 formulation, kept for
    cross-validation).

    tr_field: optional precomputed (dx, dy) static tree-ring field
    (tree_ring_field).  In 'image' mode it is folded into the same
    continuity update as BF and the per-photon tree-ring evaluation is
    skipped — compute it ONCE per CCD/visit and pass it to every batch.
    Ignored in 'photon' mode.

    pre_displaced=True: the producer already applied the per-photon
    depth/diffusion displacement (shoot_full(silicon=...) fuses it into
    the Pallas ray-chain kernel on TPU) — each chunk just bins and gets
    the BF/tree-ring continuity update.  'image' mode only."""
    if pre_displaced and bf_mode == "photon":
        raise ValueError("pre_displaced requires bf_mode='image'")
    n = photons.n
    chunk = n // nsub
    fold_tr = tr_field is not None and bf_mode != "photon"

    def body(carry, i):
        img, key = carry
        key, sub = jax.random.split(key)
        dx, dy = displacement_field(img, params)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        ph = jax.tree.map(sl, photons)
        if bf_mode == "photon":
            ph = apply_silicon_displacements(sub, ph, params, dx, dy)
            img = accumulate(ph, img)
        else:
            if not pre_displaced:
                ph = apply_silicon_displacements(sub, ph, params, None,
                                                 None,
                                                 treerings=not fold_tr)
            chunk_img = accumulate(ph, jnp.zeros_like(img))
            if fold_tr:
                dx = dx + tr_field[0]
                dy = dy + tr_field[1]
            img = img + bf_redistribute(chunk_img, dx, dy)
        return (img, key), None

    (image, _), _ = jax.lax.scan(body, (image, key), jnp.arange(nsub))
    return image
