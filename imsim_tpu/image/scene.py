"""Scene assembly: host-side conversion of an ObjectTable into device arrays.

This is the TPU replacement for the reference's per-object stamp loop
(imsim/lsst_image.py:340-389 + imsim/stamp.py): instead of building one
GSObject per object, the whole catalog becomes a struct of flat arrays,
photons are pooled across objects into fixed-size mega-batches
(imsim/photon_pooling.py design), and all sampling happens on device.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..catalog import instcat as ic
from ..catalog.bandpass import Bandpass
from ..catalog.sed import SED, build_object_sed

WL_CDF_K = 96   # inverse-CDF table size for photon wavelength sampling
WL_CHEB_D = 14  # Chebyshev degree+1 of the gather-free wl(u) sampler
CLOUD_K = 1024  # point-cloud size for FITS-postage-stamp objects

_WL_CHEB_PINV = {}


def fit_wl_cheb(wl_icdf: np.ndarray, d: int = WL_CHEB_D) -> np.ndarray:
    """Least-squares Chebyshev coefficients of each row's inverse CDF
    wl(u) over u in [0, 1]: (n, K) -> (n, d) float32.

    The expansion variable is x = (2/pi) asin(2u - 1): the arcsin
    stretch clusters resolution at the CDF endpoints where the inverse
    CDF has sqrt-edge behavior (band cutoffs) — measured max fit error
    0.02 nm at d=14 vs 2.6 nm for plain x = 2u-1 on realistic
    SED x bandpass shapes (tests/test_sed.py).

    One (n, K) @ (K, d) matmul fits the whole catalog; the pooled hot
    path evaluates the fit per photon with Clenshaw on materialized
    coefficient rows instead of gathering the (n, K) table."""
    K = wl_icdf.shape[1]
    key = (K, d)
    if key not in _WL_CHEB_PINV:
        u = np.linspace(0.0, 1.0, K)
        x = np.arcsin(np.clip(2.0 * u - 1.0, -1.0, 1.0)) * (2.0 / np.pi)
        T = np.polynomial.chebyshev.chebvander(x, d - 1)   # (K, d)
        _WL_CHEB_PINV[key] = np.linalg.pinv(T).T           # (K, d)
    return (wl_icdf @ _WL_CHEB_PINV[key]).astype(np.float32)


# Column layout of the packed per-object parameter matrix.  Packing all
# scalars into one row per object makes the per-photon parameter fetch a
# single row-gather — measured 45x faster on TPU than separate 1D gathers.
COL_X, COL_Y, COL_TYPE, COL_P0, COL_P1, COL_P2, COL_P3, COL_G1, COL_G2, \
    COL_MU = range(10)
N_COLS = 10


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DeviceScene:
    """Per-object arrays on device, padded to a static size n_pad.

    params: (n, N_COLS) float32 packed per-object scalars (see COL_*;
    obj_type codes follow catalog.instcat; p0..p3 as documented there).
    wl_icdf[(i, k)] is the inverse CDF of the object's photon wavelength
    distribution (SED x bandpass) at u = k/(K-1).
    aux_cloud: (M, CLOUD_K, 2) arcsec offsets for FITS-postage-stamp
    objects (each pre-scaled/rotated point cloud sampled from the image
    pixels; COL_P2 of a FITSIMAGE row is its cloud index).
    """

    params: jax.Array     # (n, N_COLS) float32
    wl_icdf: jax.Array    # (n, K)
    aux_cloud: jax.Array  # (M, CLOUD_K, 2)
    # silicon absorption length [um] at wl_icdf[(i, k)] — carried next
    # to the wavelength table so the photon's conversion-depth scale is
    # fetched by the SAME row-gather (gathers cost per row, width free)
    labs_icdf: jax.Array = None
    # Chebyshev fit of the inverse CDF wl(u), x = 2u-1: (n, WL_CHEB_D).
    # The pooled path materializes these next to params (scatter+cumsum,
    # photon_pooling.materialize_rows) so per-photon wavelength sampling
    # is a Horner evaluation instead of a ~13 ns random gather — the
    # gather was ~210 ms of a 16.7M-photon batch on v5e.  None disables
    # (fallback: exact piecewise-linear table gather).
    wl_cheb: jax.Array = None

    def tree_flatten(self):
        return (self.params, self.wl_icdf, self.aux_cloud,
                self.labs_icdf, self.wl_cheb), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self):
        return self.params.shape[0]

    # host-side conveniences
    @property
    def x(self):
        return self.params[:, COL_X]

    @property
    def y(self):
        return self.params[:, COL_Y]

    @property
    def obj_type(self):
        return self.params[:, COL_TYPE].astype(jnp.int32)

    @classmethod
    def from_columns(cls, x, y, obj_type, p0, p1, p2, p3, g1, g2, mu,
                     wl_icdf, aux_cloud=None):
        from ..sensor.silicon import absorption_length_table

        cols = [x, y, obj_type, p0, p1, p2, p3, g1, g2, mu]
        params = jnp.stack([jnp.asarray(c, jnp.float32) for c in cols],
                           axis=1)
        if aux_cloud is None:
            aux_cloud = np.zeros((1, CLOUD_K, 2), np.float32)
        abs_t = absorption_length_table()
        labs = np.interp(np.asarray(wl_icdf, float),
                         abs_t.x0 + np.arange(len(abs_t.y)) * abs_t.dx,
                         np.asarray(abs_t.y, float)).astype(np.float32)
        return cls(params=params, wl_icdf=jnp.asarray(wl_icdf),
                   aux_cloud=jnp.asarray(aux_cloud, jnp.float32),
                   labs_icdf=jnp.asarray(labs),
                   wl_cheb=jnp.asarray(fit_wl_cheb(
                       np.asarray(wl_icdf, np.float64))))


@dataclasses.dataclass
class SceneHost:
    """Host-side companion: photon budgeting & batching metadata.

    pix_x/pix_y are the objects' PIXEL positions, kept separately from
    the device scene because the optics path overwrites COL_X/COL_Y
    with field angles (config/runner.py) — the FFT stamp placer needs
    pixels regardless of which path runs.
    """

    scene: DeviceScene
    flux: np.ndarray          # (n,) realized photon counts (Poisson)
    nominal_flux: np.ndarray  # (n,) expectation values
    n_objects: int
    pix_x: np.ndarray | None = None  # (n_objects,) pixel coords
    pix_y: np.ndarray | None = None


def _wavelength_icdf(sed: SED, bp: Bandpass, k: int = WL_CDF_K) -> np.ndarray:
    """Inverse CDF of the photon wavelength pdf = sed x throughput."""
    w = bp.wave
    p = np.clip(sed.resample(w) * bp.throughput, 0.0, None)
    if p.sum() <= 0:
        return np.full(k, bp.effective_wavelength)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (p[1:] + p[:-1])
                                           * np.diff(w))])
    cdf /= cdf[-1]
    u = np.linspace(0, 1, k)
    eps = np.arange(len(cdf)) * 1e-14
    return np.interp(u, cdf + eps, w)


def _fits_point_cloud(path: str, pixel_scale_as: float, theta_rad: float,
                      rng: np.random.Generator) -> np.ndarray:
    """(CLOUD_K, 2) arcsec offsets sampled proportionally to the FITS
    image's pixel fluxes, with sub-pixel jitter and the catalog's
    pixel scale + rotation baked in (the InterpolatedImage-equivalent
    photon-shooting representation for instcat 'name.fits' objects,
    imsim/instcat.py:467-576)."""
    from ..io.fits import read_fits

    hdr, data = read_fits(path)[0]
    img = np.clip(np.asarray(data, np.float64), 0.0, None)
    ny, nx = img.shape
    p = img.ravel() / img.sum()
    idx = rng.choice(p.size, size=CLOUD_K, p=p)
    iy, ix = np.divmod(idx, nx)
    x = ix - (nx - 1) / 2 + rng.uniform(-0.5, 0.5, CLOUD_K)
    y = iy - (ny - 1) / 2 + rng.uniform(-0.5, 0.5, CLOUD_K)
    c, s = np.cos(theta_rad), np.sin(theta_rad)
    return np.stack([(c * x - s * y), (s * x + c * y)],
                    -1).astype(np.float32) * pixel_scale_as


def filter_missing_seds(table: ic.ObjectTable, sed_dirs,
                        logger=None) -> ic.ObjectTable:
    """Drop rows whose SED file can't be found in sed_dirs (inline-SED
    rows always pass).  Opt-in (`skip_missing_sed`): lets partial SED
    libraries (like the reference's tests/data/test_sed_library, which
    carries only a sample of the full rubin_sim library) render the
    objects they can instead of failing the visit."""
    import os as _os

    n = len(table)
    has_inline = len(getattr(table, "sed_obj", ())) == n
    keep = np.ones(n, bool)
    for i in range(n):
        if has_inline and table.sed_obj[i] is not None:
            continue
        name = str(table.sed_name[i])
        if not any(_os.path.isfile(_os.path.join(d, name))
                   for d in sed_dirs):
            keep[i] = False
    if logger and not keep.all():
        logger.warning("skip_missing_sed: dropped %d/%d objects with "
                       "unavailable SED files", int((~keep).sum()), n)
    return table.select(keep)


def build_scene(table: ic.ObjectTable, bp: Bandpass, sed_dirs,
                exptime: float = 30.0, pupil_area: float = ic.RUBIN_AREA,
                rng: np.random.Generator | None = None,
                pad_to: int | None = None,
                max_flux: float | None = None) -> SceneHost:
    """Assemble device arrays + photon budget from a culled ObjectTable.

    Per-object realized flux = Poisson(nominal), the reference's phot_flux
    draw (imsim/stamp.py:188-202).
    """
    rng = rng or np.random.default_rng(0)
    n = len(table)
    wl = np.empty((n, WL_CDF_K), np.float32)
    nominal = np.empty(n)
    base = ic.object_flux(table.magnorm, pupil_area, exptime)
    # Catalogs reuse a small set of SED files; cache the expensive
    # per-object spectral work on quantized (sed, z, Av, Rv) keys.  The
    # reference caches only the raw file (imsim/instcat.py:380-431) and
    # redoes redshift/extinction/integration per object — the dominant
    # ingest cost for 1e5-object catalogs.
    cache: dict = {}
    has_int = len(getattr(table, "int_av", ())) == n
    has_inline = len(getattr(table, "sed_obj", ())) == n
    for i in range(n):
        if has_inline and table.sed_obj[i] is not None:
            # pre-built observer-frame SED (skyCatalogs tophat
            # components) — already redshifted/extinguished and
            # normalized for magnorm=0
            sed = table.sed_obj[i]
            nominal[i] = base[i] * bp.photon_rate(sed.wave, sed.fphot,
                                                  1.0, 1.0)
            wl[i] = _wavelength_icdf(sed, bp)
            continue
        iav = float(table.int_av[i]) if has_int else 0.0
        irv = float(table.int_rv[i]) if has_int else 3.1
        key = (table.sed_name[i], round(float(table.redshift[i]), 4),
               round(float(table.mw_av[i]), 3),
               round(float(table.mw_rv[i]), 2),
               round(iav, 3), round(irv, 2))
        hit = cache.get(key)
        if hit is None:
            sed = build_object_sed(table.sed_name[i], table.redshift[i],
                                   table.mw_av[i], table.mw_rv[i],
                                   tuple(sed_dirs),
                                   int_av=iav, int_rv=irv)
            # photons/sec/cm^2 through bandpass for the magnorm=0 SED;
            # magnorm scaling + area + exptime live in `base`
            # (imsim/instcat.py:566-576 semantics).
            rate = bp.photon_rate(sed.wave, sed.fphot, 1.0, 1.0)
            hit = (rate, _wavelength_icdf(sed, bp))
            cache[key] = hit
        nominal[i] = base[i] * hit[0]
        wl[i] = hit[1]
    # lens magnification scales flux by mu (GSObject.lens semantics)
    nominal = nominal * np.abs(table.mu)
    if max_flux is not None:
        # skycat max_flux: objects brighter than the cap are skipped
        # entirely (imsim/skycat.py getObj returns None above max_flux)
        nominal = np.where(nominal > float(max_flux), 0.0, nominal)
    realized = rng.poisson(np.clip(nominal, 0, None)).astype(np.float64)

    n_pad = pad_to or max(int(2 ** np.ceil(np.log2(max(n, 1)))), 16)
    def pad(a, fill=0.0):
        out = np.full(n_pad, fill, np.float32)
        out[:n] = a
        return out

    wl_pad = np.full((n_pad, WL_CDF_K), 622.0, np.float32)
    wl_pad[:n] = wl

    # FITS-postage-stamp objects -> point clouds; COL_P2 holds the index
    p2 = np.array(table.p2, float)
    clouds = [np.zeros((CLOUD_K, 2), np.float32)]
    if len(getattr(table, "image_file", [])) == n:
        for i in np.nonzero(table.obj_type == ic.FITSIMAGE)[0]:
            clouds.append(_fits_point_cloud(
                str(table.image_file[i]), float(table.p0[i]),
                float(table.p1[i]), rng))
            p2[i] = len(clouds) - 1

    scene = DeviceScene.from_columns(
        x=pad(table.x), y=pad(table.y),
        obj_type=pad(table.obj_type),
        p0=pad(table.p0), p1=pad(np.maximum(table.p1, 0.3001)),
        p2=pad(p2, 1.0), p3=pad(table.p3),
        g1=pad(table.g1), g2=pad(table.g2), mu=pad(table.mu, 1.0),
        wl_icdf=wl_pad,
        aux_cloud=np.stack(clouds),
    )
    return SceneHost(scene=scene, flux=realized, nominal_flux=nominal,
                     n_objects=n,
                     pix_x=np.asarray(table.x, np.float64),
                     pix_y=np.asarray(table.y, np.float64))


def make_photon_batches(host: SceneHost, batch_size: int,
                        max_batches: int | None = None):
    """Yield (obj_idx int32 (batch_size,), weight) arrays: pooled photon ->
    object assignment, object-major (spatially coherent for the binning
    kernel). Remainder photons in the final batch point at a dead object
    (index n_pad-1 with zero flux share) via weight 0.

    Each photon carries flux weight 1 (electron), the photon-pooling
    convention; bright-object flux is therefore naturally spread across
    batches in proportion (cf. imsim/photon_pooling.py:279-313).
    """
    counts = host.flux.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return
    obj_of_photon = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    nb = int(np.ceil(total / batch_size))
    if max_batches is not None:
        nb = min(nb, max_batches)
    for b in range(nb):
        sl = obj_of_photon[b * batch_size:(b + 1) * batch_size]
        idx = np.full(batch_size, host.scene.n - 1, np.int32)
        w = np.zeros(batch_size, np.float32)
        idx[:len(sl)] = sl
        w[:len(sl)] = 1.0
        yield jnp.asarray(idx), jnp.asarray(w)
