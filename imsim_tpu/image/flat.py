"""Flat-field generation — imsim/flat.py parity (LSST_FlatBuilder).

The reference builds flats iteratively (<=1000 counts per iteration) so
brighter-fatter feedback is tracked, either by recalculating pixel areas
or by full photon shooting with SED wavelengths (:112-282), in amp-sized
sections to bound memory.

TPU-first: the whole CCD is one device array (no section tiling needed —
a 4k x 4k f32 frame is 67 MB of HBM) and each iteration is one fused
jit: the BF pixel-area factor is the divergence of the displacement
field of the accumulated charge (the same field the silicon sensor
applies per photon), so

    counts_k ~ Poisson(lam_k * area(Q_{k-1}))

which is the reference's calculate_pixel_areas path (:220-237) executed
as two shifted-slice convolutions + elementwise sampling.  The photon
path (SED wavelength sampling through the silicon model) reuses the
pooled photon machinery with uniform positions.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..sensor.silicon import SiliconParams, displacement_field
from ..utils.rng import stream


@dataclasses.dataclass
class FlatConfig:
    counts_per_pixel: float = 80_000.0
    counts_per_iter: float = 1000.0     # BF recalc cadence (flat.py:85-90)
    xsize: int = 4096
    ysize: int = 4004
    exptime: float = 30.0


@partial(jax.jit, static_argnames=())
def _flat_iteration(key, image, lam, params: SiliconParams):
    """One iteration: pixel areas from the current BF displacement field,
    Poisson counts (Gaussian approx; lam >> 30)."""
    dx, dy = displacement_field(image, params)
    # incoming charge at x lands at x + d(x); the landed density scales
    # by 1/|det(I + grad d)| ~ 1 - div(d): charge-rich pixels (div > 0,
    # displacement pointing away) collect LESS — the BF suppression
    ddx = 0.5 * (jnp.roll(dx, -1, 1) - jnp.roll(dx, 1, 1))
    ddy = 0.5 * (jnp.roll(dy, -1, 0) - jnp.roll(dy, 1, 0))
    area = jnp.clip(1.0 - ddx - ddy, 0.2, 5.0)
    mean = lam * area
    noise = jnp.sqrt(mean) * jax.random.normal(key, image.shape)
    return image + jnp.maximum(mean + noise, 0.0)


def build_flat(seed: int, cfg: FlatConfig,
               params: SiliconParams | None = None,
               checkpointer=None, logger=None):
    """Full-CCD flat with BF-driven pixel-area evolution.  Returns the
    accumulated eimage (ny, nx) float32 electrons."""
    params = params or SiliconParams.make()
    image = jnp.zeros((cfg.ysize, cfg.xsize), jnp.float32)
    n_iter = int(np.ceil(cfg.counts_per_pixel / cfg.counts_per_iter))
    start = 0
    if checkpointer is not None:
        saved = checkpointer.load("flat")
        if saved is not None:
            image = jnp.asarray(saved["image"])
            start = saved["next_iter"]
    lam = jnp.float32(cfg.counts_per_pixel / n_iter)
    for k in range(start, n_iter):
        image = _flat_iteration(stream(seed, "flat", k), image, lam,
                                params)
        if checkpointer is not None and (k + 1) % 10 == 0:
            image.block_until_ready()
            checkpointer.save("flat", dict(image=np.asarray(image),
                                           next_iter=k + 1))
    if logger:
        logger.info("flat: %d iterations of %.0f counts", n_iter,
                    float(lam))
    return image


@partial(jax.jit, static_argnames=("n_phot", "nsub"))
def _flat_photon_iteration(key, image, wl_icdf_row, params: SiliconParams,
                           n_phot: int, nsub: int = 1, tr_field=None):
    """One photon-shooting iteration: n_phot uniform-position photons
    with SED-sampled wavelengths through the FULL silicon model
    (conversion depth, diffusion, tree rings, BF resume) — the
    reference's sed-flat branch (imsim/flat.py:239-264: uniform
    PhotonArray + WavelengthSampler + sensor.accumulate(resume))."""
    from ..photons.batch import PhotonBatch
    from ..sensor.silicon import accumulate_silicon

    H, W = image.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (n_phot,), minval=-0.5, maxval=W - 0.5)
    y = jax.random.uniform(k2, (n_phot,), minval=-0.5, maxval=H - 0.5)
    u = jax.random.uniform(k3, (n_phot,))
    K = wl_icdf_row.shape[0]
    f = jnp.clip(u, 0.0, 1.0) * (K - 1.000001)
    j = jnp.floor(f).astype(jnp.int32)
    w = f - j
    wl = wl_icdf_row[j] * (1 - w) + wl_icdf_row[j + 1] * w
    z = jnp.zeros((n_phot,), jnp.float32)
    ph = PhotonBatch(x=x, y=y, flux=jnp.ones((n_phot,), jnp.float32),
                     wavelength=wl, dxdz=z, dydz=z, pupil_u=z,
                     pupil_v=z, time=z, abs_len=None)
    return accumulate_silicon(k4, ph, image, params, nsub=nsub,
                              tr_field=tr_field)


def build_flat_photons(seed: int, cfg: FlatConfig, wl_icdf,
                       params: SiliconParams | None = None,
                       checkpointer=None, logger=None):
    """SED photon-shooting flat (imsim/flat.py sed-mode): counts build
    up by shooting wavelength-sampled photons through the silicon
    model, so conversion depth (and therefore diffusion and the BF
    coupling) carries the SED's chromatic weighting — NIR-heavy SEDs
    convert deep and lose photons, UV converts at the surface and
    diffuses most.

    wl_icdf: (K,) inverse CDF of the illumination SED x throughput
    (the WavelengthSampler equivalent — e.g. one row of
    scene.DeviceScene.wl_icdf or catalog.bandpass sampling).

    Mean level control matches the reference: counts_per_iter mean
    counts per pixel per iteration (expected, before NIR conversion
    losses), iterated to counts_per_pixel."""
    params = params or SiliconParams.make()
    image = jnp.zeros((cfg.ysize, cfg.xsize), jnp.float32)
    n_iter = int(np.ceil(cfg.counts_per_pixel / cfg.counts_per_iter))
    n_phot = int(cfg.counts_per_iter * cfg.xsize * cfg.ysize)
    # bound device memory per dispatch (the reference bounds memory by
    # amp-section tiling, flat.py:180-215; here by photon sub-batches —
    # the image itself is one 67 MB array either way)
    cap = 16_777_216
    n_sub = max(1, -(-n_phot // cap))
    per = -(-n_phot // n_sub)
    wl_row = jnp.asarray(wl_icdf, jnp.float32)
    start = 0
    if checkpointer is not None:
        saved = checkpointer.load("flat_phot")
        if saved is not None:
            image = jnp.asarray(saved["image"])
            start = saved["next_iter"]
    # static tree-ring field once for the whole flat (the flats are
    # where the ring pattern is actually measured — the continuity-form
    # fold reproduces the pixel-area modulation: div of the static
    # displacement field, to first order)
    tr_field = None
    if params.tr_active:
        from ..sensor.silicon import tree_ring_field
        tr_field = tree_ring_field(params, (cfg.ysize, cfg.xsize))
    for k in range(start, n_iter):
        for s in range(n_sub):
            image = _flat_photon_iteration(
                stream(seed, "flatphot", k * n_sub + s), image, wl_row,
                params, per, tr_field=tr_field)
        if checkpointer is not None and (k + 1) % 10 == 0:
            image.block_until_ready()
            checkpointer.save("flat_phot", dict(image=np.asarray(image),
                                                next_iter=k + 1))
    if logger:
        logger.info("photon flat: %d iterations x %d photons", n_iter,
                    n_phot)
    return image


def flat_statistics(image) -> dict:
    """Mean/variance diagnostics: the BF signature is a photon-transfer
    curve bending below the Poisson line."""
    a = np.asarray(image, np.float64)
    # avoid edges where the divergence stencil wraps
    a = a[8:-8, 8:-8]
    return dict(mean=float(a.mean()), var=float(a.var()),
                var_over_mean=float(a.var() / a.mean()))
