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


def flat_statistics(image) -> dict:
    """Mean/variance diagnostics: the BF signature is a photon-transfer
    curve bending below the Poisson line."""
    a = np.asarray(image, np.float64)
    # avoid edges where the divergence stencil wraps
    a = a[8:-8, 8:-8]
    return dict(mean=float(a.mean()), var=float(a.var()),
                var_over_mean=float(a.var() / a.mean()))
