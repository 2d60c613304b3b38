"""Plain (non-silicon) sensor accumulation: photon scatter-add into pixels.

Equivalent of galsim.Sensor.accumulate for the ideal-sensor case (the
reference selects Sensor vs SiliconSensor at imsim/photon_pooling.py:9 and
config/imsim-config.yaml:225-236).  The silicon-physics version (brighter-
fatter, tree rings, diffusion) lives in imsim_tpu.sensor.silicon.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..photons.batch import PhotonBatch


def accumulate(photons: PhotonBatch, image: jax.Array,
               origin_x: float = 0.0, origin_y: float = 0.0) -> jax.Array:
    """Scatter photon flux into an (H, W) image.

    Photon (x, y) are pixel coordinates where integer values are pixel
    centers (GalSim convention); pixel (0,0) center is at (origin_x,
    origin_y). Out-of-bounds photons are dropped.
    """
    H, W = image.shape
    ix = jnp.round(photons.x - origin_x).astype(jnp.int32)
    iy = jnp.round(photons.y - origin_y).astype(jnp.int32)
    inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    flux = jnp.where(inb, photons.flux, 0.0).astype(image.dtype)
    # Clamp dead photons to a valid index; their flux is zero.
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    flat = jnp.ravel(image)
    flat = flat.at[iy * W + ix].add(flux, mode="drop")
    return flat.reshape(H, W)
