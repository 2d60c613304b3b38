"""Device-resident photon batches.

The reference's unit of work is galsim.PhotonArray — a mutable AoS-ish
object that photon ops modify in place (imsim/photon_ops.py:81-127,
imsim/photon_pooling.py:177-192).  The TPU-native equivalent is an
immutable SoA pytree of fixed-size jnp arrays: every "photon op" is a pure
function PhotonBatch -> PhotonBatch, the whole chain fuses under one jit,
and pooling across objects is a concatenation into one static mega-batch
(the pooled design the reference builds in photon_pooling.py).

Dead photons (culled, vignetted, off-sensor) carry flux == 0 instead of a
dynamic shape change.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PhotonBatch:
    """SoA photon bundle. All arrays shape (N,); coordinates follow the
    reference conventions:

    x, y        : image/pixel coordinates relative to stamp or image origin
    flux        : photon weight in electrons (0 == dead photon)
    wavelength  : nm
    dxdz, dydz  : direction slopes entering the silicon
    pupil_u/v   : entrance-pupil coordinates in meters
    time        : seconds since exposure start
    """

    x: jax.Array
    y: jax.Array
    flux: jax.Array
    wavelength: jax.Array
    dxdz: jax.Array
    dydz: jax.Array
    pupil_u: jax.Array
    pupil_v: jax.Array
    time: jax.Array
    # optional: silicon absorption length [um] pre-fetched alongside the
    # wavelength sample (saves the sensor a table gather); None if the
    # producer didn't compute it
    abs_len: jax.Array | None = None

    _fields = ("x", "y", "flux", "wavelength", "dxdz", "dydz",
               "pupil_u", "pupil_v", "time", "abs_len")

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def replace(self, **kw) -> "PhotonBatch":
        return dataclasses.replace(self, **kw)

    @classmethod
    def zeros(cls, n: int, dtype=jnp.float32) -> "PhotonBatch":
        z = jnp.zeros((n,), dtype)
        return cls(x=z, y=z, flux=z, wavelength=jnp.full((n,), 622.2, dtype),
                   dxdz=z, dydz=z, pupil_u=z, pupil_v=z, time=z)

    @classmethod
    def concat(cls, batches) -> "PhotonBatch":
        """Pool several batches into one device mega-batch
        (merge_photon_arrays analog, imsim/photon_pooling.py:177-192)."""
        def cat(f):
            vals = [getattr(b, f) for b in batches]
            if any(v is None for v in vals):
                return None
            return jnp.concatenate(vals)

        return cls(*(cat(f) for f in cls._fields))

    def scaled_flux(self, s) -> "PhotonBatch":
        return self.replace(flux=self.flux * s)

    def shifted(self, dx, dy) -> "PhotonBatch":
        return self.replace(x=self.x + dx, y=self.y + dy)

    def total_flux(self):
        return jnp.sum(self.flux)
