"""RNG discipline for the framework.

The reference (LSSTDESC/imSim) threads GalSim Deviates seeded from a visit
seed through every builder, with special derived streams (e.g. the
atmosphere uses ``seed + 271828``, imsim/atmPSF.py:415).  Here every random
stream is a JAX threefry key derived *functionally* from a base visit seed
via ``fold_in`` with a stable purpose tag, so:

  * streams are reproducible regardless of execution order / sharding,
  * per-object / per-batch keys are cheap to derive inside jit,
  * no mutable RNG state crosses a device boundary.
"""
from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp

# Offset the reference applies for the atmosphere's private stream
# (imsim/atmPSF.py:415: ``seed = seed + 271828``).
ATM_SEED_OFFSET = 271828


def _tag_to_int(tag: str) -> int:
    """Stable 31-bit integer from a purpose string (sha256, not hash())."""
    h = hashlib.sha256(tag.encode()).digest()
    return int.from_bytes(h[:4], "little") & 0x7FFFFFFF


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream(seed_or_key, *tags) -> jax.Array:
    """Derive a named random stream.

    Parameters
    ----------
    seed_or_key : int or PRNGKey
    tags : str or int
        Purpose tags, e.g. ``stream(seed, "photon_shoot", obj_index)``.
    """
    key = (
        jax.random.PRNGKey(seed_or_key)
        if isinstance(seed_or_key, int)
        else seed_or_key
    )
    for t in tags:
        if isinstance(t, str):
            t = _tag_to_int(t)
        key = jax.random.fold_in(key, t)
    return key


def split(key, n=2):
    return jax.random.split(key, n)


def poisson_approx(key, lam):
    """Poisson sampling that stays fast for the huge means common in
    sky backgrounds: exact for small lam via jax.random.poisson, Gaussian
    approximation above 1000 (error < 0.1% of sigma there)."""
    lam = jnp.asarray(lam, jnp.float32)
    small = jax.random.poisson(key, jnp.minimum(lam, 1000.0)).astype(jnp.float32)
    gauss = lam + jnp.sqrt(jnp.maximum(lam, 1e-12)) * jax.random.normal(
        key, lam.shape, dtype=jnp.float32
    )
    return jnp.where(lam <= 1000.0, small, jnp.round(gauss))
