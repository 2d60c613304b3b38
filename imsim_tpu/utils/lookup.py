"""Jit-friendly 1D lookup tables (GalSim LookupTable equivalent).

The reference leans on galsim.LookupTable for SEDs, bandpasses, tree-ring
profiles and radial photon-shooting CDFs.  On TPU we want a fixed-shape,
uniformly-gridded table so lookups are two gathers and a fma, vectorized
over millions of photons.  Non-uniform input grids are resampled once on
host at construction.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class UniformTable:
    """y = f(x) on a uniform grid [x0, x0 + (n-1)*dx]; linear interpolation,
    clamped at the ends."""

    x0: float
    dx: float
    y: jax.Array  # (n,)

    def __call__(self, x):
        x = jnp.asarray(x)
        y = jnp.asarray(self.y)  # no-op for jnp; safe for numpy-backed tables
        f = (x - self.x0) / self.dx
        n = y.shape[0]
        f = jnp.clip(f, 0.0, n - 1.000001)
        i = jnp.floor(f).astype(jnp.int32)
        w = (f - i).astype(y.dtype)
        # ONE row-gather of the (lo, hi) pair instead of two gathers:
        # TPU random gathers cost ~6-10 ns/element regardless of table
        # size, so halving the gather count halves the lookup cost.
        # The pair table is built in-program (cheap; tables are ~KB).
        y2 = jnp.stack([y[:-1], y[1:]], axis=-1)
        g = y2[i]
        return g[..., 0] * (1 - w) + g[..., 1] * w

    @property
    def x_max(self):
        return self.x0 + (self.y.shape[0] - 1) * self.dx

    def tree_flatten(self):
        return (self.y,), (self.x0, self.dx)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], children[0])

    @classmethod
    def from_pairs(cls, x, y, n=None, dtype=jnp.float32):
        """Resample arbitrary (x, y) samples onto a uniform grid."""
        x = np.asarray(x, float)
        y = np.asarray(y, float)
        order = np.argsort(x)
        x, y = x[order], y[order]
        if n is None:
            n = max(len(x), 2)
        xu = np.linspace(x[0], x[-1], n)
        yu = np.interp(xu, x, y)
        return cls(float(xu[0]), float(xu[1] - xu[0]), jnp.asarray(yu, dtype))

    @classmethod
    def from_func(cls, f, x_min, x_max, n, dtype=jnp.float32):
        xu = np.linspace(x_min, x_max, n)
        return cls(
            float(x_min),
            float((x_max - x_min) / (n - 1)),
            jnp.asarray(f(xu), dtype),
        )


def inverse_cdf_table(pdf_x, pdf_y, n=2048, dtype=jnp.float32):
    """Build an inverse-CDF UniformTable u in [0,1] -> x for sampling from a
    tabulated 1D pdf.  Used for radial photon shooting of profiles whose
    radial CDF has no closed form (Kolmogorov, von Karman, Sersic)."""
    x = np.asarray(pdf_x, float)
    p = np.clip(np.asarray(pdf_y, float), 0.0, None)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (p[1:] + p[:-1]) * np.diff(x))])
    cdf /= cdf[-1]
    u = np.linspace(0.0, 1.0, n)
    # np.interp needs strictly increasing cdf; collapse flat spots
    eps = np.arange(len(cdf)) * 1e-15
    xi = np.interp(u, cdf + eps, x)
    return UniformTable(0.0, 1.0 / (n - 1), np.asarray(xi, dtype))
