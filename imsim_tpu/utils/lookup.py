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


def clenshaw_rows(c: jax.Array, x: jax.Array) -> jax.Array:
    """Chebyshev evaluation with PER-ROW coefficients: c (N, D) rows,
    x (N,) in [-1, 1] -> (N,).  Pure VPU fma chain — the gather-free
    per-photon evaluator for materialized per-object polynomial rows
    (see image.scene.fit_wl_cheb / photon_pooling.materialize_rows)."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for k in range(c.shape[1] - 1, 0, -1):
        b1, b2 = c[:, k] + 2.0 * x * b1 - b2, b1
    return c[:, 0] + x * b1 - b2


def clenshaw_cols(c: jax.Array, x: jax.Array) -> jax.Array:
    """clenshaw_rows for the TRANSPOSED coefficient layout: c (D, N)
    columns-of-coefficients, x (N,) -> (N,).  The pooled path stores
    per-photon rows photon-minor ((C, N), photons on lanes) so each
    coefficient slice c[k] is a contiguous full-lane read."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for k in range(c.shape[0] - 1, 0, -1):
        b1, b2 = c[k] + 2.0 * x * b1 - b2, b1
    return c[0] + x * b1 - b2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PolyCDF:
    """GATHER-FREE inverse-CDF sampler: r(u) as piecewise Chebyshev.

    On this TPU a random gather costs ~8.6 ns/row regardless of width
    while VPU flops are effectively free, so smooth 1-D inverse CDFs
    (Kolmogorov, von Karman, second kick, exponential-disk) are cheaper
    evaluated as ~30 fma than looked up in a table.

    Parametrization (host fit, `PolyCDF.fit`):
      core u in [0, u_split]:  r = C_core(x),  x = 2*sqrt(u/u_split)-1
        (sqrt stretch: r ~ sqrt(u) near 0, so r is ~linear in x)
      tail u in (u_split, 1): log r = C_tail(t), t from s = -log(1-u)
        (power-law profile wings are ~linear in log r vs s)

    Drop-in for UniformTable wherever only __call__ is used
    (profiles.sample_radial etc.).
    """

    c_core: jax.Array   # (D1,) Chebyshev coefficients
    c_tail: jax.Array   # (D2,)
    u_split: float
    s_lo: float
    s_hi: float

    def tree_flatten(self):
        return (self.c_core, self.c_tail), (self.u_split, self.s_lo,
                                            self.s_hi)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @staticmethod
    def _clenshaw(c, x):
        b1 = jnp.zeros_like(x)
        b2 = jnp.zeros_like(x)
        for k in range(c.shape[0] - 1, 0, -1):
            b1, b2 = c[k] + 2 * x * b1 - b2, b1
        return c[0] + x * b1 - b2

    def __call__(self, u):
        u = jnp.clip(jnp.asarray(u), 0.0, 1.0 - 1e-7)
        x = jnp.clip(2.0 * jnp.sqrt(u / self.u_split) - 1.0, -1.0, 1.0)
        r_core = self._clenshaw(jnp.asarray(self.c_core), x)
        s = -jnp.log1p(-u)
        t = jnp.clip(2.0 * (s - self.s_lo) / (self.s_hi - self.s_lo)
                     - 1.0, -1.0, 1.0)
        r_tail = jnp.exp(self._clenshaw(jnp.asarray(self.c_tail), t))
        return jnp.where(u < self.u_split, jnp.maximum(r_core, 0.0),
                         r_tail)

    @classmethod
    def fit(cls, table, u_split=0.85, d_core=24, d_tail=18,
            u_max=1.0 - 1e-7):
        """Fit from an inverse-CDF UniformTable r(u) (u uniform on
        [0, 1]).  Returns (poly, max_rel_err)."""
        import numpy.polynomial.chebyshev as C

        def r_of(u):
            n = len(table.y)
            f = np.clip((u - table.x0) / table.dx, 0, n - 1.000001)
            i = f.astype(int)
            w = f - i
            yv = np.asarray(table.y, float)
            return yv[i] * (1 - w) + yv[i + 1] * w

        x = np.linspace(-1, 1, 4096)
        u_core = u_split * ((x + 1) / 2) ** 2
        c_core = C.chebfit(x, r_of(u_core), d_core)
        s_lo = -np.log1p(-u_split)
        s_hi = -np.log1p(-u_max)
        t = np.linspace(-1, 1, 4096)
        s = s_lo + (t + 1) / 2 * (s_hi - s_lo)
        u_tail = -np.expm1(-s)
        r_tail = np.maximum(r_of(u_tail), 1e-12)
        c_tail = C.chebfit(t, np.log(r_tail), d_tail)
        # host numpy leaves: fit() may run at jit-trace time under an
        # lru_cache, and a device constant created inside a trace must
        # not outlive it (__call__ lifts them per-trace)
        poly = cls(np.asarray(c_core, np.float32),
                   np.asarray(c_tail, np.float32),
                   float(u_split), float(s_lo), float(s_hi))
        # fit quality over the bulk of the distribution — pure numpy so
        # fit() is safe to call at jit-trace time (lru_cached builders)
        uu = np.linspace(1e-4, u_max, 8192)
        ref = r_of(uu)
        x = np.clip(2.0 * np.sqrt(uu / u_split) - 1.0, -1.0, 1.0)
        r_core = C.chebval(x, c_core)
        s = -np.log1p(-np.clip(uu, 0.0, 1.0 - 1e-7))
        tt = np.clip(2.0 * (s - s_lo) / (s_hi - s_lo) - 1.0, -1.0, 1.0)
        got = np.where(uu < u_split, np.maximum(r_core, 0.0),
                       np.exp(C.chebval(tt, c_tail)))
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3 * ref.max())
        return poly, float(rel.max())


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
