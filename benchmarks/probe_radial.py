"""Probe: second-kick radial sampling — per-photon table gather vs a
global Chebyshev ICDF (round-4 VERDICT item 3 lead).

The pooled chain samples the second kick as r = sk_table(u): ONE random
gather per photon (~3-9 ns on v5e regardless of table size).  The table
is a single smooth global function r(u), so — like the per-object
wavelength ICDFs (docs/performance.md rule 6) — it can become a
Chebyshev series in the arcsin-stretched variable: pure VPU fma, no
gather.  Fit quality measured in /tmp-round4 experiments: deg 24 keeps
max |dr| <= 7e-4 arcsec and tail (u>0.9) relative error <= 0.03% across
bands/seeing (see profiles.fit_radial_cheb).

Also times the stretch's arcsin against a sqrt-poly approximation and
the chromatic (wl/ref)^alpha exp-log against a fitted polynomial, to
decide whether those transcendentals matter at all.

Run on the real chip:  python benchmarks/probe_radial.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from numpy.polynomial import chebyshev as C

from _util import slope  # noqa: E402

N = 1 << 24


def loop(body):
    def fn(key, K):
        def step(i, acc):
            u = jax.random.uniform(jax.random.fold_in(key, i), (N,))
            return acc + body(u)
        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
    return jax.jit(fn)


def main():
    from imsim_tpu.photons.profiles import second_kick_cdf
    from imsim_tpu.utils.lookup import clenshaw_rows

    tbl = second_kick_cdf(622.0, 0.15)
    y = np.asarray(tbl.y, float)
    u_grid = np.linspace(0, 1, len(y))
    x_grid = np.arcsin(2 * u_grid - 1) * 2 / np.pi
    cf = jnp.asarray(C.chebfit(x_grid, y, 24), jnp.float32)

    def cheb_1d(c, x):
        # Clenshaw for a single global series, x (N,)
        b1 = jnp.zeros_like(x)
        b2 = jnp.zeros_like(x)
        for k in range(c.shape[0] - 1, 0, -1):
            b1, b2 = 2.0 * x * b1 - b2 + c[k], b1
        return x * b1 - b2 + c[0]

    cases = {
        "table-gather r(u)": lambda u: jnp.sum(tbl(u)),
        "cheb24+asin r(u)": lambda u: jnp.sum(
            cheb_1d(cf, jnp.arcsin(2 * u - 1) * jnp.float32(2 / np.pi))),
        "asin only": lambda u: jnp.sum(jnp.arcsin(2 * u - 1)),
        "cheb24 only": lambda u: jnp.sum(cheb_1d(cf, 2 * u - 1)),
        "exp*log (chromatic)": lambda u: jnp.sum(
            jnp.exp(jnp.float32(-0.3) * jnp.log(u * 500.0 + 400.0))),
        "poly8 (chromatic)": lambda u: jnp.sum(
            cheb_1d(cf[:9], (u - 0.5) * 1.8)),
        "sincos": lambda u: jnp.sum(jnp.sin(u) + jnp.cos(u)),
        "tan": lambda u: jnp.sum(jnp.tan(u)),
        "normal-pair unit vec": lambda u: 0.0 * jnp.sum(u),
    }

    for name, body in cases.items():
        s = slope(loop(body), k1=2, k5=10)
        print(f"{name:24s} {s*1e3:8.2f} ms / {N>>20}M  "
              f"({s/N*1e9:6.2f} ns/elem)")


if __name__ == "__main__":
    main()
