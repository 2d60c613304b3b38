"""Probe: the materialize_rows cumsum and obj-map cummax — XLA lowering
cost vs the theoretical 2-pass HBM bound.

materialize_rows reconstructs per-photon parameter rows as
cumsum(delta-rows) over the (N, C) batch matrix (C ~ 26 columns of
params + wavelength-Chebyshev coefficients).  One HBM read + write of
that matrix is ~3.5 GB -> ~4 ms at v5e bandwidth; if XLA's scan
lowering costs many passes, a Pallas blocked two-phase scan is the fix.

Run on the real chip:  python benchmarks/probe_cumsum.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from _util import slope  # noqa: E402

N = 1 << 24


def loop(body, shape, dtype=jnp.float32):
    def fn(key, K):
        x = jax.random.normal(key, shape, dtype) if dtype == jnp.float32 \
            else jax.random.randint(key, shape, 0, 3, dtype)

        def step(i, acc):
            y = body(x + (acc * 1e-6).astype(dtype))
            return (y.reshape(-1)[-1] * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
    return jax.jit(fn)


def main():
    cases = [
        ("cumsum (N,) f32", lambda x: jnp.cumsum(x, axis=0), (N,),
         jnp.float32),
        ("cumsum (N,26) f32 ax0", lambda x: jnp.cumsum(x, axis=0),
         (N, 26), jnp.float32),
        ("cumsum (N,8) f32 ax0", lambda x: jnp.cumsum(x, axis=0),
         (N, 8), jnp.float32),
        ("cummax (N,) i32", lambda x: jax.lax.cummax(x, axis=0), (N,),
         jnp.int32),
        ("copy (N,26)", lambda x: x * 1.0001, (N, 26), jnp.float32),
    ]
    for name, body, shape, dt in cases:
        s = slope(loop(body, shape, dt), k1=2, k5=6)
        gb = np.prod(shape) * 4 * 2 / 1e9
        print(f"{name:24s} {s*1e3:8.2f} ms   ({gb/s:6.1f} GB/s eff)")


if __name__ == "__main__":
    main()
