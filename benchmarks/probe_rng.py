"""Probe: per-photon random-draw cost in the silicon displacement stage.

apply_silicon_displacements spends ~93 ms per 16.7M-photon batch on
one exponential (depth) + two normals (diffusion) plus arithmetic.
Measures, with the slope method on the real chip:

  tf_normal   — jax.random.normal(threefry key, (N, 2))   [production]
  rbg_normal  — jax.random.normal(rbg key, (N, 2))
  boxmuller   — 2 threefry uniforms -> Box-Muller pair
  tf_exp      — -log(uniform) depth draw                    [production]
  rbg_exp     — same under rbg bits

Usage: python benchmarks/probe_rng.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 24


from _util import slope  # noqa: E402


def _rbg(key):
    kz, kd = jax.random.split(key)
    return jax.random.wrap_key_data(jnp.concatenate([kz, kd]), impl="rbg")


def make(variant):
    @jax.jit
    def run(key, K):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            if variant == "tf_normal":
                g = jax.random.normal(k, (N, 2))
                out = jnp.abs(g).sum()
            elif variant == "rbg_normal":
                g = jax.random.normal(_rbg(k), (N, 2))
                out = jnp.abs(g).sum()
            elif variant == "boxmuller":
                u = jax.random.uniform(k, (N, 2), minval=1e-7, maxval=1.0)
                r = jnp.sqrt(-2.0 * jnp.log(u[:, 0]))
                th = 2.0 * np.pi * u[:, 1]
                out = jnp.abs(r * jnp.cos(th)).sum() + jnp.abs(
                    r * jnp.sin(th)).sum()
            elif variant == "tf_exp":
                u = jax.random.uniform(k, (N,), minval=1e-7, maxval=1.0)
                out = (-jnp.log(u)).sum()
            elif variant == "rbg_exp":
                u = jax.random.uniform(_rbg(k), (N,), minval=1e-7, maxval=1.0)
                out = (-jnp.log(u)).sum()
            else:
                raise ValueError(variant)
            return acc + out
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    return run


if __name__ == "__main__":
    for v in ["tf_normal", "rbg_normal", "boxmuller", "tf_exp", "rbg_exp"]:
        s = slope(make(v))
        print(f"{v:11s} {s*1e3:8.1f} ms/iter ({s/N*1e9:5.2f} ns/photon)",
              flush=True)
