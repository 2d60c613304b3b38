"""Probe: scatter-add formulations for the silicon accumulate.

The per-batch budget (docs/performance.md) puts the photon->pixel
scatter-add at ~180 ms per 16.7M-photon batch (~10.8 ns/photon), the
single largest line item after the BF recalc loop.  This probe measures
alternative formulations on the real chip with the slope method:

  flat1d   — current production path: image.ravel().at[iy*W+ix].add
  idx2d    — 2-D scatter .at[iy, ix].add
  split8   — 8 independent scatters into 8 accumulator images + sum
             (exposes update parallelism if XLA serializes one scatter)
  rowmajor — flat1d but with photon indices pre-sorted by row bucket
             inside the jit (sort cost included) — locality test
  ones_i32 — int32 unit-flux scatter (counts), then float convert

Usage: python benchmarks/probe_scatter.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 24           # 16.7M photons
H = W = 4096


from _util import slope  # noqa: E402


def make(variant):
    @jax.jit
    def run(key, K):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            kx, ky, kf = jax.random.split(k, 3)
            x = jax.random.uniform(kx, (N,), jnp.float32, 0, W)
            y = jax.random.uniform(ky, (N,), jnp.float32, 0, H)
            ix = x.astype(jnp.int32)
            iy = y.astype(jnp.int32)
            flux = jnp.ones((N,), jnp.float32)
            if variant == "flat1d":
                img = jnp.zeros((H * W,), jnp.float32)
                img = img.at[iy * W + ix].add(flux, mode="drop")
                out = img.sum()
            elif variant == "idx2d":
                img = jnp.zeros((H, W), jnp.float32)
                img = img.at[iy, ix].add(flux, mode="drop")
                out = img.sum()
            elif variant == "split8":
                P = 8
                idx = (iy * W + ix).reshape(P, N // P)
                f = flux.reshape(P, N // P)
                imgs = jnp.zeros((P, H * W), jnp.float32)
                imgs = jax.vmap(
                    lambda im, j, v: im.at[j].add(v, mode="drop"))(imgs, idx, f)
                out = imgs.sum()
            elif variant == "rowmajor":
                key_ = iy * W + ix
                order = jnp.argsort(iy // 256)
                img = jnp.zeros((H * W,), jnp.float32)
                img = img.at[key_[order]].add(flux[order], mode="drop")
                out = img.sum()
            elif variant == "ones_i32":
                img = jnp.zeros((H * W,), jnp.int32)
                img = img.at[iy * W + ix].add(1, mode="drop")
                out = img.astype(jnp.float32).sum()
            else:
                raise ValueError(variant)
            return acc + out
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    return run


if __name__ == "__main__":
    variants = sys.argv[1:] or ["flat1d", "idx2d", "split8", "ones_i32",
                                "rowmajor"]
    for v in variants:
        s = slope(make(v))
        print(f"{v:10s} {s*1e3:8.1f} ms/iter  ({s/N*1e9:5.2f} ns/photon)",
              flush=True)
