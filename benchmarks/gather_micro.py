"""Microbenchmark: TPU gather/scatter throughput vs table size and
element width — validates the pair-packing optimization of the photon
hot path (slope-method timing per the axon tunnel rules).

Usage: timeout 550 python benchmarks/gather_micro.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 16_777_216


from _util import slope as _slope  # noqa: E402


def slope(fn, *args):
    # Shared timer expects fn(key, K, *args); these kernels don't take
    # a key, so thread args through and ignore the key.
    return _slope(lambda key, K, *a: fn(*a, K), args)


def bench_gather(table_rows, width, dtype, pack=False):
    """Gather N rows of `width` elems from a (table_rows, width) table
    K times inside one jit; returns per-iteration seconds."""
    tab = jnp.asarray(
        np.random.default_rng(0).normal(size=(table_rows, width)),
        dtype)
    if pack:
        # two f16 packed in one u32 per element-pair
        h = tab.astype(jnp.float16)
        lo = jax.lax.bitcast_convert_type(h[:, 0::2], jnp.uint16)
        hi = jax.lax.bitcast_convert_type(h[:, 1::2], jnp.uint16)
        tab = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def run(tab, K):
        def body(i, s):
            idx = jax.random.randint(jax.random.fold_in(key, i), (N,), 0,
                                     table_rows)
            g = tab[idx]
            if pack:
                lo = jax.lax.bitcast_convert_type(
                    (g & 0xFFFF).astype(jnp.uint16), jnp.float16)
                hi = jax.lax.bitcast_convert_type(
                    (g >> 16).astype(jnp.uint16), jnp.float16)
                return s + jnp.sum(lo.astype(jnp.float32)
                                   + hi.astype(jnp.float32))
            return s + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, 0.0)

    return slope(run, tab)


def bench_scatter(img_side):
    img = jnp.zeros((img_side * img_side,), jnp.float32)
    key = jax.random.PRNGKey(2)

    @jax.jit
    def run(img, K):
        def body(i, im):
            idx = jax.random.randint(jax.random.fold_in(key, i), (N,), 0,
                                     img_side * img_side)
            return im.at[idx].add(1.0, mode="drop")
        return jax.lax.fori_loop(0, K, body, img)[0]

    return slope(run, img)


def main():
    print(f"N = {N/1e6:.1f}M lookups per iteration")
    for rows, label in [(4096 * 4096, "4k^2"), (2048 * 2048, "2k^2"),
                        (1024 * 1024, "1k^2"), (512 * 512, "512^2"),
                        (65536, "64k"), (2048, "2k")]:
        for width, pack in [(2, False), (1, False), (2, True)]:
            w = "u32-packed-pair" if pack else f"{width}xf32"
            t = bench_gather(rows, width if not pack else 2, jnp.float32,
                             pack)
            eps = N * (width if not pack else 2) / max(t, 1e-9) / 1e9
            print(f"gather rows={label:6s} {w:16s}: {t*1e3:8.1f} ms "
                  f"({eps:6.2f} G elem/s)")
    for side in (4096,):
        t = bench_scatter(side)
        print(f"scatter {side}^2 image 1xf32: {t*1e3:8.1f} ms "
              f"({N/max(t,1e-9)/1e9:6.2f} G elem/s)")


if __name__ == "__main__":
    main()
