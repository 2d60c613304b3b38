"""On-chip probe: row-materialization formulations.

The pooled batch reconstructs (C=24)-wide per-photon parameter rows
from per-object deltas (scatter + cumsum; see
photon_pooling.materialize_rows).  This probe times each piece and the
candidate replacements:

  * scatter orientation + indices_are_sorted hint (j0 is
    non-decreasing by construction)
  * XLA cumsum axis0 (N, C) vs axis1 (C, N)
  * the Pallas single-pass lane scan (ops/scanrows.py)
  * the pe-block relayout transpose

Run:  python benchmarks/probe_rows.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from _util import slope

N = 16_777_216
C = 24
N_OBJ = 131_072


def main():
    from imsim_tpu.ops.scanrows import scan_lanes

    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(N_OBJ, C)), jnp.float32)
    counts = rng.multinomial(N - N_OBJ, np.ones(N_OBJ) / N_OBJ) + 1
    cum = jnp.asarray(np.cumsum(counts), jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    NB = 6

    def j0_of(b):
        return jnp.maximum(-((b - starts) // NB), 0).astype(jnp.int32)

    deltas = params - jnp.concatenate(
        [jnp.zeros((1, C), jnp.float32), params[:-1]])
    deltasT = deltas.T

    def loop(body):
        @jax.jit
        def run(key, K, *args):
            def step(i, acc):
                return acc + body(jax.random.fold_in(key, i), *args)
            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
        return run

    def s_scatter_nc(key, d):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((N, C), jnp.float32).at[j0].add(d, mode="drop")
        return rows[12345, 3]

    def s_scatter_nc_sorted(key, d):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((N, C), jnp.float32).at[j0].add(
            d, mode="drop", indices_are_sorted=True)
        return rows[12345, 3]

    def s_scatter_cn(key, dT):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((C, N), jnp.float32).at[:, j0].add(
            dT, mode="drop", indices_are_sorted=True)
        return rows[3, 12345]

    def s_cumsum_nc(key, d):
        rows = jnp.zeros((N, C), jnp.float32).at[0].add(
            d[0] + jax.random.uniform(key, (C,)))
        return jnp.cumsum(rows, axis=0)[N - 1, 3]

    def s_cumsum_cn(key, dT):
        rows = jnp.zeros((C, N), jnp.float32).at[:, 0].add(
            dT[:, 0] + jax.random.uniform(key, (C,)))
        return jnp.cumsum(rows, axis=1)[3, N - 1]

    def s_pallas_cn(key, dT):
        rows = jnp.zeros((C, N), jnp.float32).at[:, 0].add(
            dT[:, 0] + jax.random.uniform(key, (C,)))
        return scan_lanes(rows)[3, N - 1]

    def s_full_nc(key, d):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((N, C), jnp.float32).at[j0].add(d, mode="drop")
        rows = jnp.cumsum(rows, axis=0)
        mp = N // 16
        out = rows.reshape(mp, 4, 4, C).transpose(2, 1, 0, 3).reshape(N, C)
        return out[12345, 3]

    def s_full_cn_pallas(key, dT):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((C, N), jnp.float32).at[:, j0].add(
            dT, mode="drop", indices_are_sorted=True)
        rows = scan_lanes(rows)
        mp = N // 16
        out = rows.reshape(C, mp, 4, 4).transpose(0, 3, 2, 1).reshape(C, N)
        return out[3, 12345]

    def s_full_cn_xla(key, dT):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((C, N), jnp.float32).at[:, j0].add(
            dT, mode="drop", indices_are_sorted=True)
        rows = jnp.cumsum(rows, axis=1)
        mp = N // 16
        out = rows.reshape(C, mp, 4, 4).transpose(0, 3, 2, 1).reshape(C, N)
        return out[3, 12345]

    def s_full_cn_noscan(key, dT):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((C, N), jnp.float32).at[:, j0].add(
            dT, mode="drop", indices_are_sorted=True)
        mp = N // 16
        out = rows.reshape(C, mp, 4, 4).transpose(0, 3, 2, 1).reshape(C, N)
        return out[3, 12345]

    def s_full_cn_norelayout(key, dT):
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((C, N), jnp.float32).at[:, j0].add(
            dT, mode="drop", indices_are_sorted=True)
        rows = scan_lanes(rows)
        return rows[3, 12345]

    def s_full_cn_fused(key, dT):
        from imsim_tpu.ops.scanrows import scan_lanes_relayout
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        rows = jnp.zeros((C, N), jnp.float32).at[:, j0].add(
            dT, mode="drop", indices_are_sorted=True)
        out = scan_lanes_relayout(rows, 4, 4)
        return out[3, 12345]

    def s_full_slot(key, dT):
        from imsim_tpu.ops.scanrows import scan_slot_prefix
        pair = share = 4
        pe = pair * share
        mp = N // pe
        b = jax.random.randint(key, (), 0, NB)
        j0 = j0_of(b)
        mu = j0 % pe
        beta = (mu % pair) * share + (mu // pair)
        d = jnp.zeros((C, pe, mp), jnp.float32).at[:, beta, j0 // pe].add(
            dT, mode="drop")
        out = scan_slot_prefix(d, pair, share)
        return out[3, 2, 12345]

    def s_relayout_cn(key, dT):
        rows = jnp.broadcast_to(
            dT[:, :1] + jax.random.uniform(key, ()), (C, N))
        mp = N // 16
        out = rows.reshape(C, mp, 4, 4).transpose(0, 3, 2, 1).reshape(C, N)
        return out[3, 12345]

    cases = [
        ("scatter (N,C)", s_scatter_nc, (deltas,)),
        ("scatter (N,C) sorted-hint", s_scatter_nc_sorted, (deltas,)),
        ("scatter (C,N) sorted-hint", s_scatter_cn, (deltasT,)),
        ("cumsum axis0 (N,C)", s_cumsum_nc, (deltas,)),
        ("cumsum axis1 (C,N)", s_cumsum_cn, (deltasT,)),
        ("pallas scan (C,N)", s_pallas_cn, (deltasT,)),
        ("relayout pe=16 (C,N)", s_relayout_cn, (deltasT,)),
        ("FULL current (N,C)", s_full_nc, (deltas,)),
        ("FULL transposed+pallas", s_full_cn_pallas, (deltasT,)),
        ("FULL transposed+XLA cumsum", s_full_cn_xla, (deltasT,)),
        ("FULL transposed no-scan", s_full_cn_noscan, (deltasT,)),
        ("FULL transposed no-relayout", s_full_cn_norelayout, (deltasT,)),
        ("FULL fused scan+relayout", s_full_cn_fused, (deltasT,)),
        ("FULL slot-plane kernel", s_full_slot, (deltasT,)),
    ]
    only = set(sys.argv[1:])
    for name, fn, args in cases:
        if only and not any(o in name for o in only):
            continue
        dt = slope(loop(fn), args)
        print(f"{name:28s} {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
