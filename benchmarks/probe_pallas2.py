"""Bisect the stencil-kernel compile failure: unaligned slices vs
accumulation pattern vs op count; try pltpu.roll as the alternative."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, k, TH = 4096, 4096, 9, 128
R = k // 2
Wp = ((W + 2 * R + 127) // 128) * 128


def run(tag, fn, *args):
    try:
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        t1 = time.time()
        for _ in range(10):
            out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        dt = (time.time() - t1) / 10 * 1e3
        print(f"{tag}: OK compile {t1-t0:.1f}s per-call {dt:.2f} ms")
        return out
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return None


rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1e5, (H, W)), jnp.float32)
P = jnp.zeros((H + 2 * R, Wp), jnp.float32)
P = jax.lax.dynamic_update_slice(P, img, (R, R))
dk = jnp.asarray(rng.normal(size=(2, k, k)), jnp.float32)
dkflat = dk.reshape(2, k * k)


def mk(kernel_body):
    @jax.jit
    def f(dkf, x):
        return pl.pallas_call(
            kernel_body,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(dkf, x)
    return f


def dma_in(x_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(t * TH, TH + k - 1), :],
                               scratch, sem)
    cp.start()
    cp.wait()


# a: one unaligned sublane slice (row offset 1)
def ka(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    o_ref[:] = scratch[1:1 + TH, R:R + W]


# b: one unaligned lane slice (col offset 1)
def kb(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    o_ref[:] = scratch[0:TH, 1:1 + W]


# c: 9 unaligned lane slices accumulated in values
def kc(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    acc = jnp.zeros((TH, W), jnp.float32)
    for j in range(k):
        acc = acc + dk_ref[0, j] * scratch[0:TH, j:j + W]
    o_ref[:] = acc


# d: 9 row-offsets, aligned lanes
def kd(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    acc = jnp.zeros((TH, W), jnp.float32)
    for i in range(k):
        acc = acc + dk_ref[0, i] * scratch[i:i + TH, R:R + W]
    o_ref[:] = acc


# e: roll-based full stencil, one output
def ke(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    S = scratch[:]
    acc = jnp.zeros((TH + k - 1, Wp), jnp.float32)
    for i in range(k):
        Si = pltpu.roll(S, -i, 0)
        for j in range(k):
            acc = acc + dk_ref[0, i * k + j] * pltpu.roll(Si, -j, 1)
    o_ref[:] = acc[0:TH, 0:W]


# f: full stencil via values (not ref slices), accumulate then store
def kf(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    S = scratch[:]
    acc = jnp.zeros((TH, W), jnp.float32)
    for i in range(k):
        for j in range(k):
            acc = acc + dk_ref[0, i * k + j] * jax.lax.slice(
                S, (i, j), (i + TH, j + W))
    o_ref[:] = acc


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    tests = dict(a=ka, b=kb, c=kc, d=kd, e=ke, f=kf)
    which = sys.argv[1:] or list(tests)
    for name in which:
        run(f"probe-{name}", mk(tests[name]), dkflat, P)


# g: ref-slice rows (sublane, OK) + positive lane rolls
def kg(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    acc = jnp.zeros((TH, Wp), jnp.float32)
    for i in range(k):
        Si = scratch[i:i + TH, :]
        for j in range(k):
            tap = pltpu.roll(Si, (Wp - j) % Wp, 1)
            acc = acc + dk_ref[0, i * k + j] * tap
    o_ref[:] = acc[:, 0:W]


# h: 9 lane rolls of the full slab, then sublane ref-style value slices
def kh(dk_ref, x_ref, o_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    acc = jnp.zeros((TH, Wp), jnp.float32)
    for j in range(k):
        Sj = pltpu.roll(scratch[:], (Wp - j) % Wp, 1)
        for i in range(k):
            tap = jax.lax.slice(Sj, (i, 0), (i + TH, Wp))
            acc = acc + dk_ref[0, i * k + j] * tap
    o_ref[:] = acc[:, 0:W]


# i: like g but TWO outputs sharing taps (the real workload shape)
def mk2(kernel_body):
    @jax.jit
    def f(dkf, x):
        return pl.pallas_call(
            kernel_body,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((TH, W), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((TH, W), lambda t: (t, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(dkf, x)
    return f


def ki(dk_ref, x_ref, ox_ref, oy_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    accx = jnp.zeros((TH, Wp), jnp.float32)
    accy = jnp.zeros((TH, Wp), jnp.float32)
    for i in range(k):
        Si = scratch[i:i + TH, :]
        for j in range(k):
            tap = pltpu.roll(Si, (Wp - j) % Wp, 1)
            accx = accx + dk_ref[0, i * k + j] * tap
            accy = accy + dk_ref[1, i * k + j] * tap
    ox_ref[:] = accx[:, 0:W]
    oy_ref[:] = accy[:, 0:W]


# h2: h-structure with two tap-sharing accumulators
def kh2(dk_ref, x_ref, ox_ref, oy_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    accx = jnp.zeros((TH, Wp), jnp.float32)
    accy = jnp.zeros((TH, Wp), jnp.float32)
    for j in range(k):
        Sj = pltpu.roll(scratch[:], (Wp - j) % Wp, 1)
        for i in range(k):
            tap = jax.lax.slice(Sj, (i, 0), (i + TH, Wp))
            accx = accx + dk_ref[0, i * k + j] * tap
            accy = accy + dk_ref[1, i * k + j] * tap
    ox_ref[:] = accx[:, 0:W]
    oy_ref[:] = accy[:, 0:W]


# h3: h-structure, flush into out refs once per j
def kh3(dk_ref, x_ref, ox_ref, oy_ref, scratch, sem):
    dma_in(x_ref, scratch, sem)
    for j in range(k):
        Sj = pltpu.roll(scratch[:], (Wp - j) % Wp, 1)
        accx = jnp.zeros((TH, Wp), jnp.float32)
        accy = jnp.zeros((TH, Wp), jnp.float32)
        for i in range(k):
            tap = jax.lax.slice(Sj, (i, 0), (i + TH, Wp))
            accx = accx + dk_ref[0, i * k + j] * tap
            accy = accy + dk_ref[1, i * k + j] * tap
        if j == 0:
            ox_ref[:] = accx[:, 0:W]
            oy_ref[:] = accy[:, 0:W]
        else:
            ox_ref[:] = ox_ref[:] + accx[:, 0:W]
            oy_ref[:] = oy_ref[:] + accy[:, 0:W]
