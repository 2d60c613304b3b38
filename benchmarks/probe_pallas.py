"""Incremental probe: find which Pallas construct the TPU compiler
rejects, then time the survivors.  Run on the real chip."""
import sys
import time
import functools

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
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return None


rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1e5, (H, W)), jnp.float32)
P = jnp.zeros((H + 2 * R, Wp), jnp.float32)
P = jax.lax.dynamic_update_slice(P, img, (R, R))
dk = jnp.asarray(rng.normal(size=(2, k, k)), jnp.float32)
dkflat = dk.reshape(2, k * k)

# --- probe 1: trivial copy kernel, blocked VMEM in/out -------------------


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


@jax.jit
def p1(x):
    return pl.pallas_call(
        copy_kernel,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )(x)


# --- probe 2: ANY input + manual DMA ------------------------------------


def dma_kernel(x_ref, o_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(t * TH, TH + k - 1), :],
                               scratch, sem)
    cp.start()
    cp.wait()
    o_ref[:] = scratch[R:R + TH, R:R + W]


@jax.jit
def p2(x):
    return pl.pallas_call(
        dma_kernel,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)


# --- probe 3: + SMEM taps rank-2 ----------------------------------------


def smem_kernel(dk_ref, x_ref, o_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(t * TH, TH + k - 1), :],
                               scratch, sem)
    cp.start()
    cp.wait()
    o_ref[:] = scratch[R:R + TH, R:R + W] * dk_ref[0, 0]


@jax.jit
def p3(dkf, x):
    return pl.pallas_call(
        smem_kernel,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(dkf, x)


# --- probe 4: full stencil, single output -------------------------------


def sten1_kernel(dk_ref, x_ref, o_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(t * TH, TH + k - 1), :],
                               scratch, sem)
    cp.start()
    cp.wait()
    for i in range(k):
        acc = jnp.zeros((TH, W), jnp.float32)
        for j in range(k):
            acc = acc + dk_ref[0, i * k + j] * scratch[i:i + TH, j:j + W]
        if i == 0:
            o_ref[:] = acc
        else:
            o_ref[:] = o_ref[:] + acc


@jax.jit
def p4(dkf, x):
    return pl.pallas_call(
        sten1_kernel,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(dkf, x)


# --- probe 5: full stencil, two outputs (the real kernel) ---------------


def sten2_kernel(dk_ref, x_ref, ox_ref, oy_ref, scratch, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(t * TH, TH + k - 1), :],
                               scratch, sem)
    cp.start()
    cp.wait()
    for i in range(k):
        accx = jnp.zeros((TH, W), jnp.float32)
        accy = jnp.zeros((TH, W), jnp.float32)
        for j in range(k):
            tap = scratch[i:i + TH, j:j + W]
            accx = accx + dk_ref[0, i * k + j] * tap
            accy = accy + dk_ref[1, i * k + j] * tap
        if i == 0:
            ox_ref[:] = accx
            oy_ref[:] = accy
        else:
            ox_ref[:] = ox_ref[:] + accx
            oy_ref[:] = oy_ref[:] + accy


@jax.jit
def p5(dkf, x):
    return pl.pallas_call(
        sten2_kernel,
        grid=(H // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((TH, W), lambda t: (t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TH, W), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(dkf, x)


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3", "4", "5"]
    print("backend:", jax.default_backend())
    if "1" in which:
        run("p1 blocked copy", p1, img)
    if "2" in which:
        run("p2 ANY+DMA", p2, P)
    if "3" in which:
        run("p3 +SMEM", p3, dkflat, P)
    if "4" in which:
        o = run("p4 stencil 1-out", p4, dkflat, P)
    if "5" in which:
        o = run("p5 stencil 2-out", p5, dkflat, P)
        if o is not None:
            # verify against XLA
            @jax.jit
            def xla(Pp, d):
                dx = jnp.zeros((H, W)); dy = jnp.zeros((H, W))
                for i in range(k):
                    for j in range(k):
                        sl = jax.lax.dynamic_slice(Pp, (i, j), (H, W))
                        dx = dx + d[0, i, j] * sl
                        dy = dy + d[1, i, j] * sl
                return dx, dy
            xx, xy = run("xla shifted-slice", xla, P[:, :W + 2 * R], dk)
            print("maxdiff",
                  float(jnp.max(jnp.abs(o[0] - xx))),
                  float(jnp.max(jnp.abs(o[1] - xy))),
                  "scale", float(jnp.max(jnp.abs(xx))))
