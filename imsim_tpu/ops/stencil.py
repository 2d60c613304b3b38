"""Pallas TPU kernels for hot image-space stencils.

`displacement_field_pallas` computes the brighter-fatter displacement
field — the correlation of the accumulated charge image with the
*gradient* of the short-range interaction kernel (see
sensor/silicon.py::displacement_field; reference physics:
GalSim Silicon.cpp pixel-boundary distortion, driven at
imsim/photon_pooling.py:195-225).

Why a kernel: the op is a k x k stencil over a 4k x 4k frame producing
TWO outputs (d/dx and d/dy share every input tap).  The XLA
shifted-slice formulation costs ~22 ms per call on v5e because the 2*k*k
shifted adds materialize intermediate passes over the 64 MB frame; the
memory-bound floor (read 64 MB + write 128 MB) is ~0.25 ms.  Tiling rows
into VMEM and doing all 2*k^2 multiply-adds per tile in-register makes
the op compute-bound on the VPU instead (~81 fused MACs per pixel for
the default 9 x 9 kernel), one HBM read + two writes total.

Layout: grid over row-tiles.  Each program DMAs its (TH + k - 1, Wp)
halo slab from the zero-padded frame (kept in HBM via
``memory_space=ANY``) into VMEM scratch, then accumulates both outputs
with static unaligned VMEM slices (Mosaic lowers the lane shifts).  Tap
weights ride in SMEM as a (2, k, k) array.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-tile height: 128 rows x 4224 cols x f32 halo slab = ~2.3 MB VMEM
_TH = 128
_LANE = 128


def _stencil2_kernel(dk_ref, img_ref, outx_ref, outy_ref, scratch, sem,
                     *, k: int, TH: int, W: int, Wp: int):
    t = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_ref.at[pl.ds(t * TH, TH + k - 1), :], scratch, sem)
    copy.start()
    copy.wait()
    # Mosaic constraints found by probing (benchmarks/probe_pallas2.py):
    #  * multiple lane-offset slices of a ref crash the TPU compiler —
    #    lane shifts must be pltpu.roll of the full slab (shift >= 0);
    #  * sublane-offset value slices are fine;
    #  * flushing partial sums into the out refs once per lane shift
    #    bounds VMEM stack liveness (a full 2*k^2 unroll kept ~36 MB of
    #    taps live and OOM'd the 16 MB scoped limit).
    for j in range(k):
        Sj = pltpu.roll(scratch[:], (Wp - j) % Wp, 1)
        accx = jnp.zeros((TH, Wp), jnp.float32)
        accy = jnp.zeros((TH, Wp), jnp.float32)
        for i in range(k):
            tap = jax.lax.slice(Sj, (i, 0), (i + TH, Wp))
            accx = accx + dk_ref[0, i * k + j] * tap
            accy = accy + dk_ref[1, i * k + j] * tap
        if j == 0:
            outx_ref[:] = accx[:, 0:W]
            outy_ref[:] = accy[:, 0:W]
        else:
            outx_ref[:] = outx_ref[:] + accx[:, 0:W]
            outy_ref[:] = outy_ref[:] + accy[:, 0:W]


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil_pair(image: jax.Array, dkx: jax.Array, dky: jax.Array,
                 interpret: bool = False):
    """SAME-padded correlation of `image` with two k x k tap sets sharing
    input taps: returns (image * dkx, image * dky) in one pass.

    out[y, x] = sum_{i,j} dk[i, j] * pad(image, R)[y + i, x + j],
    R = k // 2 (odd k).  Rows are tiled; H must be a multiple of the
    row tile (pad upstream) and W a lane multiple.
    """
    H, W = image.shape
    k = dkx.shape[0]
    R = k // 2
    # real CCD frames are not tile-aligned (e.g. ITL 4000 x 4072):
    # round the worked width/height up and slice the outputs back
    TH = min(_TH, ((H + 7) // 8) * 8)
    Ho = ((H + TH - 1) // TH) * TH
    Wo = ((W + _LANE - 1) // _LANE) * _LANE
    # zero-pad: R rows top/bottom, R cols left, lane-align the right edge
    Wp = ((Wo + 2 * R + _LANE - 1) // _LANE) * _LANE
    P = jnp.zeros((Ho + 2 * R, Wp), jnp.float32)
    P = jax.lax.dynamic_update_slice(P, image.astype(jnp.float32), (R, R))
    dk = jnp.stack([dkx, dky]).astype(jnp.float32).reshape(2, k * k)

    grid = (Ho // TH,)
    out_shape = [jax.ShapeDtypeStruct((Ho, Wo), jnp.float32)] * 2
    fn = pl.pallas_call(
        functools.partial(_stencil2_kernel, k=k, TH=TH, W=Wo, Wp=Wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TH, Wo), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, Wo), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TH + k - 1, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * k * k * Ho * Wo,
            bytes_accessed=4 * Ho * Wp + 8 * Ho * Wo,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    ox, oy = fn(dk, P)
    if (Ho, Wo) != (H, W):
        ox = jax.lax.slice(ox, (0, 0), (H, W))
        oy = jax.lax.slice(oy, (0, 0), (H, W))
    return ox, oy


def size_ok(image) -> bool:
    """Frame big enough for the Pallas kernel to beat XLA's fused
    shifted-slice formulation.  Platform selection is NOT done here —
    sensor.silicon.displacement_field picks the branch with
    jax.lax.platform_dependent at lowering time (a trace-time
    `jax.default_backend()` probe reports the tunnel TPU even when the
    computation targets forced-CPU devices)."""
    H, W = image.shape
    return H >= 512 and W >= 512


def supports(image) -> bool:
    """Back-compat probe: size gate AND the default backend is a TPU."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and size_ok(image)
