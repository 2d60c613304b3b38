"""Pallas TPU kernel: single-pass prefix sum along the lane (minor)
axis of a (C, N) matrix.

Why a kernel: the pooled row materialization (image/photon_pooling.py
materialize_rows) reconstructs per-photon parameter rows from
per-object deltas with one long cumsum.  XLA lowers cumsum as a
log-depth chain of shifted adds — ~log2(N) streaming HBM passes over
the whole matrix (~47 ms per 16.7M x 24 f32 batch on v5e).  A
sequential-grid Pallas kernel does it in ONE read + ONE write: each
grid step cumsums its lane block in VMEM (the in-block log-shift adds
run at VMEM bandwidth) and carries the running column total in a VMEM
scratch accumulator.

Layout note (TPU-first): the matrix is (C, N) — photons on LANES —
so every per-photon column the consumers read (field angles, profile
params, Chebyshev wavelength coefficients) is a contiguous (N,) slice
with full 128-lane utilization; the (N, C) orientation would pad
C=24 lanes to 128 in every VREG.

Reference behavior being replaced: per-photon parameter access for
the pooled batch, imsim/photon_pooling.py:334-388 (GalSim gathers the
per-object rows; see docs/performance.md rule 1/4).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 16_384          # lanes per grid step; (24, 16384) f32 = 1.5 MB


def _block_scan(x, block):
    """In-VMEM inclusive prefix sum along lanes: log2(block) masked
    roll+adds (Mosaic has no cumsum primitive; these passes run at VMEM
    bandwidth, which is the point — XLA's identical log-depth
    decomposition round-trips HBM between passes)."""
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < block:
        x = x + jnp.where(ids >= s, pltpu.roll(x, s, 1), 0.0)
        s *= 2
    return x


def _kernel(x_ref, o_ref, carry_ref, *, block):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    cs = _block_scan(x_ref[...], block) + carry_ref[...]
    o_ref[...] = cs
    carry_ref[...] = cs[:, block - 1:block]


def _block_scan3(x, block):
    """Lane prefix sum of a (C, pe, block) VMEM block, per plane."""
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    s = 1
    while s < block:
        x = x + jnp.where(ids >= s, pltpu.roll(x, s, 2), 0.0)
        s *= 2
    return x


def _kernel_slot(d_ref, o_ref, carry_ref, *, blkq, beta_order):
    """Slot-layout ordinal prefix: input deltas D are pre-scattered
    into the two-level slot layout (C, pe, mp) — plane beta, lane q
    holds the delta whose photon ordinal is pe*q + mu(beta) (see
    photon_pooling.member_offsets).  The ordinal-order prefix needed at
    (beta, q) decomposes into pure per-plane lane scans plus a
    same-lane cross-plane correction:

        prefix(pe*q + mu) = sum_planes P(q) - sum_{mu' > mu} D(q)

    with P the per-plane inclusive lane scan.  No lane shuffles — the
    relayout XLA charges ~40 ms for never happens; planes are
    sublane-axis slices.  beta_order = planes sorted by mu."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    d = d_ref[...]
    p = _block_scan3(d, blkq) + carry_ref[...]
    carry_ref[...] = p[:, :, blkq - 1:blkq]
    total = jnp.sum(p, axis=1, keepdims=True)
    # suffix over planes in mu order: out(plane with k-th smallest mu)
    # = total - sum of the planes with larger mu
    outs = [None] * len(beta_order)
    suffix = jnp.zeros_like(total)
    for b in reversed(beta_order):
        outs[b] = total - suffix
        suffix = suffix + d[:, b:b + 1, :]
    o_ref[...] = jnp.concatenate(outs, axis=1)


def scan_lanes(x, block=_BLK, interpret=False):
    """Inclusive prefix sum of x (C, N) along axis 1; N % block == 0."""
    C, N = x.shape
    if N % block:
        raise ValueError(f"N={N} not a multiple of block={block}")
    grid = (N // block,)
    blk = pl.BlockSpec((C, block), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, block=block),
        grid=grid,
        in_specs=[blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((C, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((C, 1), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * N, bytes_accessed=2 * 4 * C * N,
            transcendentals=0),
        interpret=interpret,
    )(x)


def _kernel_slot_mxu(d_ref, o_ref, carry_ref, *, gblk, beta_order):
    """MXU formulation of _kernel_slot: the in-block lane prefix runs
    as ONE (C*pe*G, 128) x (128, 128) upper-triangular matmul (the MXU
    does a 128-long inclusive scan per row in a single pass) plus a
    tiny (C*pe, G) x (G, G) strictly-upper matmul for the chunk-carry —
    replacing log2(blk) VPU roll+select+add sweeps over the whole
    block.  Lanes arrive pre-split (C, pe, G, 128) (a free row-major
    reshape in HBM)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    d4 = d_ref[...]                       # (C, pe, G, 128)
    f32 = jnp.float32
    U = jnp.triu(jnp.ones((128, 128), f32))          # inclusive
    SU = jnp.triu(jnp.ones((gblk, gblk), f32), k=1)  # exclusive
    # inclusive prefix along lanes within each 128-chunk (MXU)
    p = jax.lax.dot_general(d4, U, (((3,), (0,)), ((), ())),
                            preferred_element_type=f32)
    chunk_tot = p[..., 127]               # (C, pe, G)
    # exclusive prefix of the chunk totals along G (MXU, tiny)
    cp = jax.lax.dot_general(chunk_tot, SU, (((2,), (0,)), ((), ())),
                             preferred_element_type=f32)
    p = p + cp[..., None] + carry_ref[...][:, :, :, None]
    carry_ref[...] = (cp[:, :, gblk - 1:gblk]
                      + chunk_tot[:, :, gblk - 1:gblk]
                      + carry_ref[...])
    # per-plane inclusive lane scans done; now the ordinal-order
    # cross-plane suffix (same construction as _kernel_slot)
    d_last = d4.reshape(d4.shape[0], d4.shape[1], -1)
    p2 = p.reshape(p.shape[0], p.shape[1], -1)
    total = jnp.sum(p2, axis=1, keepdims=True)
    outs = [None] * len(beta_order)
    suffix = jnp.zeros_like(total)
    for b in reversed(beta_order):
        outs[b] = total - suffix
        suffix = suffix + d_last[:, b:b + 1, :]
    o_ref[...] = jnp.concatenate(outs, axis=1).reshape(d4.shape)


# lanes per grid step across ALL pe planes: fixes the kernel's VMEM
# block budget independent of the layout's plane count (pe=32 at the
# pe=16 blkq blew the 64 MB scoped-VMEM stack by 1.94 MB on v5e)
_SLOT_LANES = 32_768


def slot_blkq(pe: int) -> int:
    """Per-plane lane-block length for scan_slot_prefix: ~_SLOT_LANES
    total lanes per grid step, rounded to whole 128-lane chunks."""
    return 128 * max(1, _SLOT_LANES // max(pe, 1) // 128)


def scan_slot_prefix(d, pair: int, share: int, blkq=None,
                     interpret=False, mxu=True):
    """Ordinal prefix sum of slot-layout deltas d (C, pe, mp):
    out[c, beta, q] = sum of d over all slots whose photon ordinal
    pe*q' + mu(beta') <= pe*q + mu(beta).  This IS materialize_rows'
    cumsum + pe relayout in one kernel, provided the caller scattered
    each object's delta at plane beta(j0 % pe), lane j0 // pe.

    mxu=True (default) runs the in-block scans as triangular matmuls
    on the MXU (see _kernel_slot_mxu); mxu=False keeps the VPU
    log-shift formulation.  blkq=None sizes lane blocks by slot_blkq
    (constant VMEM budget across pe)."""
    C, pe, mp = d.shape
    if blkq is None:
        blkq = slot_blkq(pe)
    if pe != pair * share or mp % blkq:
        raise ValueError(f"shape {d.shape} vs pair={pair} share={share}"
                         f" blkq={blkq}")
    # plane beta = h*share + r holds member mu = pair*r + h; sort
    # planes by mu for the cross-plane suffix
    beta_order = tuple((mu % pair) * share + (mu // pair)
                       for mu in range(pe))
    if mxu:
        gblk = blkq // 128
        d4 = d.reshape(C, pe, mp // 128, 128)
        blk4 = pl.BlockSpec((C, pe, gblk, 128), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_slot_mxu, gblk=gblk,
                              beta_order=beta_order),
            grid=(mp // blkq,),
            in_specs=[blk4],
            out_specs=blk4,
            out_shape=jax.ShapeDtypeStruct(d4.shape, d.dtype),
            scratch_shapes=[pltpu.VMEM((C, pe, 1), d.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * C * pe * mp * 128,
                bytes_accessed=2 * 4 * C * pe * mp,
                transcendentals=0),
            interpret=interpret,
        )(d4)
        return out.reshape(C, pe, mp)
    grid = (mp // blkq,)
    blk = pl.BlockSpec((C, pe, blkq), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_slot, blkq=blkq,
                          beta_order=beta_order),
        grid=grid,
        in_specs=[blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((C, pe, mp), d.dtype),
        scratch_shapes=[pltpu.VMEM((C, pe, 1), d.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=3 * C * pe * mp, bytes_accessed=2 * 4 * C * pe * mp,
            transcendentals=0),
        interpret=interpret,
    )(d)


def size_ok(n: int) -> bool:
    """Pooled-batch sizes amortize the pallas_call overhead; small
    test batches stay on the XLA cumsum."""
    return n >= (1 << 18) and n % _BLK == 0


def slot_size_ok(batch_size: int, pe: int, blkq: int = None) -> bool:
    """scan_slot_prefix dispatch test: pooled-batch scale and an
    mp = batch_size/pe that tiles into whole lane blocks."""
    if blkq is None:
        blkq = slot_blkq(pe)
    return (pe > 1 and batch_size >= (1 << 18)
            and batch_size % pe == 0
            and (batch_size // pe) % blkq == 0)


def align_batch(batch_size: int, pair: int, share: int,
                blkq: int = None) -> int:
    """Round a pooled batch size UP so slot_size_ok holds.

    pooled_plan sizes batches as ceil(total/nb) rounded to pe — which
    almost never tiles into whole (pe, blkq) lane blocks, silently
    dropping production onto the XLA cumsum fallback (~180 ms/batch
    slower at 18.7M photons, measured r5).  Rounding up to pe*blkq
    costs at most pe*blkq-1 weight-0 padded photons per batch (~0.2%
    of a pooled batch) and keeps the one-pass Pallas materialization
    engaged.  Below the kernel's 2^18 dispatch threshold the size is
    returned unchanged."""
    pe = max(pair, 1) * max(share, 1)
    if pe <= 1 or batch_size < (1 << 18):
        return batch_size
    q = pe * (slot_blkq(pe) if blkq is None else blkq)
    return -(-batch_size // q) * q
