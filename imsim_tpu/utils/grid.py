"""Coarse-grid evaluation helpers for smooth full-frame fields.

Several per-CCD maps (vignetting, tree-ring displacement) are smooth at
the tens-of-pixels scale but were historically evaluated per pixel —
16.7M evaluations per 4K CCD.  Evaluating on a stride-`step` grid and
bilinearly upsampling is exact to O((step * f'')^2) and turns the host
cost into (H/step)*(W/step) evaluations.  The upsample runs under
either numpy (host map assembly) or jax.numpy (fused into the consuming
device op).
"""
from __future__ import annotations

import numpy as np


def coarse_shape(shape, step: int):
    """Coarse-grid shape covering `shape` with one sample beyond each
    edge so the bilinear stencil never reads out of range."""
    H, W = shape
    return (H - 1) // step + 2, (W - 1) // step + 2


def upsample_bilinear(xp, g, shape, step: int):
    """Bilinearly upsample a coarse (gh, gw) grid sampled at pixel
    coordinates (i*step, j*step) onto the full (H, W) = `shape` frame.

    Fine index k reads coarse slots floor(k/step), floor(k/step)+1 —
    contiguous row reads, so the op is bandwidth-cheap under both numpy
    and XLA.  Requires g to satisfy coarse_shape(shape, step)."""
    H, W = shape
    if step <= 1:
        return g[:H, :W]

    def up(gg, n, axis):
        f = xp.arange(n, dtype=xp.float32) * (1.0 / step)
        i0 = xp.floor(f).astype(np.int32)
        w = (f - i0).astype(gg.dtype)
        g0 = xp.take(gg, i0, axis=axis)
        g1 = xp.take(gg, i0 + 1, axis=axis)
        wshape = [1, 1]
        wshape[axis] = n
        w = w.reshape(wshape)
        return g0 * (1 - w) + g1 * w

    return up(up(g, W, 1), H, 0)
