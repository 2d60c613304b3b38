"""Electronics readout chain: eimage -> per-amp raw images (device).

Parity with imsim/readout.py CcdReadout.build_amp_images (:413-477):
bleed -> dark current -> amp segmentation / gain / readout flips ->
crosstalk -> prescan/overscan embed -> CTE -> bias + read noise.

TPU-first formulation:
  * crosstalk is one (16,16) x (16,H,W) einsum on the MXU
  * CTE (the matrices the reference builds at imsim/readout.py:163-205
    and applies column-by-column in Python) runs in its exact BANDED
    form: the CTI matrix's band shrinks factorially, so ~7 per-row
    multiply-adds of shifted slices replace each dense npix^2 matmul
    at identical f32 output
  * bleed is a bounded-iteration charge diffusion (clamp + push excess to
    neighbors), charge-conserving like imsim/bleed_trails.py, with the
    bottom-edge escape and the E2V midline stop
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special as _sp

from .camera import CCD, VENDOR_SPECS


def cte_matrix(npix: int, cti: float, ntransfers: int = 20) -> np.ndarray:
    """Charge-transfer-inefficiency matrix: q_out = M @ q_in.

    Same math as imsim/readout.py:163-205: diagonal (1-cti)^i; off-diagonal
    binom(i-1, i-j) (1-cti)^j cti^(i-j) for the trailing charge."""
    M = np.zeros((npix, npix))
    i = np.arange(1, npix + 1)
    M[i - 1, i - 1] = (1.0 - cti) ** i
    for ii in range(1, npix + 1):
        jmin = max(1, ii - ntransfers)
        j = np.arange(jmin, ii)
        M[ii - 1, jmin - 1:ii - 1] = (
            _sp.binom(ii - 1, ii - j) * (1.0 - cti) ** j
            * cti ** (ii - j))
    return M


def cte_bands(npix: int, cti: float, nband: int = None) -> np.ndarray:
    """(nband+1, npix) banded form of cte_matrix: bands[k, p] = M[p, p-k].

    The CTI matrix is a lower-triangular band whose width shrinks
    factorially (term k ~ (npix*cti)^k / k!; at cti = 1e-6 the k = 4
    term is < 1e-12 relative), so the readout applies it as nband+1
    per-row multiply-adds of shifted slices instead of a dense
    npix^2 matmul — same result to f32 precision at a tiny fraction of
    the flops/memory (measured equivalence in tests/test_readout.py).

    nband=None (default) sizes the band from npix*cti at construction:
    grow until the next term's bound (npix*cti)^k / k! drops below f32
    epsilon relative to the diagonal, so user-configured cti values far
    above the nominal ~1e-6 (e.g. 1e-4 on 2050-pixel transfers, where
    npix*cti ~ 0.2 keeps terms alive past band 6) still match the
    dense matrix instead of silently truncating."""
    if nband is None:
        x = npix * abs(cti)
        nband, term = 1, x
        while term > 1.2e-7 and nband < npix - 1:
            nband += 1
            term *= x / nband
        nband = max(nband, 2)
    i = np.arange(1, npix + 1, dtype=np.float64)
    bands = np.zeros((nband + 1, npix))
    bands[0] = (1.0 - cti) ** i
    for k in range(1, nband + 1):
        val = _sp.binom(i - 1, k) * (1.0 - cti) ** (i - k) * cti ** k
        val[i - k < 1] = 0.0
        bands[k] = val
    return bands


def apply_cte_bands(raw, bands, axis: int):
    """out[..., p, ...] = sum_k bands[k, p] * raw[..., p-k, ...] along
    `axis` (the banded q_out = M q_in)."""
    nb = bands.shape[0]
    npix = raw.shape[axis]
    out = None
    for k in range(nb):
        if k == 0:
            shifted = raw
        else:
            pad = [(0, 0)] * raw.ndim
            pad[axis] = (k, 0)
            shifted = jnp.pad(
                jax.lax.slice_in_dim(raw, 0, npix - k, axis=axis), pad)
        coef_shape = [1] * raw.ndim
        coef_shape[axis] = npix
        term = shifted * bands[k].reshape(coef_shape)
        out = term if out is None else out + term
    return out


def _bleed_first_runs(v, fw):
    """Process the FIRST remaining saturated run of every column with the
    reference's exact alternating outward fill (bleed_trails.py:96-152):
    charge walks out from the run boundaries at increasing distance j,
    visiting below(j) then above(j), filling each visited pixel to full
    well; below the bottom edge each step swallows one full-well's worth
    (escape); above the top edge nothing absorbs; the walk is bounded at
    max(y0, H-y1) steps.  A visited pixel that is itself above full well
    (a later saturated run) is clamped to full well and its surplus joins
    the walking charge -- the min(fw - v, excess) arithmetic of
    BleedCharge.__call__ with a negative capacity, reproduced by the
    unclamped (fw - v) capacity here.

    Vectorized across columns with no per-run loop: every pixel outside
    the run maps to a unique index k in the interleaved visit order
    (below j -> k=2j-2, above j -> k=2j-1); a cumulative-capacity scan
    over k finds where the walking charge runs out, and each pixel
    reads its own fate (full / partial / untouched) from that ordering.
    """
    H, W = v.shape
    idx = jnp.arange(H, dtype=jnp.int32)[:, None]        # (H, 1)
    mask = v > fw
    has = mask.any(axis=0)                               # (W,)
    y0 = jnp.argmax(mask, axis=0).astype(jnp.int32)      # first saturated
    after = (~mask) & (idx >= y0[None, :])
    y1 = jnp.where(after.any(axis=0),
                   jnp.argmax(after, axis=0), H).astype(jnp.int32)
    in_run = (idx >= y0[None, :]) & (idx < y1[None, :])
    E = jnp.sum(jnp.where(in_run, v - fw, 0.0), axis=0)  # (W,) excess
    v = jnp.where(in_run, fw, v)

    # interleaved capacity array over visit order k = 0..2H-1
    k2 = jnp.arange(2 * H, dtype=jnp.int32)[:, None]     # (2H, 1)
    is_below = (k2 % 2) == 0
    j = jnp.where(is_below, k2 // 2 + 1, (k2 + 1) // 2)  # step distance
    tgt = jnp.where(is_below, y0[None, :] - j, y1[None, :] + j - 1)
    dy_max = jnp.maximum(y0, H - y1)[None, :]
    vt = jnp.take_along_axis(v, jnp.clip(tgt, 0, H - 1), axis=0)
    ci = jnp.where(j > dy_max, 0.0,
                   jnp.where(is_below & (tgt < 0), fw,
                             jnp.where(~is_below & (tgt >= H), 0.0,
                                       fw - vt)))
    cum = jnp.cumsum(ci, axis=0)
    # first k where the walk's cumulative absorption reaches E (cummax
    # guards the non-monotonic negative-capacity case)
    reached = jax.lax.cummax(cum, axis=0) >= E[None, :]
    stop = jnp.where(reached.any(axis=0),
                     jnp.argmax(reached, axis=0), 2 * H).astype(jnp.int32)

    # per-pixel fate from its own interleave index
    jb = y0[None, :] - idx                    # below step (valid idx<y0)
    ja = idx - y1[None, :] + 1                # above step (valid idx>=y1)
    k_pix = jnp.where(idx < y0[None, :], 2 * jb - 2, 2 * ja - 1)
    cum_prev = jnp.take_along_axis(
        cum - ci, jnp.clip(k_pix, 0, 2 * H - 1), axis=0)
    partial = jnp.maximum(E[None, :] - cum_prev, 0.0)
    out = jnp.where(k_pix < stop[None, :], fw,
                    jnp.where(k_pix == stop[None, :], v + partial, v))
    return jnp.where(has[None, :], out, v)


@partial(jax.jit, static_argnames=("midline_stop", "niter"))
def bleed_image(image, full_well, midline_stop: bool = False,
                niter: int = 0):
    """Charge bleeding along columns (y) -- the reference's algorithm
    (imsim/bleed_trails.py:26-153) semantics exactly: per saturated run,
    clamp to full well and walk the excess outward, alternating one
    pixel below / one pixel above per distance step, filling each to
    full well; charge escapes off the bottom edge only (one full-well
    per step), never off the top.  Runs are processed in ascending-y
    order per column (the reference's end_points ordering) by iterating
    "first remaining run" to a fixed point; columns are independent and
    processed in parallel.  Value-level equivalence against the
    reference module itself is asserted in tests/test_readout.py
    (synthetic + the neg_pixel_bleed.pickle cases).  niter is accepted
    for API compatibility.
    """
    H, W = image.shape

    if midline_stop:
        top = bleed_image(image[: H // 2], full_well, False)
        bot = bleed_image(image[H // 2:], full_well, False)
        return jnp.concatenate([top, bot], axis=0)

    fw = jnp.asarray(full_well, image.dtype)

    def cond(v):
        return (v > fw).any()

    return jax.lax.while_loop(cond, lambda v: _bleed_first_runs(v, fw),
                              image)


def segment_image(image, vendor: str):
    """CCD image (ny, nx) -> (n_amps, amp_ny, amp_nx) in readout order,
    matching the Amp.raw_flip conventions in electronics.camera: E2V
    reads the bottom row (C00-C07) unflipped and the top row (C10-C17)
    flipped in both axes; ITL serial registers all read the same way,
    so every ITL segment is x-flipped (top row additionally y-flipped).
    Half-height wavefront sensors (ITL_WF) carry only the bottom row."""
    spec = VENDOR_SPECS[vendor]
    anx, any_ = spec["amp_nx"], spec["amp_ny"]
    ny, nx = image.shape
    bottom = image[:any_].reshape(any_, 8, anx).transpose(1, 0, 2)
    if vendor.startswith("ITL"):
        bottom = bottom[:, :, ::-1]    # raw_flip_x
    if vendor == "ITL_WF":
        return bottom
    top = image[ny - any_:].reshape(any_, 8, anx).transpose(1, 0, 2)
    top = top[:, ::-1, ::-1]           # raw_flip_x + raw_flip_y
    return jnp.concatenate([bottom, top], axis=0)


def unsegment_image(amps, vendor: str, ny: int, nx: int):
    """Inverse of segment_image (used by tests and the DM-style reassembly)."""
    spec = VENDOR_SPECS[vendor]
    anx, any_ = spec["amp_nx"], spec["amp_ny"]
    bottom = amps[:8]
    if vendor.startswith("ITL"):
        bottom = bottom[:, :, ::-1]
    bottom = bottom.transpose(1, 0, 2).reshape(any_, 8 * anx)
    img = jnp.zeros((ny, nx), amps.dtype)
    img = img.at[:any_].set(bottom)
    if vendor != "ITL_WF":
        top = amps[8:][:, ::-1, ::-1].transpose(1, 0, 2).reshape(
            any_, 8 * anx)
        img = img.at[ny - any_:].set(top)
    return img


@partial(jax.jit, static_argnames=("vendor", "midline_stop",
                                   "exptime", "readout_time"))
def readout_chain(key, image, gains, xtalk, bias_levels, read_noises,
                  pcte, scte, vendor: str, full_well,
                  midline_stop: bool, dark_current: float = 0.02,
                  exptime: float = 30.0, readout_time: float = 2.0):
    """Full device-side readout: returns (16, raw_ny, raw_nx) float32 ADU
    (caller rounds to int32 for FITS)."""
    spec = VENDOR_SPECS[vendor]
    anx, any_ = spec["amp_nx"], spec["amp_ny"]
    pre, sos, pos = (spec["prescan"], spec["serial_oscan"],
                     spec["parallel_oscan"])
    raw_nx = pre + anx + sos
    raw_ny = any_ + pos

    k_dark, k_read = jax.random.split(key)

    # 1. bleed
    image = bleed_image(image, full_well, midline_stop)

    # 2. dark current (Poisson; small mean -> exact sampling)
    dark_time = exptime + readout_time
    image = image + jax.random.poisson(
        k_dark, dark_current * dark_time, image.shape).astype(image.dtype)

    # 3. segmentation + flips, 4. gains
    amps = segment_image(image, vendor)                      # (16, any, anx)
    amps = amps / gains[:, None, None]

    # 5. crosstalk: out_i = amp_i + sum_j xtalk[i, j] amp_j  (MXU einsum)
    amps = amps + jnp.einsum("ij,jhw->ihw", xtalk.astype(amps.dtype), amps,
                             preferred_element_type=jnp.float32)

    # 6. embed in raw bounds (prescan columns, parallel overscan rows)
    raw = jnp.zeros((amps.shape[0], raw_ny, raw_nx), amps.dtype)
    raw = raw.at[:, :any_, pre:pre + anx].set(amps)

    # 7. CTE: banded per-row multiply-adds (see cte_bands) — parallel
    # along columns (axis 1), serial along rows (axis 2)
    raw = apply_cte_bands(raw, pcte.astype(raw.dtype), axis=1)
    raw = apply_cte_bands(raw, scte.astype(raw.dtype), axis=2)

    # 8. bias + read noise
    noise = jax.random.normal(k_read, raw.shape, raw.dtype)
    raw = raw + bias_levels[:, None, None] + noise * read_noises[:, None, None]
    return raw


class CcdReadout:
    """Host orchestrator: camera parameters + device chain + HDU assembly
    (imsim/readout.py:323-526 equivalent)."""

    def __init__(self, ccd: CCD, readout_time=2.0, dark_current=0.02,
                 scti=1e-6, pcti=1e-6, full_well=None, read_noise=None,
                 bias_level=None):
        self.ccd = ccd
        spec = VENDOR_SPECS[ccd.vendor]
        self.readout_time = readout_time
        self.dark_current = dark_current
        self.full_well = full_well if full_well is not None else ccd.full_well
        raw_nx = spec["prescan"] + spec["amp_nx"] + spec["serial_oscan"]
        raw_ny = spec["amp_ny"] + spec["parallel_oscan"]
        self.pcte = jnp.asarray(cte_bands(raw_ny, pcti), jnp.float32)
        self.scte = jnp.asarray(cte_bands(raw_nx, scti), jnp.float32)
        amps = [ccd[a] for a in ccd.amp_names]
        self.gains = jnp.asarray([a.gain for a in amps], jnp.float32)
        self.read_noises = jnp.asarray(
            [read_noise if read_noise is not None else a.read_noise
             for a in amps], jnp.float32)
        self.bias_levels = jnp.asarray(
            [bias_level if bias_level is not None else a.bias_level
             for a in amps], jnp.float32)
        self.xtalk = jnp.asarray(ccd.xtalk, jnp.float32)

    def run(self, key, eimage, exptime=30.0):
        """eimage (ny, nx) electrons -> (16, raw_ny, raw_nx) int32 ADU."""
        raw = readout_chain(
            key, eimage, self.gains, self.xtalk, self.bias_levels,
            self.read_noises, self.pcte, self.scte, self.ccd.vendor,
            float(self.full_well),
            VENDOR_SPECS[self.ccd.vendor]["midline_bleed_stop"],
            self.dark_current, float(exptime), self.readout_time)
        return jnp.round(raw).astype(jnp.int32)
