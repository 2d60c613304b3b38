"""Pooled-photon CCD builder: classify -> FFT pass -> pooled photon pass
-> sky/noise, with checkpoint/resume.

This is the flagship image builder, the TPU re-design of
imsim/photon_pooling.py (LSST_PhotonPoolingImageBuilder):

  reference                               here
  ---------                               ----
  partition FFT/PHOT/FAINT (:356-386)     classify_objects (host, vector)
  bright flux split 1/nbatch (:279-304)   strided photon->batch interleave
                                          (each object's photons spread
                                          uniformly across batches)
  faint realized in one batch (:305-313)  Poisson-realized counts pooled
                                          with everything else
  merge_photon_arrays (:177-192)          object-major index array; ONE
                                          row-gather feeds the whole batch
  photon_ops loop (:154-155)              fused jit chain (render.shoot /
                                          render.shoot_full)
  sensor.accumulate(resume, recalc)       sensor.silicon.accumulate_silicon
    every nsubbatch (:195-225)            nsub recalc cadence inside jit
  checkpoint per batch (:415-466)         io.checkpoint per batch
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..io.checkpoint import Checkpointer
from ..photons import profiles as P
from ..sensor.silicon import SiliconParams, accumulate_silicon
from ..sensor.simple import accumulate
from ..utils.rng import stream
from . import fft_render as F
from . import render
from .scene import COL_TYPE, SceneHost

FFT, PHOT, FAINT = 0, 1, 2


@dataclasses.dataclass
class PoolingConfig:
    xsize: int = 4096
    ysize: int = 4096
    exptime: float = 30.0
    nbatch: int = 8
    batch_size: int = 8_000_000
    nsub: int = 4                 # BF recalc cadence inside a batch
    faint_thresh: float = 100.0   # photons: FAINT below this
    fft_sb_thresh: float = 0.0    # e-/pixel peak; 0 disables FFT branch
    pixel_scale: float = 0.2
    fwhm: float = 0.8
    gauss_fwhm: float = 0.3
    nbatch_per_checkpoint: int = 1
    # pupil/time/screen-sample sharing factor (block-paired layout,
    # build_obj_map): the `pair` members of a pair share one pupil
    # point, arrival time and phase-screen gather; each keeps its own
    # wavelength, profile offset, DCR, diffraction draw and sensor
    # randomness.  Screen gathers are the hot path's dominant cost
    # (~8.6 ns/photon/layer), so 4 cuts them 4x.  Statistically
    # validated in tests/test_pairing.py + benchmarks/pair_experiment.py:
    # pair=4 matches pair=1 delivered-PSF moments and per-pixel Poisson
    # variance; pair=8 doubles the speckle size dispersion, so don't.
    pupil_pairing: int = 4
    # weak-layer screen-draw sharing factor ON TOP of pupil_pairing
    # (stratified first kick, psf.atmosphere.first_kick_angles): layers
    # below the strong-cumulative-weight cut share one gather among
    # pair*screen_share adjacent photons.  The strong layers (~80% of
    # the deflection variance) keep pair-granularity sampling, so the
    # delivered-PSF dispersion stays at the pair=4 level while the
    # first-kick gather count halves (benchmarks/pair_experiment.py,
    # tests/test_pairing.py).
    screen_share: int = 4
    # ChromaticAtmosphere scaling of the screen (first-kick) PSF:
    # kick *= (lambda/wl_ref)^chromatic_exponent per photon
    # (imsim/atmPSF.py:298-318, atm_psf.exponent; -0.3 = Kolmogorov)
    chromatic_exponent: float = -0.3
    wl_ref: float = 622.0
    # per-pixel noise variance (sky counts): sets the stamp-sizing
    # folding threshold noise_var/flux (imsim/stamp_utils.py:119-144)
    noise_var: float = 0.0
    # optional override of the fast-path isotropic PSF radial table
    # (DoubleGaussianPSF / KolmogorovPSF fallback families,
    # imsim/atmPSF.py:448-538)
    psf_table: object = None
    # the stamp.photon_ops config surface: PhotonDCR presence,
    # RubinDiffraction[Optics] presence, and disable_field_rotation
    # (imsim/photon_ops.py:184,231-250)
    apply_dcr: bool = True
    apply_diffraction: bool = True
    diffraction_field_rotation: bool = True
    # stamp.method == 'fft': render every FFT-capable object through
    # the Fourier branch regardless of peak brightness
    # (imsim/stamp.py:270-286 method override); faint objects keep the
    # simplified-photon path (they carry < max_flux_simple photons).
    force_fft: bool = False


def classify_objects(host: SceneHost, cfg: PoolingConfig,
                     psf_mtf=None) -> np.ndarray:
    """Vectorized mode partition (imsim/photon_pooling.py:356-386 runs
    the stamp classifier per object; here it's one array pass).

    Extended objects (Sersic/knots) can also trigger the FFT branch —
    the reference's classifier evaluates the realized stamp peak for
    ANY type (imsim/stamp.py:356-386): their point-approximation peak
    is corrected by the galaxy's convolution suppression factor
    (fft_render.galaxy_peak_factor), evaluated only for the few
    candidates whose point-peak already exceeds the threshold."""
    from ..catalog.instcat import KNOTS, SERSIC
    from .scene import COL_P0, COL_P1

    modes = np.full(host.n_objects, PHOT, np.int8)
    modes[host.flux[:host.n_objects] < cfg.faint_thresh] = FAINT
    if cfg.force_fft:
        obj_type = np.asarray(host.scene.obj_type)[:host.n_objects]
        capable = ((obj_type == 0) | (obj_type == SERSIC)
                   | (obj_type == KNOTS))
        modes[(modes == PHOT) & capable] = FFT
        return modes
    if cfg.fft_sb_thresh > 0 and psf_mtf is not None:
        peak = F.peak_surface_brightness(host.flux[:host.n_objects],
                                         psf_mtf, cfg.pixel_scale)
        obj_type = np.asarray(host.scene.obj_type)[:host.n_objects]
        cand = peak > cfg.fft_sb_thresh
        modes[cand & (obj_type == 0)] = FFT
        params = np.asarray(host.scene.params)[:host.n_objects]
        for i in np.nonzero(cand & ((obj_type == SERSIC)
                                    | (obj_type == KNOTS)))[0]:
            n_s = 1.0 if obj_type[i] == KNOTS else params[i, COL_P1]
            fac = F.galaxy_peak_factor(psf_mtf, n_s, params[i, COL_P0])
            if peak[i] * fac > cfg.fft_sb_thresh:
                modes[i] = FFT
    return modes


def make_strided_batches(host: SceneHost, modes, cfg: PoolingConfig):
    """Photon->(batch, slot) assignment with bright-object flux spread
    across all batches (the 1/nbatch split of photon_pooling.py:279-304,
    realized exactly by striding the object-major photon list).

    Host-side variant kept for tests; the production path computes the
    same assignment ON DEVICE from the cumulative counts (see
    batch_obj_assignment) so no 100+ MB index array crosses the host
    boundary per batch."""
    sel = modes != FFT
    counts = np.where(sel, host.flux[:host.n_objects], 0).astype(np.int64)
    obj_of_photon = np.repeat(
        np.arange(host.n_objects, dtype=np.int32), counts)
    total = len(obj_of_photon)
    if total == 0:
        return
    nb = pick_nbatch(total, cfg)
    for b in range(nb):
        sl = obj_of_photon[b::nb]
        size = int(np.ceil(total / nb))
        idx = np.full(size, host.scene.n - 1, np.int32)
        w = np.zeros(size, np.float32)
        idx[:len(sl)] = sl
        w[:len(sl)] = 1.0
        yield jnp.asarray(idx), jnp.asarray(w)


def pick_nbatch(total: int, cfg: PoolingConfig) -> int:
    """At least enough batches that each fits batch_size; at least
    cfg.nbatch (the BF-recalc/checkpoint granularity) when there are
    enough photons to make that meaningful."""
    need = max(-(-total // cfg.batch_size), 1)
    return max(need, min(cfg.nbatch, max(total, 1)))


def batch_obj_assignment(cum_counts, total, b, nb, batch_size):
    """Device-side strided photon->object map for batch b of nb:
    global photon index g = b + nb*slot; object = the bin of g in the
    cumulative per-object counts (binary search instead of a host
    np.repeat + 134 MB transfer per batch).  int32 throughout: valid to
    2^31 photons per CCD."""
    s = jnp.arange(batch_size, dtype=jnp.int32)
    g = b + nb * s
    alive = g < total
    obj = jnp.searchsorted(cum_counts, g, side="right").astype(jnp.int32)
    obj = jnp.minimum(obj, cum_counts.shape[0] - 1)
    return obj, alive.astype(jnp.float32)


def member_offsets(pair: int, share: int):
    """Ordinal offsets of the two-level block layout's members.

    The layout splits each batch into pair*share member blocks of
    m' = batch_size // (pair*share) slots.  Slot block beta = h*share + r
    (h in [0,pair), r in [0,share)) holds photon ordinals
    j = (pair*share)*q + pair*r + h at within-block position q.  This
    makes BOTH sharing granularities free outer-dim layout ops:

      * pair mates (one pupil/time/strong-screen draw) sit at slots
        {k, k+m, ...} with m = batch_size//pair — member 0 of every
        pair is the contiguous slice [:m], broadcast = reshape;
      * share groups (one weak-layer screen draw, see
        psf.atmosphere.first_kick_angles) sit within that slice at
        {q, q+m', ...} — representatives are the slice [:m'],
        broadcast = reshape.

    share=1 reduces to the round-2 block-paired layout (offsets = h).
    """
    return np.array([pair * r + h
                     for h in range(pair) for r in range(share)],
                    np.int32)


def build_obj_map(cum_counts, total, nb, batch_size, pair: int = 1,
                  share: int = 1):
    """(batch_size, nb) int32 photon->object map for a whole visit,
    built ONCE on device, so each batch's assignment is a contiguous
    column slice instead of a 17-step binary search (TPU random gathers
    run at ~0.1 G/s — searchsorted per batch cost ~1.7 s of the 7.4 s
    batch budget).

    Construction is scatter + cummax: object i's first photon index
    (cum[i-1]) receives value i; a max-scan fills the gaps.  Both are
    single streaming HBM passes.

    pair > 1 selects the BLOCK-PAIRED slot layout: slot s = h*m + k
    (m = batch_size // pair) holds the batch's photon ordinal
    j = pair*k + h, so the `pair` slots {k, k+m, ..., k+(pair-1)m} hold
    ADJACENT global photons (almost always the same object).  Pairs can
    then share one pupil/time/screen-gather draw with FREE layout ops:
    member 0 of every pair is the contiguous slice [:m] and the
    broadcast back is reshape((pair, m) -> n) — measured 6x faster than
    the interleaved jnp.repeat pairing, whose lane-crossing shuffle
    re-runs inside every consumer fusion (~200 ms per repeated array
    per 16.7M-photon batch on v5e).
    """
    n_total = batch_size * nb
    starts = jnp.concatenate([jnp.zeros((1,), cum_counts.dtype),
                              cum_counts[:-1]])
    n_obj = cum_counts.shape[0]
    marks = jnp.zeros((n_total,), jnp.int32)
    marks = marks.at[starts].max(
        jnp.arange(n_obj, dtype=jnp.int32), mode="drop")
    obj_flat = jax.lax.cummax(marks)
    # dead tail (>= total) points at the last (padded) object
    g = jnp.arange(n_total, dtype=jnp.int32)
    obj_flat = jnp.where(g < total, obj_flat, n_obj - 1)
    if pair == 1 and share == 1:
        # global index g = b + nb*s  ->  obj_map[s, b]
        return obj_flat.reshape(batch_size, nb)
    # g = b + nb*j with j = (pair*share)*q + pair*r + h
    #   -> obj_flat.reshape(m', share, pair, nb)[q, r, h, b];
    # slot layout wants [(h*share + r)*m' + q, b]: one transpose,
    # once per visit (see member_offsets)
    mp = batch_size // (pair * share)
    return obj_flat.reshape(mp, share, pair, nb).transpose(
        2, 1, 0, 3).reshape(batch_size, nb)


def batch_from_obj_map(obj_map, total, b, nb, batch_size, pair: int = 1,
                       share: int = 1):
    """Batch b's (obj_idx, weight) from the precomputed visit map:
    one strided column read + an iota compare (no random gathers)."""
    obj = jax.lax.dynamic_slice_in_dim(obj_map, b, 1, axis=1)[:, 0]
    if pair == 1 and share == 1:
        s = jnp.arange(batch_size, dtype=jnp.int32)
        alive = (b + nb * s) < total
    else:
        # slot beta*m' + q holds ordinal j = pair*share*q + off[beta]
        pe = pair * share
        mp = batch_size // pe
        q = jnp.arange(mp, dtype=jnp.int32)
        off = jnp.asarray(member_offsets(pair, share))
        j = (pe * q)[None, :] + off[:, None]
        alive = (b + nb * j.reshape(batch_size)) < total
    return obj, alive.astype(jnp.float32)


def materialize_rows(params, cum_counts, b, nb, batch_size,
                     pair: int = 1, share: int = 1):
    """(batch_size, C) per-photon object parameters WITHOUT the
    per-photon row-gather (the gather costs ~8.6 ns/photon on this TPU
    = ~280 ms per 16.7M-photon batch; this is two streaming passes).

    The photon->object map within a batch is non-decreasing in photon
    ordinal, so the per-photon parameter sequence is piecewise constant:
    scatter each object's DELTA row (params[i] - params[i-1]) at its
    first slot of batch b, then cumsum down the slot axis.  Objects
    entirely before the batch start telescope into slot 0; empty
    objects' deltas stack at the same slot — both exactly reproduce the
    gather.

    With pair*share > 1 (two-level block layout, see build_obj_map /
    member_offsets) the rows are materialized in ORDINAL order (photon
    ordinal j is object-major, so one scatter + one long cumsum exactly
    as the pair=1 case) and then reshaped/transposed into the slot
    layout: ordinal j = pe*q + a*pair + h lands at slot
    (h*share + a)*m' + q, i.e. reshape(m', share, pair, C) ->
    transpose(2, 1, 0, 3).  Measured on v5e this beats the previous
    per-member-block scatter (pe copies of the delta rows) by ~60 ms
    per 16.7M-photon batch at pair=4 — the scatter cost is per
    scattered ELEMENT (~pe * n_obj * C), while the transpose is one
    streaming relayout — and is flat in `share` (435 -> 173 ms at
    pair=4, share=4).

    f32 cumsum note: reconstruction error is bounded by the running
    cumsum rounding, ~1e-6 relative for ~0.01-rad field angles
    (< 0.05 pixel), well under the PSF scale; validated in
    tests/test_components.py.
    """
    C = params.shape[1]
    starts = jnp.concatenate([jnp.zeros((1,), cum_counts.dtype),
                              cum_counts[:-1]])
    # first photon ordinal of object i within batch b:
    # ceil((starts_i - b) / nb), clipped at 0
    j0 = jnp.maximum(-((b - starts) // nb), 0).astype(jnp.int32)
    deltas = params - jnp.concatenate(
        [jnp.zeros((1, C), params.dtype), params[:-1]])
    rows = jnp.zeros((batch_size, C), params.dtype)
    rows = rows.at[j0].add(deltas, mode="drop")
    rows = jnp.cumsum(rows, axis=0)
    pe = pair * share
    if pe == 1:
        return rows
    mp = batch_size // pe
    return rows.reshape(mp, share, pair, C).transpose(2, 1, 0, 3).reshape(
        batch_size, C)


def materialize_rows_T(params, cum_counts, b, nb, batch_size,
                       pair: int = 1, share: int = 1):
    """materialize_rows in the TRANSPOSED, photon-minor orientation:
    (C, batch_size) with photons on the TPU lane axis, slot layout.

    Every consumer reads the row matrix as per-photon COLUMN vectors
    (field angles, profile params, the Chebyshev wavelength
    coefficients one degree at a time), so (C, N) makes each read a
    contiguous full-lane slice; the (N, C=24) orientation pads 24
    lanes to 128 in every VREG and tile.

    On TPU at pooled sizes the whole reconstruction runs as ONE Pallas
    pass (ops/scanrows.scan_slot_prefix): the per-object deltas are
    scattered straight into the two-level slot planes (C, pe, mp) and
    the kernel resolves the ordinal-order prefix with per-plane lane
    scans + a same-lane cross-plane suffix — replacing XLA's ~24
    log-shift HBM passes for the cumsum AND the ~25-40 ms pe-relayout
    transpose (91 -> 31 ms per 16.7M x 24 batch on v5e, probe_rows).
    The XLA composition (materialize_rows + transpose) serves CPU
    meshes and small batches; IMSIM_TPU_NO_SCANROWS=1 forces it."""
    import os as _os

    from ..ops import scanrows

    pe = pair * share
    if not scanrows.slot_size_ok(batch_size, pe) \
            or _os.environ.get("IMSIM_TPU_NO_SCANROWS"):
        return materialize_rows(params, cum_counts, b, nb, batch_size,
                                pair, share).T

    def _xla(params, cum_counts, b):
        return materialize_rows(params, cum_counts, b, nb, batch_size,
                                pair, share).T

    from ..ops.scanrows import scan_slot_prefix

    def _slot(params, cum_counts, b):
        C = params.shape[1]
        starts = jnp.concatenate([jnp.zeros((1,), cum_counts.dtype),
                                  cum_counts[:-1]])
        j0 = jnp.maximum(-((b - starts) // nb), 0).astype(jnp.int32)
        deltasT = (params - jnp.concatenate(
            [jnp.zeros((1, C), params.dtype), params[:-1]])).T
        mu = j0 % pe
        beta = (mu % pair) * share + (mu // pair)
        mp = batch_size // pe
        d = jnp.zeros((C, pe, mp), params.dtype)
        d = d.at[:, beta, j0 // pe].add(deltasT, mode="drop")
        return scan_slot_prefix(d, pair, share).reshape(C, batch_size)

    return jax.lax.platform_dependent(params, cum_counts, b,
                                      tpu=_slot, default=_xla)


def make_psf_mtf(cfg: PoolingConfig):
    """PSF MTF table for classification/FFT stamps (None when the FFT
    branch is disabled)."""
    if cfg.fft_sb_thresh <= 0:
        return None
    r0_500 = 0.9758834 * 500e-9 / (cfg.fwhm * np.pi / 180 / 3600)
    return F.psf_mtf_table(622.0, r0_500, gauss_fwhm=cfg.gauss_fwhm)


def pooled_plan(host: SceneHost, modes, cfg: PoolingConfig):
    """The pooled pass's photon bookkeeping, shared by the serial loop
    and the mesh-sharded visit: per-object cumulative counts (FFT-mode
    objects excluded), total photons, batch count and padded batch size.

    Returns (cum int32 (scene.n,), total, nb, batch_size)."""
    sel = np.asarray(modes) != FFT
    counts = np.where(sel, host.flux[:host.n_objects], 0).astype(np.int64)
    total = int(counts.sum())
    if total >= 2 ** 31:
        # the pooled bookkeeping (cumulative counts, obj map, batch
        # ordinals) is int32 by design — a deliberate memory trade at
        # ~20x the nominal 1e8-photon visit.  Fail loudly instead of
        # wrapping around (a catalog normalization bug typically lands
        # here first).
        raise ValueError(
            f"visit photon total {total:.3e} exceeds the int32 pooled-"
            f"pass capacity (2.1e9 photons/CCD); check catalog "
            f"normalization or split the exposure into snaps")
    pair = max(cfg.pupil_pairing, 1)
    share = max(cfg.screen_share, 1) if pair > 1 else 1
    nb = pick_nbatch(total, cfg) if total > 0 else 1
    batch_size = int(np.ceil(max(total, 1) / nb))
    batch_size = -(-batch_size // (pair * share)) * (pair * share)
    # Pallas slot-scan alignment: without it ceil(total/nb) almost
    # never tiles into whole (pe, blkq) lane blocks and the row
    # materialization silently falls back to the XLA cumsum
    # (~180 ms/batch slower at production scale); padding is weight-0
    from ..ops.scanrows import align_batch
    batch_size = align_batch(batch_size, pair, share)
    cum = np.zeros(host.scene.n, np.int32)
    if host.n_objects:
        cum[:host.n_objects] = np.cumsum(counts)
        cum[host.n_objects:] = cum[host.n_objects - 1]
    return cum, total, nb, batch_size


def render_ccd_pooled(seed: int, host: SceneHost, cfg: PoolingConfig,
                      silicon: SiliconParams | None = None,
                      tel=None, ctx=None, screens=None, sk_table=None,
                      checkpointer: Checkpointer | None = None,
                      checkpoint_key: str = "pooled", spikes=None,
                      track_realized: bool = False, fft_vign=None,
                      logger=None):
    """Render one CCD eimage.  With (tel, ctx) the full optics chain is
    used (render.shoot_full); otherwise the analytic Kolmogorov*Gaussian
    fast path (render.shoot).  With `silicon` the BF/tree-ring/diffusion
    sensor accumulates; else the simple binner."""
    kolm = P.kolmogorov_cdf()
    kolm_as = cfg.psf_table if cfg.psf_table is not None else \
        dataclasses.replace(kolm, y=kolm.y * cfg.fwhm)
    gauss_sigma = cfg.gauss_fwhm / 2.3548200450309493
    psf_mtf = make_psf_mtf(cfg)

    modes = classify_objects(host, cfg, psf_mtf)
    image = jnp.zeros((cfg.ysize, cfg.xsize), jnp.float32)
    # per-object realized flux accumulated across batches (the pooled
    # truth accumulation of imsim/photon_pooling.py:472-507)
    realized = np.zeros(host.scene.n, np.float64)
    start_batch = 0
    fft_done = False
    if checkpointer is not None:
        saved = checkpointer.load(checkpoint_key)
        if saved is not None:
            image = jnp.asarray(saved["image"])
            start_batch = saved["next_batch"]
            fft_done = saved.get("fft_done", False)
            realized = saved.get("realized", realized)
            if logger:
                logger.info("resumed at batch %d (fft_done=%s)",
                            start_batch, fft_done)

    # ---- FFT pass (bright stars) ----------------------------------------
    if not fft_done and start_batch == 0 and np.any(modes == FFT):
        image, fft_realized = _fft_pass(image, host, modes, cfg, psf_mtf,
                                        seed, spikes=spikes,
                                        vign=fft_vign, logger=logger)
        realized[:host.n_objects] += fft_realized
        fft_done = True
        if checkpointer is not None:
            # checkpoint the FFT stage so resume never redoes it
            # (the reference reruns it; imsim/lsst_image.py:307-321
            # checkpoints stamps — flagged in VERDICT as a gap)
            image.block_until_ready()
            checkpointer.save(checkpoint_key, dict(
                image=np.asarray(image), next_batch=0, fft_done=True,
                realized=realized))

    # ---- pooled photon pass ---------------------------------------------
    # ONE fused jit per batch: device-side photon->object assignment +
    # the whole physics chain + sensor accumulate.  Nothing crosses the
    # host boundary per batch but a handful of scalars.
    cum, total, nb, batch_size = pooled_plan(host, modes, cfg)
    if total == 0:
        return image, modes, realized
    pair = cfg.pupil_pairing
    share = max(cfg.screen_share, 1) if pair > 1 else 1
    obj_map = _build_obj_map_jit(jnp.asarray(cum), jnp.int32(total), nb,
                                 batch_size, pair, share)

    psf_tables = {"kolmogorov": dataclasses.replace(
        kolm_as, y=jnp.asarray(kolm_as.y)), "gauss_sigma": gauss_sigma}
    cum_dev = jnp.asarray(cum)
    # static tree-ring displacement field: computed ONCE per CCD and
    # folded into the continuity-form image update inside each batch
    # (sensor/silicon.py tree_ring_field — removes the per-photon
    # 40-sinusoid evaluation from the hot loop)
    tr_field = None
    if silicon is not None and silicon.tr_active:
        from ..sensor.silicon import tree_ring_field
        tr_field = tree_ring_field(silicon, (cfg.ysize, cfg.xsize))
    # object families actually present (host-known): the intrinsic
    # sampler drops absent families' branches from the compiled batch
    # program (a star/Sersic-only scene skips knot/streak trig + RNG)
    families = tuple(sorted(set(np.asarray(
        host.scene.params[:host.n_objects, COL_TYPE]).astype(int)
        .tolist())))
    for b in range(start_batch, nb):
        key = stream(seed, "photons", b)
        image, batch_realized = _pooled_batch_step(
            key, stream(seed, "si", b), host.scene, obj_map, cum_dev,
            jnp.int32(total), jnp.int32(b), nb, batch_size, tel, ctx,
            screens, sk_table, psf_tables["kolmogorov"],
            jnp.float32(gauss_sigma), silicon, image,
            cfg.exptime, cfg.pixel_scale, cfg.nsub, track_realized,
            pair, share, cfg.chromatic_exponent, cfg.wl_ref,
            cfg.apply_dcr, cfg.apply_diffraction,
            cfg.diffraction_field_rotation, tr_field=tr_field,
            families=families)
        if batch_realized is not None:
            realized += np.asarray(batch_realized, np.float64)
        if checkpointer is not None and \
                (b + 1) % cfg.nbatch_per_checkpoint == 0:
            image.block_until_ready()
            checkpointer.save(checkpoint_key, dict(
                image=np.asarray(image), next_batch=b + 1,
                fft_done=fft_done, realized=realized))
    return image, modes, realized


_build_obj_map_jit = jax.jit(build_obj_map,
                             static_argnames=("nb", "batch_size",
                                              "pair", "share"))


@partial(jax.jit, static_argnames=("nb", "batch_size", "exptime",
                                   "pixel_scale", "nsub",
                                   "track_realized", "pair", "share",
                                   "chromatic_exponent", "wl_ref",
                                   "apply_dcr", "apply_diffraction",
                                   "diffraction_field_rotation",
                                   "families"))
def _pooled_batch_step(key, si_key, scene, obj_map, cum, total, b, nb,
                       batch_size, tel, ctx, screens, sk_table,
                       kolm_table, gauss_sigma, silicon, image,
                       exptime, pixel_scale, nsub,
                       track_realized: bool = False, pair: int = 1,
                       share: int = 1,
                       chromatic_exponent: float = 0.0,
                       wl_ref: float = 622.0,
                       apply_dcr: bool = True,
                       apply_diffraction: bool = True,
                       diffraction_field_rotation: bool = True,
                       tr_field=None, families=None):
    obj_idx, weight = batch_from_obj_map(obj_map, total, b, nb,
                                         batch_size, pair, share)
    # per-photon params via scatter+cumsum instead of a row-gather;
    # the per-object wavelength-ICDF Chebyshev coefficients ride in the
    # same materialization (extra columns are ~free: the scatter+cumsum
    # cost is per streaming pass, and Horner eval replaces the ~13 ns
    # random wavelength gather per photon)
    mat = scene.params if scene.wl_cheb is None else jnp.concatenate(
        [scene.params, scene.wl_cheb], axis=1)
    row = None if cum is None else materialize_rows_T(
        mat, cum, b, nb, batch_size, pair, share)
    # fuse the image-independent silicon depth/diffusion displacement
    # into the photon chain (the Pallas ray-chain kernel on TPU)
    # whenever the downstream accumulate runs in 'image' BF mode and
    # tree rings are either folded as a static field or absent — the
    # per-chunk displacement stage then disappears entirely
    fuse_si = (silicon is not None and tel is not None
               and ctx is not None
               and (tr_field is not None or not silicon.tr_active))
    if tel is not None and ctx is not None:
        photons = render.shoot_full(
            key, scene, obj_idx, weight, tel, ctx, screens=screens,
            sk_table=sk_table, exptime=exptime, row=row,
            pupil_pairing=pair, screen_share=share,
            chromatic_exponent=chromatic_exponent, wl_ref=wl_ref,
            apply_dcr=apply_dcr, apply_diffraction=apply_diffraction,
            diffraction_field_rotation=diffraction_field_rotation,
            silicon=silicon if fuse_si else None, si_key=si_key,
            families=families)
    else:
        photons = render.shoot(
            key, scene, obj_idx, weight,
            {"kolmogorov": kolm_table, "gauss_sigma": gauss_sigma},
            exptime=exptime, pixel_scale=pixel_scale, row=row,
            families=families)
    realized = None
    if track_realized:
        # per-object incident flux (photon_pooling.py:472-507 truth
        # accumulation) — one extra scatter per batch, opt-in
        realized = jnp.zeros((scene.n,), jnp.float32).at[obj_idx].add(
            photons.flux, mode="drop")
    if silicon is not None:
        return accumulate_silicon(si_key, photons, image, silicon,
                                  nsub=nsub, tr_field=tr_field,
                                  pre_displaced=fuse_si), realized
    return accumulate(photons, image), realized


def _fft_pass(image, host: SceneHost, modes, cfg, psf_mtf, seed: int,
              spikes=None, vign=None, logger=None):
    """Render all FFT-mode objects, bucketed by stamp size.

    Per bucket (one fused device program each): batched MTF->irfft2
    stamps -> clip negatives -> saturation diffraction-spike overlay
    (imsim/stamp.py:520-521 order) -> Poisson noise (:522) -> ONE
    scan-based stamp add (no per-stamp full-frame copies).

    Stamp placement uses the objects' PIXEL positions (host.pix_x/y);
    COL_X/COL_Y hold field angles when the optics chain is active.
    Noise keys derive from the visit seed, not from flux values.

    vign: optional (n_objects,) vignetting factor applied to the FFT
    flux (the fft_flux scaling of imsim/psf_utils.py:152-239 — the
    photon path gets vignetting from the raytrace; FFT stamps take it
    as a flux factor).

    Returns (image, realized (n_objects,)) with realized = the flux
    actually added per object (stamp sums after noise/clipping —
    imsim/stamp.py:525 realized_flux semantics).
    """
    from ..catalog.instcat import KNOTS, SERSIC
    from .fft_render import lens_matrix, sersic_mtf_table
    from .scene import (COL_P0, COL_P1, COL_P2, COL_P3, COL_G1, COL_G2,
                        COL_MU)

    idx = np.nonzero(modes == FFT)[0]
    if logger:
        logger.info("FFT pass: %d objects", len(idx))
    params = np.asarray(host.scene.params)
    if host.pix_x is not None:
        xs_all = np.asarray(host.pix_x, float)
        ys_all = np.asarray(host.pix_y, float)
    else:
        xs_all = params[:host.n_objects, 0]
        ys_all = params[:host.n_objects, 1]
    obj_type = np.asarray(host.scene.obj_type)[:host.n_objects]
    flux = host.flux[:host.n_objects].astype(np.float64)
    if vign is not None:
        flux = flux * np.asarray(vign, float)
    realized = np.zeros(host.n_objects)
    H, W = image.shape
    # STARS: all share the PSF MTF, so the whole bright-star field is
    # ONE Fourier synthesis (fft_render.star_field_pass — a complex
    # matmul + one padded irfft2, cost independent of star count)
    star_ids = np.array([i for i in idx
                         if obj_type[i] not in (SERSIC, KNOTS)],
                        dtype=int)
    if len(star_ids):
        pad = max(F.stamp_bucket(flux[i], psf_mtf, cfg.pixel_scale,
                                 noise_var=cfg.noise_var)
                  for i in star_ids) // 2
        margin = 0
        kern = None
        sat = 0.0
        if spikes is not None:
            kern = spikes["kernel"]
            sat = float(spikes["sat"])
            margin = int(np.asarray(kern).shape[0]) // 2
        pad = max(pad, margin)
        Npad = F.good_fft_size(max(H, W) + 2 * pad)
        # fit residual ~1.3e-4 is the Airy table's own radial-binning
        # jitter (the fit smooths it); measured image-space impact is
        # ~1e-5 of the stellar peak
        cheb, k_max, cheb_err = F.mtf_cheb(psf_mtf)
        assert cheb_err < 5e-4, cheb_err
        xs = np.clip(xs_all[star_ids], -pad, W - 1 + pad)
        ys = np.clip(ys_all[star_ids], -pad, H - 1 + pad)
        image, r_star = F.star_field_pass(
            image, jnp.asarray(cheb), jnp.float32(k_max),
            jnp.asarray(flux[star_ids], jnp.float32),
            jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
            kern, jnp.float32(sat), stream(seed, "fftnoise", 0),
            Npad, H, W, pad, cfg.pixel_scale, margin)
        realized[star_ids] = np.asarray(r_star, float)

    # GALAXIES above the FFT threshold (rare): bucket by (stamp size,
    # Sersic index rounded) and ride the batched stamp kernel with the
    # unit-hlr MTF factor evaluated under the full lensing matrix
    buckets: dict[tuple, list[int]] = {}
    for i in idx:
        if obj_type[i] in (SERSIC, KNOTS):
            n_s = 1.0 if obj_type[i] == KNOTS else round(
                float(params[i, COL_P1]), 1)
            mtf_i = F.combined_mtf_table(psf_mtf, sersic_mtf_table(n_s),
                                         gal_scale=float(params[i, COL_P0]))
            N = F.stamp_bucket(flux[i], mtf_i, cfg.pixel_scale,
                               noise_var=cfg.noise_var)
            buckets.setdefault((N, n_s), []).append(i)
    for bucket_i, ((N, n_s), ids) in enumerate(sorted(
            buckets.items(), key=lambda kv: (kv[0][0], str(kv[0][1])))):
        B = len(ids)
        K = len(psf_mtf.y)
        mtf_y = np.broadcast_to(np.asarray(psf_mtf.y), (B, K)).copy()
        xs = xs_all[ids]
        ys = ys_all[ids]
        x0 = np.clip(np.floor(xs).astype(int) - N // 2, -N, W)
        y0 = np.clip(np.floor(ys).astype(int) - N // 2, -N, H)
        gal_kw = {}
        if n_s is not None:
            gt = sersic_mtf_table(n_s)
            p = params[ids]
            A = lens_matrix(p[:, COL_P2], p[:, COL_P3], p[:, COL_G1],
                            p[:, COL_G2], p[:, COL_MU], p[:, COL_P0])
            gal_kw = dict(
                gal_y=jnp.broadcast_to(jnp.asarray(gt.y),
                                       (B, len(gt.y))),
                gal_dx=float(gt.dx),
                gal_A=jnp.asarray(A, jnp.float32))
        stamps = F.render_fft_stamps(
            jnp.asarray(mtf_y), jnp.full((B,), psf_mtf.dx, jnp.float32),
            jnp.asarray(flux[ids], jnp.float32),
            jnp.ones((B,), jnp.float32), jnp.zeros((B,), jnp.float32),
            jnp.asarray(xs - np.floor(xs), jnp.float32),
            jnp.asarray(ys - np.floor(ys), jnp.float32),
            N, cfg.pixel_scale, **gal_kw)
        # FFT numerics can ring negative (imsim/stamp.py:518-519)
        stamps = jnp.maximum(stamps, 0.0)
        if spikes is not None:
            from .diffraction_fft import apply_spikes

            stamps = apply_spikes(stamps, spikes["kernel"],
                                  jnp.float32(spikes["sat"]))
        # Poisson noise on FFT stamps (stamp.py:522 adds PoissonNoise),
        # keyed by the visit seed + bucket (never by flux values);
        # bucket 0 of the stream is the star field's key
        key = stream(seed, "fftnoise", 1 + bucket_i)
        from ..utils.rng import poisson_approx

        stamps = poisson_approx(key, stamps)
        realized[ids] = np.asarray(stamps.sum(axis=(1, 2)), float)
        image = F.add_stamps(image, stamps,
                             jnp.asarray(x0, jnp.int32),
                             jnp.asarray(y0, jnp.int32))
    return image, realized
