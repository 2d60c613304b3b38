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
from .scene import SceneHost

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


def classify_objects(host: SceneHost, cfg: PoolingConfig,
                     psf_mtf=None) -> np.ndarray:
    """Vectorized mode partition (imsim/photon_pooling.py:356-386 runs
    the stamp classifier per object; here it's one array pass)."""
    modes = np.full(host.n_objects, PHOT, np.int8)
    modes[host.flux[:host.n_objects] < cfg.faint_thresh] = FAINT
    if cfg.fft_sb_thresh > 0 and psf_mtf is not None:
        peak = F.peak_surface_brightness(host.flux[:host.n_objects],
                                         psf_mtf, cfg.pixel_scale)
        # galaxies spread flux further; only point-ish objects go FFT
        obj_type = np.asarray(host.scene.obj_type)[:host.n_objects]
        modes[(peak > cfg.fft_sb_thresh) & (obj_type == 0)] = FFT
    return modes


def make_strided_batches(host: SceneHost, modes, cfg: PoolingConfig):
    """Photon->(batch, slot) assignment with bright-object flux spread
    across all batches (the 1/nbatch split of photon_pooling.py:279-304,
    realized exactly by striding the object-major photon list)."""
    sel = modes != FFT
    counts = np.where(sel, host.flux[:host.n_objects], 0).astype(np.int64)
    obj_of_photon = np.repeat(
        np.arange(host.n_objects, dtype=np.int32), counts)
    total = len(obj_of_photon)
    if total == 0:
        return
    nb = max(min(cfg.nbatch, -(-total // cfg.batch_size) * 4), 1)
    nb = min(nb, max(total, 1))
    for b in range(nb):
        sl = obj_of_photon[b::nb]
        size = int(np.ceil(total / nb))
        idx = np.full(size, host.scene.n - 1, np.int32)
        w = np.zeros(size, np.float32)
        idx[:len(sl)] = sl
        w[:len(sl)] = 1.0
        yield jnp.asarray(idx), jnp.asarray(w)


def render_ccd_pooled(seed: int, host: SceneHost, cfg: PoolingConfig,
                      silicon: SiliconParams | None = None,
                      tel=None, ctx=None, screens=None, sk_table=None,
                      checkpointer: Checkpointer | None = None,
                      checkpoint_key: str = "pooled", logger=None):
    """Render one CCD eimage.  With (tel, ctx) the full optics chain is
    used (render.shoot_full); otherwise the analytic Kolmogorov*Gaussian
    fast path (render.shoot).  With `silicon` the BF/tree-ring/diffusion
    sensor accumulates; else the simple binner."""
    kolm = P.kolmogorov_cdf()
    kolm_as = dataclasses.replace(kolm, y=kolm.y * cfg.fwhm)
    gauss_sigma = cfg.gauss_fwhm / 2.3548200450309493
    psf_mtf = None
    if cfg.fft_sb_thresh > 0:
        r0_500 = 0.9758834 * 500e-9 / (cfg.fwhm * np.pi / 180 / 3600)
        psf_mtf = F.psf_mtf_table(622.0, r0_500, gauss_fwhm=cfg.gauss_fwhm)

    modes = classify_objects(host, cfg, psf_mtf)
    image = jnp.zeros((cfg.ysize, cfg.xsize), jnp.float32)
    start_batch = 0
    if checkpointer is not None:
        saved = checkpointer.load(checkpoint_key)
        if saved is not None:
            image = jnp.asarray(saved["image"])
            start_batch = saved["next_batch"]
            if logger:
                logger.info("resumed at batch %d", start_batch)

    # ---- FFT pass (bright stars) ----------------------------------------
    if start_batch == 0 and np.any(modes == FFT):
        image = _fft_pass(image, host, modes, cfg, psf_mtf, logger)

    # ---- pooled photon pass ---------------------------------------------
    batches = list(make_strided_batches(host, modes, cfg))
    for b, (obj_idx, weight) in enumerate(batches):
        if b < start_batch:
            continue
        key = stream(seed, "photons", b)
        if tel is not None and ctx is not None:
            photons = render.shoot_full(
                key, host.scene, obj_idx, weight, tel, ctx,
                screens=screens, sk_table=sk_table, exptime=cfg.exptime)
        else:
            photons = render.shoot(
                key, host.scene, obj_idx, weight,
                {"kolmogorov": kolm_as, "gauss_sigma": gauss_sigma},
                exptime=cfg.exptime, pixel_scale=cfg.pixel_scale)
        if silicon is not None:
            image = accumulate_silicon(stream(seed, "si", b), photons,
                                       image, silicon, nsub=cfg.nsub)
        else:
            image = accumulate(photons, image)
        if checkpointer is not None and \
                (b + 1) % cfg.nbatch_per_checkpoint == 0:
            image.block_until_ready()
            checkpointer.save(checkpoint_key, dict(
                image=np.asarray(image), next_batch=b + 1))
    return image, modes


def _fft_pass(image, host: SceneHost, modes, cfg, psf_mtf, logger=None):
    """Render all FFT-mode objects, bucketed by stamp size, saturation
    spikes painted afterwards on the full image."""
    idx = np.nonzero(modes == FFT)[0]
    if logger:
        logger.info("FFT pass: %d objects", len(idx))
    params = np.asarray(host.scene.params)
    flux = host.flux[:host.n_objects]
    buckets: dict[int, list[int]] = {}
    for i in idx:
        N = F.stamp_bucket(flux[i], psf_mtf, cfg.pixel_scale)
        buckets.setdefault(N, []).append(i)
    for N, ids in sorted(buckets.items()):
        B = len(ids)
        K = len(psf_mtf.y)
        mtf_y = np.broadcast_to(np.asarray(psf_mtf.y), (B, K)).copy()
        xs = params[ids, 0]
        ys = params[ids, 1]
        x0 = np.floor(xs).astype(int) - N // 2
        y0 = np.floor(ys).astype(int) - N // 2
        stamps = F.render_fft_stamps(
            jnp.asarray(mtf_y), jnp.full((B,), psf_mtf.dx, jnp.float32),
            jnp.asarray(flux[ids], jnp.float32),
            jnp.ones((B,), jnp.float32), jnp.zeros((B,), jnp.float32),
            jnp.asarray(xs - np.floor(xs), jnp.float32),
            jnp.asarray(ys - np.floor(ys), jnp.float32),
            N, cfg.pixel_scale)
        # Poisson noise on FFT stamps (stamp.py:482-525 adds PoissonNoise)
        key = stream(int(flux[ids[0]]) + N, "fftnoise")
        noise = jax.random.normal(key, stamps.shape) * jnp.sqrt(
            jnp.maximum(stamps, 0.0))
        stamps = stamps + noise
        for j in range(B):
            image = F.add_stamp(image, stamps[j], int(x0[j]), int(y0[j]))
    return image
