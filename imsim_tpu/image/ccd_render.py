"""Top-level single-CCD render: catalog -> eimage.

The TPU-native analog of LSST_ImageBuilder.buildImage + addNoise
(imsim/lsst_image.py:276-395): photon batches are pooled across all
objects (photon_pooling design) and streamed through one jitted pipeline;
sky + noise are applied in a second jitted pass.  Checkpointing hooks
operate at batch granularity exactly like the reference's
nbatch/nbatch_per_checkpoint scheme.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..photons import profiles as P
from ..sensor.simple import accumulate
from ..utils.rng import stream, poisson_approx
from . import render
from .scene import SceneHost, make_photon_batches


@dataclasses.dataclass
class RenderConfig:
    xsize: int = 4096
    ysize: int = 4096
    exptime: float = 30.0
    batch_size: int = 4_000_000
    pixel_scale: float = 0.2       # arcsec/pixel
    fwhm: float = 0.8              # atmospheric seeing FWHM (arcsec)
    gauss_fwhm: float = 0.3        # extra instrumental gaussian (arcsec)
    sky_level: float = 0.0         # photons/arcsec^2
    apply_sky_gradient: bool = False
    dtype: object = jnp.float32


@partial(jax.jit, static_argnames=("xsize", "ysize", "exptime",
                                   "pixel_scale"))
def _render_batch(key, image, scene, obj_idx, weight, kolm_table,
                  gauss_sigma, xsize, ysize, exptime, pixel_scale):
    photons = render.shoot(
        key, scene, obj_idx, weight,
        {"kolmogorov": kolm_table, "gauss_sigma": gauss_sigma},
        exptime=exptime, pixel_scale=pixel_scale)
    return accumulate(photons, image)


@partial(jax.jit, static_argnames=("pixel_scale", "exact_poisson",
                                   "read_noise", "gain", "vig_step"))
def _add_sky_and_noise(key, image, sky_per_arcsec2, gradient_abc,
                       vignet_img, pixel_scale, exact_poisson=False,
                       read_noise=0.0, gain=1.0, vig_step=1,
                       fringe=None):
    """Sky level (+ plane gradient + vignetting) with Poisson noise,
    mirroring imsim/lsst_image.py:128-200. Returns image in electrons.

    exact_poisson=False uses the Gaussian approximation (indistinguishable
    above ~30 e-/pixel, which any real sky exceeds); exact sampling is kept
    for very dark simulations.

    read_noise/gain mirror the `image.noise: {type: CCD}` surface
    (config/imsim-config.yaml:209-212): object photons already carry
    shot noise from photon shooting, so only the sky is
    Poisson-sampled, plus an optional Gaussian read-noise floor of
    read_noise/gain electrons (the template default is read_noise 0 —
    'applied later' in the raw-file readout chain).

    vig_step > 1: vignet_img is a coarse stride-vig_step grid
    (utils.grid.coarse_shape) upsampled here ON DEVICE — the full-res
    host map cost ~18 s/CCD of numpy and a 64 MB host->device upload.
    fringe: optional full-res fringing surface multiplied in (E2V
    CCDs); kept separate because it is NOT smooth at the coarse-grid
    scale."""
    H, W = image.shape
    if vig_step > 1:
        from ..utils.grid import upsample_bilinear

        vignet_img = upsample_bilinear(jnp, vignet_img, (H, W), vig_step)
    if fringe is not None:
        vignet_img = vignet_img * fringe
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    a, b, c = gradient_abc
    grad = a * xx + b * yy + c
    sky = sky_per_arcsec2 * (pixel_scale ** 2) * grad * vignet_img
    if exact_poisson:
        noisy_sky = poisson_approx(key, sky)
    else:
        noisy_sky = jnp.round(
            sky + jnp.sqrt(jnp.maximum(sky, 0.0))
            * jax.random.normal(key, sky.shape, dtype=sky.dtype))
    out = image + noisy_sky
    if read_noise:
        k2 = jax.random.fold_in(key, 1)
        out = out + (read_noise / gain) * jax.random.normal(
            k2, out.shape, dtype=out.dtype)
    return out


def render_ccd(seed: int, host: SceneHost, cfg: RenderConfig,
               vignetting_image=None, sky_gradient=None,
               max_batches=None, logger=None):
    """Render the object photons + sky for one CCD; returns eimage (H, W)
    float32 in electrons (pre-readout)."""
    kolm = P.kolmogorov_cdf()
    # scale table from FWHM-units to arcsec
    kolm_as = dataclasses.replace(kolm, y=kolm.y * cfg.fwhm)
    gauss_sigma = cfg.gauss_fwhm / 2.3548200450309493

    image = jnp.zeros((cfg.ysize, cfg.xsize), cfg.dtype)
    nb = 0
    for b, (obj_idx, weight) in enumerate(
            make_photon_batches(host, cfg.batch_size, max_batches)):
        key = stream(seed, "photons", b)
        image = _render_batch(key, image, host.scene, obj_idx, weight,
                              kolm_as, gauss_sigma, cfg.xsize, cfg.ysize,
                              cfg.exptime, cfg.pixel_scale)
        nb += 1
    if logger:
        logger.info("rendered %d photon batches", nb)

    if cfg.sky_level > 0:
        if sky_gradient is None:
            abc = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0))
        else:
            a, b_, c = sky_gradient.a, sky_gradient.b, sky_gradient.c
            s = sky_gradient.sky_level_center
            abc = (jnp.float32(a / s), jnp.float32(b_ / s), jnp.float32(c / s))
        vig = (jnp.ones((cfg.ysize, cfg.xsize), jnp.float32)
               if vignetting_image is None else jnp.asarray(vignetting_image))
        image = _add_sky_and_noise(stream(seed, "sky"), image,
                                   jnp.float32(cfg.sky_level), abc, vig,
                                   cfg.pixel_scale)
    return image
