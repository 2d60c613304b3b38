"""Headline benchmark: photon-shot 4Kx4K single-CCD visit.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The scene: ~1e5 objects (stars + Sersic galaxies + knots) with a total
photon budget of ~1e8, Kolmogorov*Gaussian PSF, full-frame sky background
with Poisson noise — the BASELINE.json north-star workload (<10 s on one
TPU chip).  vs_baseline = 10s / measured wall-clock (>1 beats the target).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_synthetic_scene(n_obj=100_000, img=4096, total_photons=1.0e8,
                          seed=0):
    from imsim_tpu.image.scene import DeviceScene, SceneHost, WL_CDF_K

    rng = np.random.default_rng(seed)
    # power-law-ish flux distribution over ~6 mag: many faint, few bright
    raw = 10 ** rng.uniform(0.0, 2.4, n_obj) ** 1.35
    flux = raw / raw.sum() * total_photons
    flux = rng.poisson(np.clip(flux, 0, None)).astype(np.float64)

    # 70% galaxies (sersic), 25% stars, 5% knots
    t = rng.uniform(0, 1, n_obj)
    obj_type = np.where(t < 0.25, 0, np.where(t < 0.95, 1, 2)).astype(np.int32)

    # spatially sorted (Morton-ish by tile) for scatter locality
    x = rng.uniform(0, img, n_obj)
    y = rng.uniform(0, img, n_obj)
    tile = (y.astype(int) // 256) * (img // 256) + x.astype(int) // 256
    order = np.argsort(tile)
    x, y, flux, obj_type = x[order], y[order], flux[order], obj_type[order]

    hlr = np.clip(rng.lognormal(np.log(0.35), 0.6, n_obj), 0.05, 3.0)
    srs_n = np.where(obj_type == 2, 30.0,
                     np.clip(rng.normal(1.5, 0.9, n_obj), 0.3, 6.2))
    q = rng.uniform(0.3, 1.0, n_obj)
    beta = rng.uniform(0, np.pi, n_obj)
    wl = np.linspace(552.0, 691.0, WL_CDF_K).astype(np.float32)

    n_pad = int(2 ** np.ceil(np.log2(n_obj)))
    def pad(a, fill=0.0):
        out = np.full(n_pad, fill, np.float32)
        out[:n_obj] = a
        return out

    scene = DeviceScene.from_columns(
        x=pad(x), y=pad(y), obj_type=pad(obj_type),
        p0=pad(hlr), p1=pad(srs_n, 1.0), p2=pad(q, 1.0), p3=pad(beta),
        g1=pad(rng.normal(0, 0.02, n_obj)),
        g2=pad(rng.normal(0, 0.02, n_obj)),
        mu=pad(1.0 + rng.normal(0, 0.03, n_obj), 1.0),
        wl_icdf=np.broadcast_to(wl, (n_pad, WL_CDF_K)),
    )
    return SceneHost(scene=scene, flux=flux, nominal_flux=flux,
                     n_objects=n_obj)


def main():
    from imsim_tpu.image.ccd_render import RenderConfig, render_ccd

    host = build_synthetic_scene()
    total_photons = float(host.flux.sum())
    cfg = RenderConfig(xsize=4096, ysize=4096, batch_size=8_000_000,
                       fwhm=0.8, sky_level=17_500.0)  # ~700 e-/pix sky

    # compile warmup on a single batch + sky pass
    img = render_ccd(1, host, cfg, max_batches=1)
    img.block_until_ready()
    _ = float(img[0, 0])

    t0 = time.time()
    img = render_ccd(42, host, cfg)
    img.block_until_ready()
    checksum = float(img[2048, 2048])  # force completion
    wall = time.time() - t0

    photons_per_sec = total_photons / wall
    result = {
        "metric": "single_ccd_visit_wallclock",
        "value": round(wall, 3),
        "unit": "seconds (4Kx4K, 1e5 objects, %.2e photons; %.1f Mphot/s)"
                % (total_photons, photons_per_sec / 1e6),
        "vs_baseline": round(10.0 / wall, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
