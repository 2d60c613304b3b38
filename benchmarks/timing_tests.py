"""Timing harness (NOTE: block_until_ready does not wait on the
axon tunnel; per-call numbers here are enqueue times — use bench.py's
slope method for honest wall-clocks.)

Original doc: Timing harness — the reference's tests/performance/ role
(timing_tests.py, sensor_accumulate_timing.py): photon throughput vs
batch size, silicon-sensor accumulate scaling vs flux and recalc
cadence, full-chain vs fast-path cost.

Run standalone on the target hardware:
    python benchmarks/timing_tests.py [--sizes 1e6,4e6,16e6]

Follows the axon-tunnel benchmarking rules (see bench.py): warmup +
block_until_ready, no device->host transfers before or inside timed
regions.
"""
import argparse
import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def time_steady(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, out)
    return (time.time() - t0) / reps


def bench_photon_throughput(sizes):
    """Photons/s through the fused full-physics batch step vs batch
    size (the sky-photon bundling study analog)."""
    sys.path.insert(0, ".")
    from bench import build_synthetic_host
    from imsim_tpu.electronics.camera import get_camera
    from imsim_tpu.image.photon_pooling import (_pooled_batch_step,
                                                build_obj_map)
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import make_optics_context
    from imsim_tpu.psf.atmosphere import (AtmConfig, make_screens,
                                          second_kick_table)
    from imsim_tpu.photons import profiles as P
    from imsim_tpu.sensor.silicon import SiliconParams
    from imsim_tpu.utils.rng import stream

    DEG = np.pi / 180
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    ccd = get_camera("LsstCamSim")["R22_S11"]
    host = build_synthetic_host(fac, ccd, n_obj=50_000,
                                total_photons=float(max(sizes)) * 2)
    octx = make_optics_context(fac, ccd)
    tel32 = fac.telescope.for_detector("R22_S11")
    cfgA = AtmConfig(fwhm=0.7)
    screens = make_screens(271870, cfgA)
    sk = second_kick_table(cfgA, 622.0)
    sk = dataclasses.replace(sk, y=jnp.asarray(sk.y))
    sil = SiliconParams.make()
    kolm = P.kolmogorov_cdf()
    kolm = dataclasses.replace(kolm, y=jnp.asarray(kolm.y * 0.7))
    counts = host.flux.astype(np.int64)
    total = int(counts.sum())
    cum = np.zeros(host.scene.n, np.int32)
    cum[:host.n_objects] = np.cumsum(counts)
    cum[host.n_objects:] = cum[host.n_objects - 1]
    cum_dev = jnp.asarray(cum)
    NB = 8
    ny, nx = ccd.bounds.height, ccd.bounds.width

    rows = []
    for N in sizes:
        image = jnp.zeros((ny, nx), jnp.float32)
        omap = jax.jit(build_obj_map,
                       static_argnames=("nb", "batch_size"))(
            cum_dev, jnp.int32(total), NB, int(N))

        def step(b):
            return _pooled_batch_step(
                stream(1, "p", int(b)), stream(1, "s", int(b)),
                host.scene, omap, cum_dev, jnp.int32(total),
                jnp.int32(b), NB, int(N), tel32, octx, screens, sk,
                kolm, jnp.float32(0.127), sil, image, 30.0, 0.2, 4)

        dt = time_steady(step, 1)
        rows.append(dict(batch=int(N), sec=dt, mphot_s=N / dt / 1e6))
    return rows


def bench_sensor_accumulate(fluxes, nsubs):
    """SiliconSensor accumulate scaling vs photons and recalc cadence
    (sensor_accumulate_timing.py analog)."""
    from imsim_tpu.photons.batch import PhotonBatch
    from imsim_tpu.sensor.silicon import SiliconParams, accumulate_silicon

    p = SiliconParams.make()
    img = jnp.zeros((4004, 4096), jnp.float32)
    rows = []
    for n in fluxes:
        rng = np.random.default_rng(0)
        ph = PhotonBatch.zeros(int(n)).replace(
            x=jnp.asarray(rng.uniform(0, 4096, int(n)), jnp.float32),
            y=jnp.asarray(rng.uniform(0, 4004, int(n)), jnp.float32),
            flux=jnp.ones(int(n), jnp.float32),
            wavelength=jnp.full(int(n), 622.0, jnp.float32))
        for nsub in nsubs:
            dt = time_steady(
                lambda: accumulate_silicon(jax.random.PRNGKey(0), ph,
                                           img, p, nsub=nsub))
            rows.append(dict(n=int(n), nsub=nsub, sec=dt,
                             mphot_s=n / dt / 1e6))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1048576,4194304,16777216")
    args = ap.parse_args()
    sizes = [int(float(s)) for s in args.sizes.split(",")]

    out = dict(
        photon_throughput=bench_photon_throughput(sizes),
        sensor_accumulate=bench_sensor_accumulate(
            [1e6, 4e6], [1, 4, 16]),
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
