"""Generate the brighter-fatter regression curves committed at
tests/data/bf_regression.npz — the quantitative anchor for the silicon
model (VERDICT r1 item 6).

Two curves, mirroring the published LSST validations of the reference's
Poisson-solver sensor model (doc/features.rst:27-45):

* photon-transfer curve: var/mean of BF-iterated flats vs signal level.
  The linear decline slope is Astier et al. (2019)'s a00; LSST ITL/E2V
  sensors measure a00 ~ 2.0-3.0e-6 / e-.
* spot growth: second moment sigma^2 of a Gaussian spot accumulated
  through the silicon model vs its peak charge — linear, the classic
  BF signature.

Run:  python benchmarks/bf_curves.py          (writes the npz)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def ptc_curve(levels=(5_000, 15_000, 30_000, 45_000, 60_000), size=512,
              seed=1):
    from imsim_tpu.image.flat import FlatConfig, build_flat, flat_statistics
    from imsim_tpu.sensor.silicon import SiliconParams

    params = SiliconParams.make()
    means, vom = [], []
    for target in levels:
        cfg = FlatConfig(counts_per_pixel=target, counts_per_iter=1000.0,
                         xsize=size, ysize=size)
        st = flat_statistics(build_flat(seed, cfg, params))
        means.append(st["mean"])
        vom.append(st["var_over_mean"])
    return np.asarray(means), np.asarray(vom)


def spot_curve(n_photons=(20_000, 100_000, 300_000, 600_000, 1_000_000),
               sigma=1.5, seed=5):
    from imsim_tpu.photons.batch import PhotonBatch
    from imsim_tpu.sensor import silicon as si

    params = si.SiliconParams.make()
    H = W = 64
    peaks, sig2 = [], []
    for n in n_photons:
        key = jax.random.PRNGKey(seed)
        z = jnp.zeros((n,), jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(6), (n, 2)) * sigma
        ph = PhotonBatch(x=32.0 + g[:, 0], y=32.0 + g[:, 1],
                         flux=jnp.ones((n,), jnp.float32),
                         wavelength=jnp.full((n,), 620.0),
                         dxdz=z, dydz=z, pupil_u=z, pupil_v=z, time=z,
                         abs_len=None)
        img = si.accumulate_silicon(key, ph,
                                    jnp.zeros((H, W), jnp.float32),
                                    params, nsub=8)
        a = np.asarray(img)
        yy, xx = np.mgrid[:H, :W]
        tot = a.sum()
        cx = (a * xx).sum() / tot
        cy = (a * yy).sum() / tot
        s2 = ((a * ((xx - cx) ** 2 + (yy - cy) ** 2)).sum() / tot) / 2
        peaks.append(a.max())
        sig2.append(s2)
    return np.asarray(peaks), np.asarray(sig2)


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "bf_regression.npz")
    ptc_mean, ptc_vom = ptc_curve()
    a00 = np.polyfit(ptc_mean, 1.0 - ptc_vom, 1)[0]
    spot_peak, spot_sig2 = spot_curve()
    print("PTC a00 = %.3e /e- (published LSST: 2.0-3.0e-6)" % a00)
    print("spot sigma^2 growth at %.0f e- peak: %.2f%%"
          % (spot_peak[-2],
             100 * (spot_sig2[-2] / spot_sig2[0] - 1.0)))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, ptc_mean=ptc_mean, ptc_var_over_mean=ptc_vom,
             a00=a00, spot_peak=spot_peak, spot_sigma2=spot_sig2)
    print("wrote", out)


if __name__ == "__main__":
    main()
