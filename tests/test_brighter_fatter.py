"""Brighter-fatter physics: a bright point source must grow wider with
flux while conserving charge (the Silicon.cpp behavior the reference's
sensor-model tests validate; cf. doc/features.rst BF validation)."""
import numpy as np

import jax
import jax.numpy as jnp

from imsim_tpu.photons.batch import PhotonBatch
from imsim_tpu.sensor.silicon import SiliconParams, accumulate_silicon


def _spot_sigma(flux, seed=0, sigma_px=1.5, nsub=8, bf=0.4):
    rng = np.random.default_rng(seed)
    n = int(flux)
    p = SiliconParams.make(bf_strength=bf, diffusion_um=0.0)
    ph = PhotonBatch.zeros(n).replace(
        x=jnp.asarray(64.0 + rng.normal(0, sigma_px, n), jnp.float32),
        y=jnp.asarray(64.0 + rng.normal(0, sigma_px, n), jnp.float32),
        flux=jnp.ones(n, jnp.float32),
        wavelength=jnp.full(n, 500.0, jnp.float32))  # shallow conversion
    img = accumulate_silicon(jax.random.PRNGKey(seed), ph,
                             jnp.zeros((128, 128), jnp.float32), p,
                             nsub=nsub)
    a = np.asarray(img)
    yy, xx = np.mgrid[:128, :128]
    tot = a.sum()
    cx = (a * xx).sum() / tot
    cy = (a * yy).sum() / tot
    sig = np.sqrt(((a * ((xx - cx) ** 2 + (yy - cy) ** 2)).sum() / tot)
                  / 2.0)
    return sig, tot, n


def test_bf_spot_growth_and_charge_conservation():
    sig_faint, tot_f, n_f = _spot_sigma(20_000)
    sig_bright, tot_b, n_b = _spot_sigma(500_000)
    # charge conserved up to conversion-depth losses (500nm: ~none)
    assert tot_f > 0.98 * n_f
    assert tot_b > 0.98 * n_b
    # brighter-fatter near full well: ~2.5% sigma growth (measured LSST
    # scale), within a factor ~2
    growth = sig_bright / sig_faint - 1.0
    assert 0.01 < growth < 0.06, (sig_faint, sig_bright, growth)

    # no-BF control: no growth beyond noise
    s1, *_ = _spot_sigma(20_000, bf=0.0)
    s2, *_ = _spot_sigma(2_000_000, bf=0.0)
    assert abs(s2 / s1 - 1.0) < 0.01, (s1, s2)
