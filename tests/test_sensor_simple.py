import numpy as np
import jax.numpy as jnp

from imsim_tpu.photons.batch import PhotonBatch
from imsim_tpu.sensor.simple import accumulate


def _batch(x, y, flux):
    n = len(x)
    z = jnp.zeros((n,), jnp.float32)
    return PhotonBatch(
        x=jnp.asarray(x, jnp.float32), y=jnp.asarray(y, jnp.float32),
        flux=jnp.asarray(flux, jnp.float32),
        wavelength=jnp.full((n,), 622.0), dxdz=z, dydz=z,
        pupil_u=z, pupil_v=z, time=z)


def test_accumulate_basic():
    img = jnp.zeros((8, 8), jnp.float32)
    ph = _batch([2.0, 2.4, 2.6], [3.0, 3.0, 3.0], [1.0, 1.0, 1.0])
    out = np.asarray(accumulate(ph, img))
    assert out[3, 2] == 2.0  # 2.0 and 2.4 round to pixel 2
    assert out[3, 3] == 1.0
    assert out.sum() == 3.0


def test_accumulate_drops_out_of_bounds():
    img = jnp.zeros((4, 4), jnp.float32)
    ph = _batch([-1.0, 10.0, 1.0], [0.0, 0.0, 1.0], [5.0, 5.0, 5.0])
    out = np.asarray(accumulate(ph, img))
    assert out.sum() == 5.0


def test_accumulate_flux_conservation_random():
    img = jnp.zeros((64, 64), jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 63, 10000)
    y = rng.uniform(0, 63, 10000)
    f = rng.uniform(0.5, 1.5, 10000)
    out = np.asarray(accumulate(_batch(x, y, f), img))
    # photons rounding to edge pixels stay in bounds for coords in [0,63]
    assert np.isclose(out.sum(), f.sum(), rtol=1e-5)


def test_photon_batch_concat_and_pool():
    a = PhotonBatch.zeros(10)
    b = PhotonBatch.zeros(6)
    c = PhotonBatch.concat([a, b])
    assert c.n == 16
    assert float(c.total_flux()) == 0.0
