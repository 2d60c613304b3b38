"""Saturation diffraction-spike overlay tests (imsim/diffraction_fft.py
analog: tests/test_diffraction_fft.py golden-array checks; here the
invariants are charge conservation, 4-fold arm geometry, and the
saturation trigger)."""
import numpy as np

import jax.numpy as jnp

from imsim_tpu.image.diffraction_fft import apply_spikes, spike_kernel


def test_kernel_normalized_fourfold():
    k = spike_kernel(622.0, alpha_deg=45.0)
    assert abs(k.sum() - 1.0) < 1e-5
    c = k.shape[0] // 2
    # central delta dominates
    assert k[c, c] > 0.9
    # 4-fold symmetry: the four 45-degree arms carry equal flux
    n = k.shape[0]
    yy, xx = np.mgrid[:n, :n] - c
    quads = [k[(xx > 5) & (yy > 5)].sum(), k[(xx < -5) & (yy > 5)].sum(),
             k[(xx > 5) & (yy < -5)].sum(), k[(xx < -5) & (yy < -5)].sum()]
    assert np.std(quads) < 0.1 * np.mean(quads)


def test_apply_spikes_conserves_and_triggers():
    img = np.zeros((256, 256), np.float32)
    img[100, 100] = 500_000.0     # saturated star
    img[200, 50] = 5_000.0        # unsaturated star
    kern = jnp.asarray(spike_kernel(622.0, n=129))
    out = np.asarray(apply_spikes(jnp.asarray(img), kern,
                                  sat_level=100_000.0))
    # charge conserved (kernel normalized; star far from edges)
    assert abs(out.sum() - img.sum()) < 1.0
    # unsaturated star untouched
    assert abs(out[200, 50] - 5_000.0) < 1e-2
    # saturated star clipped to sat + redistributed along diagonals
    assert out[100, 100] <= 100_000.0 + 400_000.0 * 0.99
    d1 = sum(out[100 + k, 100 + k] for k in range(8, 30))
    off = sum(out[100 + k, 100] for k in range(8, 30))
    assert d1 > 3 * off, (d1, off)
