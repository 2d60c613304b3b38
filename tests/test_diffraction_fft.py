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


def test_kernel_calibrated_against_photon_spikes():
    """The kernel's defaults come from photon-shot spider spikes — the
    reference's calibration method (imsim/diffraction_fft.py:5-26 fits
    its brightness law to photon-shooting output).  Check (a) the
    fraction matches the photon tail probability, (b) the kernel's
    cumulative arm profile tracks the photon |kick| distribution."""
    from imsim_tpu.image.diffraction_fft import calibrate_spike_profile

    cal = calibrate_spike_profile(622.0)
    # a few percent of photons land in the spikes at r-band
    assert 0.02 < cal["fraction"] < 0.10, cal
    k = spike_kernel(622.0, n=513)
    c = k.shape[0] // 2
    spike_flux = k.sum() - k[c, c]
    assert abs(spike_flux - cal["fraction"]) < 0.2 * cal["fraction"]
    # cumulative radial arm flux of the kernel vs the photon CDF shape:
    # both measured as flux fraction beyond r, ratio within 2x over the
    # usable arm range (the kernel is truncated at the stamp edge)
    n = k.shape[0]
    yy, xx = np.mgrid[:n, :n] - c
    rr = np.hypot(xx, yy)
    kc = k.copy()
    kc[c, c] = 0.0
    for r0 in (5.0, 15.0, 40.0):
        kern_beyond = kc[rr > r0].sum() / kc.sum()
        # photon side: P(|kick| > r0 px | > r_min)
        import jax
        import jax.numpy as jnp
        from imsim_tpu.photons.diffraction import apply_diffraction

        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        m = 1 << 20
        u1 = jax.random.uniform(k1, (m,))
        u2 = jax.random.uniform(k2, (m,))
        r = jnp.sqrt(0.612**2 * 4.18**2 + u1 * (1 - 0.612**2) * 4.18**2)
        a = u2 * 2 * jnp.pi
        z = jnp.zeros((m,))
        du, dv = apply_diffraction(k3, r * jnp.cos(a), r * jnp.sin(a),
                                   z, z, jnp.full((m,), 622.0),
                                   enable_field_rotation=False)
        arcsec = np.pi / 180 / 3600
        kick = np.asarray(jnp.hypot(du, dv)) / arcsec / 0.2
        phot_beyond = (kick > r0).sum() / max((kick > 2.0).sum(), 1)
        assert 0.5 < kern_beyond / phot_beyond < 2.0, \
            (r0, kern_beyond, phot_beyond)


def test_kernel_wavelength_dependence():
    """Longer wavelengths diffract more: the calibrated spike fraction
    grows with lambda (u -> y band)."""
    from imsim_tpu.image.diffraction_fft import calibrate_spike_profile

    f_u = calibrate_spike_profile(365.0)["fraction"]
    f_r = calibrate_spike_profile(622.0)["fraction"]
    f_y = calibrate_spike_profile(970.0)["fraction"]
    assert f_u < f_r < f_y


def test_kernel_golden_regression():
    """Golden-array regression (the reference pins its spike overlay
    against stored arrays, tests/data/fft-diffraction/): the r-band
    kernel's diagonal arm profile, ring-summed radial flux, and the
    calibration outputs must stay stable."""
    import os

    from imsim_tpu.image.diffraction_fft import calibrate_spike_profile

    path = os.path.join(os.path.dirname(__file__), "data",
                        "spike_kernel_golden_r622.npz")
    g = np.load(path)
    cal = calibrate_spike_profile(622.0)
    assert abs(cal["fraction"] - float(g["fraction"])) \
        < 0.05 * float(g["fraction"])
    assert abs(cal["r_scale_px"] - float(g["r_scale_px"])) < 0.3
    assert abs(cal["power"] - float(g["power"])) < 0.1

    k = np.asarray(spike_kernel(622.0, n=513))
    c = k.shape[0] // 2
    diag = np.array([k[c + i, c + i] for i in range(1, 200)])
    np.testing.assert_allclose(diag, g["diag"], rtol=5e-2, atol=1e-9)
    yy, xx = np.mgrid[:513, :513] - c
    rr = np.hypot(xx, yy)
    edges = g["edges"]
    ring = np.array([k[(rr >= a) & (rr < b)].sum()
                     for a, b in zip(edges[:-1], edges[1:])])
    np.testing.assert_allclose(ring, g["ring"], rtol=5e-2, atol=1e-8)
