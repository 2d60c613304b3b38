"""Readout chain tests vs the physics invariants the reference tests
(test_readout.py / test_bleed_trails.py style)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imsim_tpu.electronics.camera import (Camera, get_camera, VENDOR_SPECS,
                                          pixel_to_focal_mm,
                                          focal_mm_to_pixel)
from imsim_tpu.electronics.readout import (CcdReadout, bleed_image,
                                           cte_matrix, segment_image,
                                           unsegment_image)


def test_camera_geometry():
    cam = get_camera("LsstCamSim")
    assert len(cam) == 189
    assert "R22_S11" in cam
    ccd = cam["R22_S11"]
    assert len(ccd) == 16
    assert ccd.vendor == "E2V"
    assert cam["R01_S00"].vendor == "ITL"
    # center CCD is at the focal plane origin
    assert ccd.center_mm == (0.0, 0.0)
    # det_num mapping is stable and name-sorted
    assert cam.det_name(cam.det_num("R22_S11")) == "R22_S11"
    # amp imaging sections tile the CCD
    spec = VENDOR_SPECS["E2V"]
    total = sum(a.bounds.width * a.bounds.height for a in ccd.values())
    assert total == spec["nx"] * spec["ny"]


def test_comcam_geometry():
    cam = Camera("LsstComCamSim")
    assert len(cam) == 9


def test_pixel_focal_roundtrip():
    cam = get_camera()
    ccd = cam["R13_S21"]
    x = np.array([0.0, 1000.0, 4000.0])
    y = np.array([10.0, 2000.0, 3999.0])
    fx, fy = pixel_to_focal_mm(ccd, x, y)
    x2, y2 = focal_mm_to_pixel(ccd, fx, fy)
    np.testing.assert_allclose(x2, x, atol=1e-9)
    np.testing.assert_allclose(y2, y, atol=1e-9)


def test_cte_matrix_properties():
    M = cte_matrix(100, 1e-4)
    # column sums ~1 (charge conserved up to the last transfers)
    assert np.allclose(M.sum(axis=0)[:-25], 1.0, atol=1e-6)
    # diagonal decays like (1-cti)^i
    assert M[49, 49] == pytest.approx((1 - 1e-4) ** 50)


def test_bleed_conserves_charge():
    img = jnp.zeros((64, 16), jnp.float32).at[32, 5].set(50_000.0)
    out = np.asarray(bleed_image(img, full_well=1000.0, niter=256))
    assert out.sum() == pytest.approx(50_000.0, rel=1e-5)
    assert out.max() <= 1000.0 + 1e-3
    # trail extends along the column
    assert (out[:, 5] > 900).sum() >= 45


def test_bleed_bottom_escape():
    # saturated pixel near the bottom: charge should escape off row 0
    img = jnp.zeros((32, 4), jnp.float32).at[1, 2].set(1e6)
    out = np.asarray(bleed_image(img, full_well=1000.0, niter=128))
    assert out.sum() < 1e6  # some charge lost
    assert out.max() <= 1000.0 + 1e-3


def test_bleed_value_equivalence_vs_reference():
    """Per-pixel equality with the reference's numpy bleed module
    (imsim/bleed_trails.py imported directly — it depends only on
    numpy) across the deviation-prone geometries: asymmetric nearly
    full surroundings, bottom-edge escape, merging trails from two
    runs in one channel, top-edge clipping, midline stop, and random
    fuzz.  The alternating below/above fill order, the one-full-well-
    per-step bottom escape, and the negative-capacity run interaction
    must all match (VERDICT r3 item 7)."""
    import importlib.util
    import os

    ref_path = "/root/reference/imsim/bleed_trails.py"
    if not os.path.isfile(ref_path):
        pytest.skip("reference module not available")
    spec = importlib.util.spec_from_file_location("ref_bleed", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    fw = 1000.0
    rng = np.random.default_rng(3)
    cases = []
    img = np.zeros((100, 5)); img[40:45, 2] = 2000.0
    cases.append(("single run", img, False))
    img = np.zeros((100, 5)); img[40:45, 2] = 3000.0; img[30:40, 2] = 950.0
    cases.append(("asym nearly-full below", img, False))
    img = np.zeros((100, 5)); img[1:4, 2] = 50000.0
    cases.append(("bottom escape", img, False))
    img = np.zeros((100, 5)); img[20:23, 2] = 50000.0; img[30:33, 2] = 5000.0
    cases.append(("merging trails", img, False))
    img = np.zeros((100, 5)); img[90:99, 2] = 30000.0
    cases.append(("top clip", img, False))
    for t in range(4):
        img = rng.uniform(0, 1200, (64, 8))
        img[rng.integers(5, 55), rng.integers(0, 8)] = rng.uniform(2e3, 8e4)
        img[rng.integers(5, 55), rng.integers(0, 8)] = rng.uniform(2e3, 8e4)
        cases.append((f"fuzz{t}", img, bool(t % 2)))
    for name, img, midline in cases:
        expect = ref.bleed_eimage(np.array(img, float).copy(), fw,
                                  midline_stop=midline)
        got = np.asarray(bleed_image(jnp.asarray(img, jnp.float32), fw,
                                     midline_stop=midline))
        np.testing.assert_allclose(got, expect, atol=0.01, err_msg=name)


def test_segment_roundtrip():
    spec = VENDOR_SPECS["ITL"]
    ny, nx = spec["ny"], spec["nx"]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(ny, nx)).astype(np.float32))
    amps = segment_image(img, "ITL")
    assert amps.shape == (16, spec["amp_ny"], spec["amp_nx"])
    img2 = unsegment_image(amps, "ITL", ny, nx)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img), atol=0)


def test_readout_chain_bias_and_noise():
    cam = get_camera()
    ccd = cam["R01_S00"]  # ITL
    ro = CcdReadout(ccd, dark_current=0.0, scti=0.0, pcti=0.0)
    spec = VENDOR_SPECS["ITL"]
    img = jnp.zeros((spec["ny"], spec["nx"]), jnp.float32)
    raw = np.asarray(ro.run(jax.random.PRNGKey(0), img))
    assert raw.shape[0] == 16
    # overscan ~ bias level, scatter ~ read noise
    for k in range(16):
        amp = ccd[f"C{k // 8}{k % 8}"]
        oscan = raw[k, spec["amp_ny"]:, :]
        assert abs(oscan.mean() - amp.bias_level) < 1.0
        assert abs(oscan.std() - amp.read_noise) < 0.3 * amp.read_noise + 0.3


def test_readout_signal_gain():
    cam = get_camera()
    ccd = cam["R01_S00"]
    ro = CcdReadout(ccd, dark_current=0.0, scti=0.0, pcti=0.0)
    spec = VENDOR_SPECS["ITL"]
    img = jnp.full((spec["ny"], spec["nx"]), 1700.0, jnp.float32)
    raw = np.asarray(ro.run(jax.random.PRNGKey(1), img))
    pre, anx = spec["prescan"], spec["amp_nx"]
    for k in range(16):
        amp = ccd[f"C{k // 8}{k % 8}"]
        data = raw[k, :spec["amp_ny"], pre:pre + anx]
        expected = 1700.0 / amp.gain + amp.bias_level
        assert abs(data.mean() - expected) < 1.5


def test_cte_bands_match_dense_matrix():
    """The banded CTE application must reproduce the dense matrix
    product to f32 precision (the band truncation error is < 1e-12
    relative at realistic cti)."""
    import jax.numpy as jnp

    from imsim_tpu.electronics.readout import apply_cte_bands, cte_bands

    rng = np.random.default_rng(0)
    for cti in (1e-6, 5e-6):
        n = 300
        M = cte_matrix(n, cti)
        bands = cte_bands(n, cti)
        x = rng.uniform(0, 1e5, (4, n, 37))
        dense = np.einsum("pq,aqx->apx", M, x)
        banded = np.asarray(apply_cte_bands(jnp.asarray(x, jnp.float32),
                                            jnp.asarray(bands,
                                                        jnp.float32),
                                            axis=1))
        rel = np.abs(banded - dense) / np.maximum(np.abs(dense), 1.0)
        assert rel.max() < 2e-6, rel.max()
        # serial axis too
        y = rng.uniform(0, 1e5, (4, 11, n))
        dense_s = np.einsum("sq,ayq->ays", M, y)
        banded_s = np.asarray(apply_cte_bands(
            jnp.asarray(y, jnp.float32),
            jnp.asarray(bands, jnp.float32), axis=2))
        rel_s = np.abs(banded_s - dense_s) / np.maximum(np.abs(dense_s),
                                                        1.0)
        assert rel_s.max() < 2e-6, rel_s.max()


def test_cte_bands_adaptive_width_high_cti():
    """cte_bands sizes its band from npix*cti (ADVICE r2): a
    user-configured cti ~ 1e-4 on ~2000-pixel transfers (npix*cti ~ 0.2)
    needs more than the nominal-regime 6 bands to match the dense
    matrix at f32 precision."""
    import jax.numpy as jnp

    from imsim_tpu.electronics.readout import apply_cte_bands, cte_bands

    rng = np.random.default_rng(1)
    n, cti = 1000, 5e-4                      # npix*cti = 0.5
    bands = cte_bands(n, cti)
    assert bands.shape[0] > 7, bands.shape   # grew beyond the old fixed 6
    M = cte_matrix(n, cti, ntransfers=40)    # effectively untruncated
    x = rng.uniform(0, 1e5, (2, n, 16))
    dense = np.einsum("pq,aqx->apx", M, x)
    banded = np.asarray(apply_cte_bands(
        jnp.asarray(x, jnp.float32), jnp.asarray(bands, jnp.float32),
        axis=1))
    rel = np.abs(banded - dense) / np.maximum(np.abs(dense), 1.0)
    assert rel.max() < 5e-6, rel.max()
    # nominal regime still gets a small band
    assert cte_bands(2050, 1e-6).shape[0] <= 5
