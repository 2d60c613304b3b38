"""Corner-raft wavefront/guide sensors (full LsstCam complement).

The reference renders any detector its cameraGeom camera carries —
including the corner-raft SW (wavefront, half-height ITL at ±1.5 mm
focal height, read by imsim/batoid_wcs.py:36) and SG (guider) sensors.
Here: geometry, defocused-donut rendering through the per-detector z
offset, and the 8-amp readout chain."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imsim_tpu.electronics.camera import get_camera

DEG = np.pi / 180


def test_lsstcam_full_complement():
    cam = get_camera("LsstCam")
    assert len(cam.det_names) == 205          # 189 science + 16 corner
    sw0 = cam["R00_SW0"]
    sw1 = cam["R00_SW1"]
    assert sw0.vendor == "ITL_WF"
    assert (sw0.bounds.width, sw0.bounds.height) == (4072, 2000)
    assert sw0.height_mm == -1.5 and sw1.height_mm == 1.5   # intra/extra
    assert len(sw0.amp_names) == 8
    assert len(cam["R00_SG0"].amp_names) == 16
    # science camera unchanged
    assert len(get_camera("LsstCamSim").det_names) == 189


def test_wavefront_donut():
    """A star traced onto an SW sensor through its ±1.5 mm focal offset
    renders as a DONUT: annular image with a central hole at the pupil
    obscuration, outer radius ~ dz / (2 F#)."""
    from imsim_tpu.optics.wcs_factory import make_wcs_factory
    from imsim_tpu.photons.optics_ops import (field_to_sensor,
                                              make_optics_context)
    from imsim_tpu.sensor.simple import accumulate
    from imsim_tpu.photons.batch import PhotonBatch

    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    ccd = get_camera("LsstCam")["R00_SW0"]
    octx = make_optics_context(fac, ccd)
    tel = fac.telescope.for_detector(ccd.det_name,
                                     z_offset=ccd.height_mm * 1e-3)
    # field angle of the sensor center at the defocused plane
    thx, thy = fac.det_field_center(ccd, tel)

    n = 200_000
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    r = jnp.sqrt(0.612**2 * 4.18**2 + u1 * (1 - 0.612**2) * 4.18**2)
    a = u2 * 2 * jnp.pi

    @jax.jit
    def run():
        x, y, dxdz, dydz, f = field_to_sensor(
            k3, tel, octx, jnp.full((n,), thx), jnp.full((n,), thy),
            r * jnp.cos(a), r * jnp.sin(a),
            jnp.full((n,), 622.0),
            jnp.zeros((n,)), jnp.ones((n,)),
            apply_dcr=False, apply_diffraction=False)
        img = jnp.zeros((ccd.bounds.height, ccd.bounds.width),
                        jnp.float32)
        ph = PhotonBatch(x=x, y=y, flux=f, wavelength=None, dxdz=None,
                         dydz=None, pupil_u=None, pupil_v=None,
                         time=None)
        return accumulate(ph, img)

    img = np.asarray(run())
    tot = img.sum()
    # ~28% vignetting is real at the corner sensors' 1.7 deg field
    assert tot > 0.6 * n
    yy, xx = np.mgrid[:img.shape[0], :img.shape[1]]
    cx = (img * xx).sum() / tot
    cy = (img * yy).sum() / tot
    rr = np.hypot(xx - cx, yy - cy)
    # donut: outer radius ~ dz/(2 F#) = 1.5 mm / (2*1.234) = 0.61 mm
    # = 61 px; the obscured core (61 * 0.612 = 37 px) is dark
    inner = img[rr < 20].mean()
    ring = img[(rr > 40) & (rr < 70)].mean()
    outside = img[rr > 90].mean()
    assert ring > 5 * max(inner, 1e-9), (inner, ring)
    assert ring > 5 * max(outside, 1e-9)


def test_wavefront_readout_8amp(tmp_path):
    """The readout chain handles the single-row 8-amp wavefront sensor."""
    from imsim_tpu.electronics.readout import CcdReadout, unsegment_image

    ccd = get_camera("LsstCam")["R40_SW1"]
    eimage = jnp.full((2000, 4072), 100.0, jnp.float32)
    ro = CcdReadout(ccd)
    amps = np.asarray(ro.run(jax.random.PRNGKey(1), eimage))
    assert amps.shape[0] == 8
    spec_nx = 3 + 509 + 64  # ITL raw segment: 576 px wide
    assert amps.shape == (8, 2000 + 48, spec_nx)
    # data region carries signal/gain + bias; overscan only bias
    data = amps[:, :2000, 3:3 + 509]
    oscan = amps[:, 2000 + 10:, 3:3 + 509]
    assert abs(np.median(data) - np.median(oscan) - 100.0 / 1.68) < 8.0


def test_wavefront_sw_visit_end_to_end_amp_file(tmp_path):
    """Drive a corner-raft SW detector through the FULL runner ->
    readout -> raw amp-file path (the 8-amp single-row geometry differs
    from science CCDs; imsim/camera.py:151-170 + readout.py:413-477),
    then re-read the written file and reassemble the eimage from it."""
    from imsim_tpu.config.runner import run_visit
    from imsim_tpu.electronics.readout import VENDOR_SPECS
    from imsim_tpu.io.fits import read_fits
    from imsim_tpu.optics.wcs_factory import make_wcs_factory

    # place one bright star at the SW0 sensor center
    fac = make_wcs_factory(30 * DEG, -20 * DEG, mjd=60674.2, band="r")
    ccd0 = get_camera("LsstCam")["R00_SW0"]
    wcs = fac.get_wcs(ccd0)
    ra, dec = wcs.xy_to_radec(np.array([(ccd0.bounds.width - 1) / 2]),
                              np.array([(ccd0.bounds.height - 1) / 2]))
    d = tmp_path / "in"
    (d / "seds" / "flatSED").mkdir(parents=True)
    w = np.linspace(300, 1150, 120)
    np.savetxt(d / "seds" / "flatSED" / "sed_flat.txt",
               np.column_stack([w, np.ones_like(w)]))
    lines = ["rightascension 30.0", "declination -20.0", "mjd 60674.2",
             "filter 2", "seeing 0.7", "vistime 30.0", "rottelpos 0.0",
             "obshistid 4242", "altitude 60.0",
             f"object 0 {np.degrees(ra[0]):.8f} {np.degrees(dec[0]):.8f}"
             " 18.0 flatSED/sed_flat.txt 0 0 0 0 0 0 point none none"]
    (d / "cat.txt").write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "out")
    results = run_visit(
        {"template": "imsim-config-instcat"},
        overrides=[
            f"input.instance_catalog.file_name={d}/cat.txt",
            f"input.instance_catalog.sed_dir={d}/seds",
            "input.atm_psf.screen_size=102.4",
            "input.atm_psf.screen_scale=0.8",
            f"output.dir={out}",
            "output.camera=LsstCam",
            "output.only_dets=[R00_SW0]",
            "output.file_name=eimage_{det_name}.fits",
            "output.readout.file_name=amp_{det_name}.fits",
            "output.truth.enabled=false",
            "output.cosmic_ray_rate=0.0",
            "image.sky_level=100.0",
            "image.batch_size=65536",
            "image.nbatch=1",
        ])
    assert len(results) == 1
    res = results[0]
    eimage = np.asarray(res["eimage"])
    # half-height ITL wavefront sensor, star flux on top of the sky
    assert eimage.shape == (2000, 4072)
    # sky_level is per arcsec^2: 100 * (0.2")^2 ~ 4 e-/px
    med = np.median(eimage)
    assert 1.0 < med < 20.0, med
    # the mag-18 star renders as a ~120 px donut at the sensor center;
    # its flux must stand above the sky in a central box
    box = eimage[1000 - 150:1000 + 150, 2036 - 150:2036 + 150]
    excess = box.sum() - med * box.size
    assert excess > 1e4, excess
    hdus = read_fits(f"{out}/amp_R00_SW0.fits")
    phdr = hdus[0][0]
    assert phdr["RAFTBAY"] == "R00" and phdr["CCDSLOT"] == "SW0"
    assert len(hdus) == 9                       # primary + 8 amps
    ccd = res["ccd"]
    assert len(ccd.amp_names) == 8
    spec = VENDOR_SPECS[ccd.vendor]
    pre, anx, any_ = spec["prescan"], spec["amp_nx"], spec["amp_ny"]
    recon = np.zeros_like(eimage, np.float64)
    for k, aname in enumerate(ccd.amp_names):
        hdr, data = hdus[1 + k]
        assert hdr["EXTNAME"] == f"Segment{aname[1:]}"
        assert data.shape == (2000 + 48, pre + 509 + 64)
        for kw in ("DATASEC", "DETSEC", "CRPIX1", "GAIN"):
            assert kw in hdr, (aname, kw)
        amp = ccd[aname]
        sec = np.asarray(data[:any_, pre:pre + anx], np.float64)
        sec = (sec - amp.bias_level) * amp.gain
        if amp.raw_flip_x:
            sec = sec[:, ::-1]
        if amp.raw_flip_y:
            sec = sec[::-1, :]
        b = amp.bounds
        recon[b.ymin:b.ymax + 1, b.xmin:b.xmax + 1] = sec
    # reassembly matches the rendered eimage up to dark/noise/CTE
    diff = recon - eimage
    assert abs(np.median(diff)) < 5.0, np.median(diff)
    assert np.std(diff) < 25.0, np.std(diff)
