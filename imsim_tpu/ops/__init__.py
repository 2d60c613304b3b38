"""Compute-op namespace: the jittable device kernels of the hot paths.

Lazy re-exports of the per-photon / per-image device functions —
`from imsim_tpu.ops import field_to_sensor` — mirroring how the
reference groups its photon ops (imsim/photon_ops.py) while the
implementations live next to their physics (photons/, sensor/, image/,
electronics/, psf/).
"""

__all__ = [
    # photon ops (the config photon_ops chain)
    "field_to_sensor",        # fused DCR+diffraction+raytrace+refraction
    "dcr_kick",               # differential chromatic refraction
    "apply_diffraction",      # statistical spider diffraction
    "first_kick_angles",      # phase-screen gather (atmosphere)
    # sensor ops
    "accumulate",             # photon scatter-add binning
    "accumulate_silicon",     # full silicon chain + BF recalc cadence
    "displacement_field",     # BF displacement from accumulated charge
    # image ops
    "render_fft_stamps",      # batched MTF -> irfft2 stamps
    "apply_spikes",           # saturation diffraction-spike overlay
    "bleed_image",            # charge-conserving bleed trails
    "readout_chain",          # gain/crosstalk/CTE/noise amp chain
    # numeric helpers
    "clenshaw_rows",          # per-row Chebyshev evaluation
]

_HOME = {
    "field_to_sensor": ("imsim_tpu.photons.optics_ops", "field_to_sensor"),
    "dcr_kick": ("imsim_tpu.photons.optics_ops", "dcr_kick"),
    "apply_diffraction": ("imsim_tpu.photons.diffraction",
                          "apply_diffraction"),
    "first_kick_angles": ("imsim_tpu.psf.atmosphere", "first_kick_angles"),
    "accumulate": ("imsim_tpu.sensor.simple", "accumulate"),
    "accumulate_silicon": ("imsim_tpu.sensor.silicon",
                           "accumulate_silicon"),
    "displacement_field": ("imsim_tpu.sensor.silicon",
                           "displacement_field"),
    "render_fft_stamps": ("imsim_tpu.image.fft_render",
                          "render_fft_stamps"),
    "apply_spikes": ("imsim_tpu.image.diffraction_fft", "apply_spikes"),
    "bleed_image": ("imsim_tpu.electronics.readout", "bleed_image"),
    "readout_chain": ("imsim_tpu.electronics.readout", "readout_chain"),
    "clenshaw_rows": ("imsim_tpu.utils.lookup", "clenshaw_rows"),
}


def __getattr__(name):
    try:
        mod, sym = _HOME[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(mod), sym)
