"""Physical-model namespace: the instrument/sky/atmosphere models in one
place.  Each symbol lazily re-exports the implementing module's public
class or factory — `from imsim_tpu.models import SiliconParams` — so
users browsing for "the sensor model" or "the sky model" need not know
the internal package layout (sensor/, psf/, optics/, image/,
electronics/).
"""

__all__ = [
    "SiliconParams",          # sensor: depth/diffusion/tree rings/BF
    "TreeRings",              # per-detector tree-ring displacement model
    "AtmConfig", "AtmScreens",  # frozen-flow phase-screen atmosphere
    "Telescope",              # raytraceable optical prescription
    "SkyModel",               # sky brightness (dark sky + moon + airglow)
    "CCD_Fringing",           # thinned-CCD fringing surface
    "Camera",                 # 189-CCD focal-plane geometry/electronics
    "Bandpass",               # instrument+atmosphere throughput
]

_HOME = {
    "SiliconParams": ("imsim_tpu.sensor.silicon", "SiliconParams"),
    "TreeRings": ("imsim_tpu.sensor.treerings", "TreeRings"),
    "AtmConfig": ("imsim_tpu.psf.atmosphere", "AtmConfig"),
    "AtmScreens": ("imsim_tpu.psf.atmosphere", "AtmScreens"),
    "Telescope": ("imsim_tpu.optics.telescope", "Telescope"),
    "SkyModel": ("imsim_tpu.image.sky", "SkyModel"),
    "CCD_Fringing": ("imsim_tpu.image.sky", "CCD_Fringing"),
    "Camera": ("imsim_tpu.electronics.camera", "Camera"),
    "Bandpass": ("imsim_tpu.catalog.bandpass", "Bandpass"),
}


def __getattr__(name):
    try:
        mod, sym = _HOME[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(mod), sym)
