"""imsim_tpu — TPU-native LSST image simulation framework.

A ground-up JAX/XLA re-design with the capabilities of LSSTDESC/imSim:
catalog -> photons -> atmosphere/optics -> silicon -> electronics
readout, producing DM-ingestible FITS, sharded over TPU meshes for
full-focal-plane visits.

Quick start::

    python -m imsim_tpu user.yaml output.det_num="[94]"

or programmatically::

    from imsim_tpu import run_visit
    results = run_visit("user.yaml")
"""
from ._version import __version__, __version_info__  # noqa: F401

__all__ = ["run_visit", "load_config", "__version__"]


def __getattr__(name):  # lazy: keep `import imsim_tpu` light
    if name == "run_visit":
        from .config.runner import run_visit
        return run_visit
    if name == "load_config":
        from .config.interpreter import load_config
        return load_config
    raise AttributeError(name)
