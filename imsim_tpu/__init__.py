"""imsim_tpu — TPU-native LSST image simulation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
LSSTDESC/imSim: catalog -> photons -> atmosphere/optics -> silicon ->
electronics readout, producing DM-ingestible FITS, sharded over TPU
meshes for full-focal-plane visits.
"""
__version__ = "0.1.0"
