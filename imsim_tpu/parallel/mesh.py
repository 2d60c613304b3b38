"""Multi-chip sharding of visit rendering.

The reference's parallelism is process-level fan-out over CCDs
(output.nproc, SURVEY.md §2c).  TPU-native replacement:

  * 'ccd' mesh axis  — data parallel over detectors: each device renders
    its own CCD(s) of the 189-detector focal plane (the output.nproc
    analog, config/imsim-config.yaml:326).
  * 'phot' mesh axis — photon-parallel *within* a CCD: the pooled photon
    mega-batch is sharded over devices; partial images are reduced with
    psum (this is the "tensor parallel" axis; it rides ICI).

Both are expressed with shard_map over a Mesh so XLA inserts the
collectives; visit-level fan-out across hosts uses the same code over a
DCN-spanning mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..photons import profiles as Pr
from ..sensor.simple import accumulate
from ..image import render
from ..image.scene import DeviceScene


def make_mesh(n_ccd: int, n_phot: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if len(devices) < n_ccd * n_phot:
            # fall back to the virtual-CPU mesh (driver dryrun path)
            devices = jax.devices("cpu")
    assert len(devices) >= n_ccd * n_phot, (
        f"need {n_ccd * n_phot} devices, have {len(devices)}")
    dev = np.asarray(devices[: n_ccd * n_phot]).reshape(n_ccd, n_phot)
    return Mesh(dev, axis_names=("ccd", "phot"))


def sharded_render_step(mesh: Mesh, xsize: int, ysize: int,
                        exptime: float = 30.0, pixel_scale: float = 0.2):
    """Build a jitted step: (keys, scenes, obj_idx, weight, kolm_y, images)
    -> updated images.

    Shapes (global):
      keys     (n_ccd, 2)            uint32 per-CCD RNG keys
      scenes   DeviceScene with leading (n_ccd, ...) axis
      obj_idx  (n_ccd, N) int32      photon->object map, sharded over phot
      weight   (n_ccd, N) float32
      kolm_y   (K,) float32          Kolmogorov inverse-CDF table values
      images   (n_ccd, ysize, xsize)
    """
    kolm0 = Pr.kolmogorov_cdf()

    def per_shard(key, scene, obj_idx, weight, kolm_y, image):
        # strip the leading per-shard CCD axis (=1 block)
        key = key[0]
        scene = jax.tree.map(lambda a: a[0], scene)
        obj_idx = obj_idx[0]
        weight = weight[0]
        image = image[0]
        # decorrelate photon shards
        key = jax.random.fold_in(key, jax.lax.axis_index("phot"))
        tab = type(kolm0)(kolm0.x0, kolm0.dx, kolm_y)
        photons = render.shoot(
            key, scene, obj_idx, weight,
            {"kolmogorov": tab, "gauss_sigma": 0.3 / 2.3548},
            exptime=exptime, pixel_scale=pixel_scale)
        img = accumulate(photons, image)
        # reduce partial images over the photon axis
        img = jax.lax.psum(img, axis_name="phot")
        return img[None]

    from jax import shard_map

    step = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("ccd"), P("ccd"), P("ccd", "phot"), P("ccd", "phot"),
                  P(), P("ccd")),
        out_specs=P("ccd"),
        check_vma=False,
    )
    return jax.jit(step)


def stack_scenes(scenes) -> DeviceScene:
    """Stack per-CCD DeviceScenes along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
