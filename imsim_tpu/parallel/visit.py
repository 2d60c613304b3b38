"""Sharded full-physics visit rendering over a device mesh.

The 189-CCD axis of a Rubin visit is the reference's output.nproc
process fan-out (SURVEY §2c); here it is the 'ccd' axis of a
jax.sharding.Mesh, and the pooled photon mega-batch is additionally
split over a 'phot' axis whose partial images psum over ICI.  The same
shard_map program runs on a real multi-chip slice or the virtual CPU
mesh (driver dryrun).

Per-CCD state (telescope with per-detector focus, optics context with
detector geometry, images) is stacked along the leading axis and
sharded P('ccd'); shared state (atmosphere screens, second-kick table,
scene if common) is replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..image import render
from ..sensor.silicon import accumulate_silicon
from ..sensor.simple import accumulate
from .mesh import stack_scenes


def stack_pytrees(items):
    """Stack a list of identical-structure pytrees along axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *items)


def sharded_full_step(mesh: Mesh, xsize: int, ysize: int,
                      exptime: float = 30.0, use_silicon: bool = False,
                      nsub: int = 2):
    """Jitted sharded step of the FULL chain:

      (keys(n_ccd,2), scenes[n_ccd,...], obj_idx(n_ccd,N),
       weight(n_ccd,N), tels[n_ccd-stacked pytree],
       ctxs[n_ccd-stacked pytree], screens(replicated|None),
       sk_y(K,)|None, silicon(replicated|None), images(n_ccd,H,W))
      -> images

    obj_idx/weight are sharded over ('ccd', 'phot'); each phot shard
    traces its photons through the shared optics and the partial images
    psum over the 'phot' axis.
    """
    def per_shard(key, scene, obj_idx, weight, tel, ctx, screens, sk_y,
                  sil, image):
        key = key[0]
        scene = jax.tree.map(lambda a: a[0], scene)
        obj_idx = obj_idx[0]
        weight = weight[0]
        tel = jax.tree.map(lambda a: a[0], tel)
        ctx = jax.tree.map(lambda a: a[0], ctx)
        image = image[0]
        key = jax.random.fold_in(key, jax.lax.axis_index("phot"))

        sk_table = None
        if sk_y is not None:
            from ..utils.lookup import UniformTable
            sk_table = UniformTable(0.0, 1.0 / (sk_y.shape[0] - 1), sk_y)
        # pupil_pairing=1: this path's batches are host-strided, not
        # block-paired (photon_pooling.build_obj_map), so pairing mates
        # at slots (s, s+m) would hold DIFFERENT objects and the shared
        # screen gather would sample the wrong field position.  The
        # per-CCD pooled path is where pairing pays off.
        photons = render.shoot_full(
            key, scene, obj_idx, weight, tel, ctx, screens=screens,
            sk_table=sk_table, exptime=exptime, pupil_pairing=1)
        if sil is not None:
            img = accumulate_silicon(jax.random.fold_in(key, 7), photons,
                                     image, sil, nsub=nsub)
        else:
            img = accumulate(photons, image)
        img = jax.lax.psum(img, axis_name="phot")
        return img[None]

    from jax import shard_map

    step = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("ccd"), P("ccd"), P("ccd", "phot"), P("ccd", "phot"),
                  P("ccd"), P("ccd"), P(), P(), P(), P("ccd")),
        out_specs=P("ccd"),
        check_vma=False,
    )
    return jax.jit(step, static_argnames=())


def run_visit_sharded(ctx_list, host_list, mesh: Mesh, cfg,
                      screens=None, sk_y=None, silicon=None, seed=0):
    """Render len(ctx_list) CCDs over the mesh's 'ccd' axis.

    ctx_list: [(tel, optics_ctx)] per CCD; host_list: SceneHost per CCD.
    Returns (n_ccd, H, W) images.  Batch loop stays on host; every batch
    is one sharded device step (the output.nproc-with-batching analog).
    """
    from ..image.scene import make_photon_batches

    n_ccd = len(host_list)
    tels = stack_pytrees([t for t, _ in ctx_list])
    ctxs = stack_pytrees([c for _, c in ctx_list])
    scenes = stack_scenes([h.scene for h in host_list])
    H, W = cfg.ysize, cfg.xsize
    images = jnp.zeros((n_ccd, H, W), jnp.float32)
    step = sharded_full_step(mesh, W, H, exptime=cfg.exptime,
                             use_silicon=silicon is not None,
                             nsub=getattr(cfg, "nsub", 2))

    # per-CCD photon batch iterators, padded to a common batch count
    iters = [list(make_photon_batches(h, cfg.batch_size))
             for h in host_list]
    nbatch = max(len(it) for it in iters)
    N = cfg.batch_size
    for b in range(nbatch):
        idx_b = []
        w_b = []
        for it, h in zip(iters, host_list):
            if b < len(it):
                idx, w = it[b]
            else:
                idx = jnp.full((N,), h.scene.n - 1, jnp.int32)
                w = jnp.zeros((N,), jnp.float32)
            idx_b.append(idx)
            w_b.append(w)
        keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(seed + i),
                                             b) for i in range(n_ccd)])
        images = step(keys, scenes, jnp.stack(idx_b), jnp.stack(w_b),
                      tels, ctxs, screens, sk_y, silicon, images)
    return images
