"""Sharded full-physics visit rendering over a device mesh.

The 189-CCD axis of a Rubin visit is the reference's output.nproc
process fan-out (SURVEY §2c); here it is the 'ccd' axis of a
jax.sharding.Mesh, and the pooled photon mega-batch is additionally
split over a 'phot' axis whose partial images psum over ICI.  The same
shard_map program runs on a real multi-chip slice or the virtual CPU
mesh (driver dryrun).

Two layers live here:

* `sharded_full_step` / `run_visit_sharded` — the minimal sharded
  pooled-photon step (driver dryrun surface, __graft_entry__).
* `run_visit_mesh` — the PRODUCTION path (config key `output.mesh`):
  the complete per-CCD pipeline of config/runner.render_one_ccd
  (classify -> FFT bright-star pass -> block-paired pooled photon loop
  -> sky/noise -> cosmic rays -> readout chain -> eimage/amp/truth
  files) with the photon loop and the per-CCD image-space stages
  sharded over the mesh.  Per-CCD state (telescope with per-detector
  focus, optics context, tree-ring silicon, images) is stacked along
  the leading axis and sharded P('ccd'); shared state (atmosphere
  screens, second-kick table) is replicated.  The 'phot' axis processes
  CONSECUTIVE GLOBAL BATCHES concurrently (batch b = outer*M + p on
  phot shard p), so the block-paired antithetic layout inside each
  batch — and the serial path's per-batch RNG streams — are preserved
  exactly.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..image import render
from ..sensor.silicon import accumulate_silicon
from ..sensor.simple import accumulate
from .mesh import make_mesh, stack_scenes


def stack_pytrees(items):
    """Stack a list of identical-structure pytrees along axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *items)


def pad_scene(scene, n_pad: int, m_pad: int = None):
    """Pad a DeviceScene to n_pad objects (and m_pad aux clouds) so
    per-CCD scenes stack along a mesh 'ccd' axis.  Padding rows repeat
    the last object (dead photons carry weight 0, so the values only
    need to be finite)."""
    n = scene.params.shape[0]
    if m_pad is None:
        m_pad = scene.aux_cloud.shape[0]

    def pad_rows(a, target):
        if a is None or a.shape[0] >= target:
            return a
        reps = jnp.broadcast_to(a[-1:], (target - a.shape[0],)
                                + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    return dataclasses.replace(
        scene,
        params=pad_rows(scene.params, n_pad),
        wl_icdf=pad_rows(scene.wl_icdf, n_pad),
        labs_icdf=pad_rows(scene.labs_icdf, n_pad),
        wl_cheb=pad_rows(scene.wl_cheb, n_pad),
        aux_cloud=pad_rows(scene.aux_cloud, m_pad)) if n < n_pad or \
        scene.aux_cloud.shape[0] < m_pad else scene


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
    psum over the 'phot' axis (psum of the DELTA only, so a nonzero
    carried-in image is not multiplied by the phot-axis size)."""
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
        img = image + jax.lax.psum(img - image, axis_name="phot")
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


# --------------------------------------------------------------------------
# Production mesh visit: the full render_one_ccd pipeline over a mesh
# --------------------------------------------------------------------------

def mesh_pooled_step(mesh: Mesh, nb: int, batch_size: int, pair: int,
                     n_phot: int, nsub: int, exptime: float,
                     chromatic_exponent: float, wl_ref: float,
                     use_silicon: bool, use_optics: bool,
                     share: int = 1):
    """Jitted sharded production step: phot shard p of outer step k runs
    GLOBAL batch b = k*n_phot + p of the block-paired pooled loop —
    exactly the serial `_pooled_batch_step` per (ccd, batch), with the
    per-batch image deltas and realized-flux scatters psum'd over the
    'phot' axis.

    Global shapes:
      keys / si_keys (C, M, 2)  per-(ccd, batch) RNG keys (host-derived
                                from the SAME streams as the serial path)
      scenes          stacked DeviceScene, leading (C, ...)
      obj_maps        (C, batch_size, nb) int32
      cums            (C, n_pad) int32
      totals          (C,) int32
      tels/ctxs/sils  stacked per-CCD pytrees
      screens/sk      replicated pytrees (or None)
      images          (C, H, W) float32
      realized        (C, n_pad) float32
    """
    def per_shard(keys, si_keys, scene, obj_map, cum, total, tel, octx,
                  screens, sk_table, sil, image, realized, b_outer):
        key = keys[0, 0]
        si_key = si_keys[0, 0]
        scene = jax.tree.map(lambda a: a[0], scene)
        obj_map = obj_map[0]
        cum = cum[0]
        total = total[0]
        tel = jax.tree.map(lambda a: a[0], tel)
        octx = jax.tree.map(lambda a: a[0], octx)
        sil = jax.tree.map(lambda a: a[0], sil) if sil is not None \
            else None
        image = image[0]
        realized0 = realized[0]

        from ..image.photon_pooling import (batch_from_obj_map,
                                            materialize_rows_T)

        p = jax.lax.axis_index("phot")
        b = b_outer * n_phot + p
        live = (b < nb).astype(jnp.float32)
        b_eff = jnp.minimum(b, nb - 1)
        obj_idx, w = batch_from_obj_map(obj_map, total, b_eff, nb,
                                        batch_size, pair, share)
        w = w * live
        mat = scene.params if scene.wl_cheb is None else jnp.concatenate(
            [scene.params, scene.wl_cheb], axis=1)
        row = materialize_rows_T(mat, cum, b_eff, nb, batch_size, pair,
                                 share)
        if use_optics:
            photons = render.shoot_full(
                key, scene, obj_idx, w, tel, octx, screens=screens,
                sk_table=sk_table, exptime=exptime, row=row,
                pupil_pairing=pair, screen_share=share,
                chromatic_exponent=chromatic_exponent, wl_ref=wl_ref)
        else:
            from ..photons import profiles as Pr
            kolm = Pr.kolmogorov_cdf()
            photons = render.shoot(
                key, scene, obj_idx, w,
                {"kolmogorov": kolm, "gauss_sigma": 0.3 / 2.3548},
                exptime=exptime, row=row)
        if sil is not None:
            img = accumulate_silicon(si_key, photons, image, sil,
                                     nsub=nsub)
        else:
            img = accumulate(photons, image)
        img = image + jax.lax.psum(img - image, axis_name="phot")
        r_delta = jnp.zeros_like(realized0).at[obj_idx].add(
            photons.flux, mode="drop")
        realized_new = realized0 + jax.lax.psum(r_delta,
                                                axis_name="phot")
        return img[None], realized_new[None]

    from jax import shard_map

    step = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("ccd", "phot"), P("ccd", "phot"), P("ccd"),
                  P("ccd"), P("ccd"), P("ccd"), P("ccd"), P("ccd"),
                  P(), P(), P("ccd"), P("ccd"), P("ccd"), P()),
        out_specs=(P("ccd"), P("ccd")),
        check_vma=False,
    )
    return jax.jit(step)


def _parse_mesh_cfg(mesh_cfg, ndev: int):
    """`output.mesh` -> (n_ccd_axis, n_phot_axis).  Accepts `auto`/true
    (all devices on the ccd axis), an int (ccd axis size), or
    {ccd: C, phot: M}."""
    if mesh_cfg in (True, "auto"):
        return ndev, 1
    if isinstance(mesh_cfg, (int, float, str)):
        return int(mesh_cfg), 1
    c = int(mesh_cfg.get("ccd", ndev))
    m = int(mesh_cfg.get("phot", 1))
    return c, m


def run_visit_mesh(ctx, dets, mesh_cfg, logger=None):
    """The production multi-device visit (config key `output.mesh`):
    render `dets` in blocks of the mesh's 'ccd' axis through the FULL
    per-CCD pipeline and write the standard outputs per CCD.

    The reference fans CCDs out as processes (output.nproc,
    imsim/ccd.py + config/imsim-config.yaml:326); here a block of CCDs
    is one sharded device program: photon batches ride the ('ccd',
    'phot') mesh, sky/noise and the readout chain ride 'ccd', and host
    work (catalog prep, cosmic rays, FITS writes) overlaps per CCD.
    """
    from jax.sharding import Mesh

    from ..config import runner as R
    from ..image.photon_pooling import (FFT, _fft_pass, classify_objects,
                                        make_psf_mtf, pooled_plan)
    from ..io.checkpoint import Checkpointer
    from ..utils.rng import stream

    n_ccd_axis, n_phot_axis = _parse_mesh_cfg(mesh_cfg,
                                              len(jax.devices()))
    C_max, M = n_ccd_axis, n_phot_axis
    results = []

    ck_cfg = ctx.cfg.get("input", {}).get("checkpoint", {}) or {}
    track = bool((ctx.cfg.get("output", {}).get("truth", {})
                  or {}).get("enabled", True))

    for blk_start in range(0, len(dets), C_max):
        block = dets[blk_start:blk_start + C_max]
        preps = [R.prepare_ccd(ctx, d, logger) for d in block]
        # the block's mesh uses exactly as many 'ccd' rows as there are
        # detectors left — a short final block leaves devices idle
        # instead of burning them on dead-shard work
        C = len(preps)
        n_live = C
        mesh = make_mesh(C, M)

        shapes = {(p.pcfg.ysize, p.pcfg.xsize) for p in preps}
        assert len(shapes) == 1, (
            "output.mesh blocks need uniform CCD shapes; render "
            f"mixed-geometry detectors serially (got {shapes})")
        H, W = preps[0].pcfg.ysize, preps[0].pcfg.xsize
        pcfg0 = preps[0].pcfg
        use_optics = preps[0].use_optics
        use_silicon = preps[0].silicon is not None

        # ---- per-CCD classification + FFT bright-star pass ----------
        images0, modes_l, realized_l, plans = [], [], [], []
        for j, p in enumerate(preps):
            img = jnp.zeros((H, W), jnp.float32)
            live = j < n_live
            host = p.host if live else None
            if host is None or host.n_objects == 0:
                images0.append(img)
                modes_l.append(None)
                realized_l.append(np.zeros(1))
                plans.append((np.zeros(1, np.int32), 0, 1, 1))
                continue
            psf_mtf = make_psf_mtf(p.pcfg)
            modes = classify_objects(host, p.pcfg, psf_mtf)
            realized = np.zeros(host.scene.n, np.float64)
            if np.any(modes == FFT):
                img, fft_realized = _fft_pass(
                    img, host, modes, p.pcfg, psf_mtf,
                    ctx.seed + p.det_num, spikes=p.spikes,
                    vign=p.fft_vign, logger=logger)
                realized[:host.n_objects] += fft_realized
            cum, total, nbp, bsp = pooled_plan(host, modes, p.pcfg)
            images0.append(img)
            modes_l.append(modes)
            realized_l.append(realized)
            plans.append((cum, total, nbp, bsp))

        # common static batch geometry for the block
        pair = pcfg0.pupil_pairing
        share = max(pcfg0.screen_share, 1) if pair > 1 else 1
        nb = max(pl[2] for pl in plans)
        batch_size = max(pl[3] for pl in plans)
        pe = max(pair, 1) * share
        batch_size = -(-batch_size // pe) * pe
        n_pad = max(p.host.scene.n if p.host is not None else 1
                    for p in preps)
        m_pad = max(p.host.scene.aux_cloud.shape[0]
                    if p.host is not None else 1 for p in preps)

        # ---- stacked device state ------------------------------------
        dummy_scene = next(p.host.scene for p in preps
                           if p.host is not None)
        scenes = stack_scenes([
            pad_scene(p.host.scene if p.host is not None else dummy_scene,
                      n_pad, m_pad) for p in preps])
        tels = stack_pytrees([p.tel32 for p in preps])
        octxs = stack_pytrees([p.octx for p in preps])
        sils = stack_pytrees([p.silicon for p in preps]) \
            if use_silicon else None
        cums = np.zeros((C, n_pad), np.int32)
        totals = np.zeros((C,), np.int32)
        for j, (cum, total, _, _) in enumerate(plans):
            cums[j, :len(cum)] = cum
            cums[j, len(cum):] = cum[-1] if len(cum) else 0
            totals[j] = total
        sh_ccd = NamedSharding(mesh, P("ccd"))
        # build all obj maps in ONE sharded program so each (batch_size,
        # nb) map materializes directly on its CCD's devices (per-device
        # memory = the serial path's single map)
        from ..image.photon_pooling import build_obj_map
        obj_maps = jax.jit(
            jax.vmap(partial(build_obj_map, nb=nb,
                             batch_size=batch_size, pair=pair,
                             share=share)),
            in_shardings=(sh_ccd, sh_ccd), out_shardings=sh_ccd)(
            jax.device_put(jnp.asarray(cums), sh_ccd),
            jax.device_put(jnp.asarray(totals), sh_ccd))
        images = jax.device_put(jnp.stack(images0), sh_ccd)
        realized_dev = jax.device_put(
            jnp.zeros((C, n_pad), jnp.float32), sh_ccd)

        step = mesh_pooled_step(
            mesh, nb, batch_size, pair, M, pcfg0.nsub, pcfg0.exptime,
            pcfg0.chromatic_exponent, pcfg0.wl_ref, use_silicon,
            use_optics, share=share)

        # ---- block checkpoint (crash-safe mesh resume) ---------------
        blk_ckpt = None
        start_outer = 0
        if ck_cfg.get("dir"):
            visit = int(ctx.opsim.get("observationId", 0))
            blk_ckpt = Checkpointer(
                f"checkpoint_mesh_{visit}_{blk_start}.h5",
                dir=ck_cfg["dir"])
            saved = blk_ckpt.load("mesh")
            if saved is not None:
                images = jax.device_put(jnp.asarray(saved["images"]),
                                        sh_ccd)
                realized_dev = jax.device_put(
                    jnp.asarray(saved["realized"]), sh_ccd)
                start_outer = int(saved["next_outer"])
                if logger:
                    logger.info("mesh block %d resumed at outer step %d",
                                blk_start, start_outer)

        # ---- the sharded pooled loop ---------------------------------
        n_outer = -(-nb // M)
        for k in range(start_outer, n_outer):
            keys = np.stack([
                np.stack([np.asarray(stream(ctx.seed + p.det_num,
                                            "photons", k * M + q))
                          for q in range(M)]) for p in preps])
            si_keys = np.stack([
                np.stack([np.asarray(stream(ctx.seed + p.det_num,
                                            "si", k * M + q))
                          for q in range(M)]) for p in preps])
            images, realized_dev = step(
                jnp.asarray(keys), jnp.asarray(si_keys), scenes,
                obj_maps, jnp.asarray(cums), jnp.asarray(totals), tels,
                octxs, ctx.screens if use_optics else None,
                preps[0].sk_table if use_optics else None, sils, images,
                realized_dev, jnp.int32(k))
            if blk_ckpt is not None:
                images.block_until_ready()
                blk_ckpt.save("mesh", dict(
                    images=np.asarray(images),
                    realized=np.asarray(realized_dev),
                    next_outer=k + 1))

        # ---- sharded sky + noise -------------------------------------
        from ..utils.grid import coarse_shape

        vstep = 32
        gh, gw = coarse_shape((H, W), vstep)
        levels = np.zeros(C, np.float32)
        grads = np.zeros((C, 3), np.float32)
        grads[:, 2] = 1.0
        vigs = np.ones((C, gh, gw), np.float32)
        fringes = None
        for j, p in enumerate(preps[:n_live]):
            pieces = R._sky_noise_pieces(ctx, p, vig_step=vstep)
            if pieces is None:
                continue
            levels[j], grad, vigs[j] = (pieces[0],
                                        pieces[1], pieces[2])
            grads[j] = [float(g) for g in grad]
            if pieces[4] is not None:
                if fringes is None:
                    fringes = np.ones((C, H, W), np.float32)
                fringes[j] = pieces[4]
        if np.any(levels > 0):
            sky_keys = np.stack([np.asarray(stream(ctx.seed, "sky",
                                                   p.det_num))
                                 for p in preps])
            images = _sky_sharded(mesh, pcfg0.pixel_scale, vstep,
                                  with_fringe=fringes is not None)(
                jnp.asarray(sky_keys), images, jnp.asarray(levels),
                jnp.asarray(grads), jnp.asarray(vigs),
                *(() if fringes is None else (jnp.asarray(fringes),)))

        # ---- host: cosmic rays ---------------------------------------
        eimages = np.array(images)  # writable host copy
        for j, p in enumerate(preps[:n_live]):
            eimages[j] = R._paint_cosmic_rays(ctx, p.det_num, eimages[j],
                                              p.exptime, logger)

        # ---- sharded readout chain -----------------------------------
        r_cfg = ctx.cfg.get("output", {}).get("readout", {}) or {}
        amps_by_j = {}
        if r_cfg.get("enabled", True):
            amps_by_j = _readout_sharded(ctx, mesh, preps[:n_live],
                                         eimages, r_cfg)

        # ---- host: outputs -------------------------------------------
        realized_h = np.asarray(realized_dev)
        for j, p in enumerate(preps[:n_live]):
            realized = np.asarray(realized_l[j], np.float64).copy()
            if p.host is not None:
                realized[:len(realized_h[j])] += \
                    realized_h[j][:len(realized)]
            result = dict(det_name=p.det_name, det_num=p.det_num,
                          eimage=eimages[j], wcs=p.wcs,
                          modes=modes_l[j], host=p.host, ccd=p.ccd,
                          table=p.table, realized=realized)
            if j in amps_by_j:
                result["amps"] = amps_by_j[j]
            R.write_outputs(ctx, result, logger)
            results.append(result)
    return results


def _sky_sharded(mesh: Mesh, pixel_scale: float, vig_step: int = 1,
                 with_fringe: bool = False):
    """jit(vmap(_add_sky_and_noise)) with P('ccd') shardings: the sky +
    gradient + vignetting/fringing + Poisson stage runs one program for
    the whole block, partitioned over the mesh.  Vignetting rides as a
    stride-vig_step coarse grid (128 KB/CCD instead of 64 MB/CCD in the
    stacked block) and upsamples inside the sharded program."""
    from ..image.ccd_render import _add_sky_and_noise

    def one(key, image, level, grad, vig, fringe=None):
        return _add_sky_and_noise(key, image, level,
                                  (grad[0], grad[1], grad[2]), vig,
                                  pixel_scale, vig_step=vig_step,
                                  fringe=fringe)

    sh = NamedSharding(mesh, P("ccd"))
    n_in = 6 if with_fringe else 5
    return jax.jit(jax.vmap(one),
                   in_shardings=(sh,) * n_in,
                   out_shardings=sh)


def _readout_sharded(ctx, mesh: Mesh, preps, eimages, r_cfg):
    """Device readout for a block, partitioned P('ccd') per vendor group
    (segment geometry is static per vendor).  Returns {block_index:
    (n_amp, raw_ny, raw_nx) int32 numpy}."""
    from ..electronics.readout import VENDOR_SPECS, CcdReadout, \
        readout_chain
    from ..utils.rng import stream

    C = mesh.shape["ccd"]
    exptime = float(ctx.opsim.get("exptime", 30.0))
    groups = {}
    for j, p in enumerate(preps):
        groups.setdefault(p.ccd.vendor, []).append(j)
    out = {}
    for vendor, idxs in groups.items():
        ros = [CcdReadout(
            preps[j].ccd,
            readout_time=float(r_cfg.get("readout_time", 2.0)),
            dark_current=float(r_cfg.get("dark_current", 0.02)),
            scti=float(r_cfg.get("scti", 1e-6)),
            pcti=float(r_cfg.get("pcti", 1e-6))) for j in idxs]
        # pad the group to a multiple of the 'ccd' axis size (repeat
        # last entry; padded outputs are sliced off below)
        G = len(idxs)
        pad_len = (-G) % C
        padded = idxs + [idxs[-1]] * pad_len
        ros_p = ros + [ros[-1]] * pad_len
        keys = jnp.stack([stream(ctx.seed, "readout", preps[j].det_num)
                          for j in padded])
        imgs = jnp.asarray(np.stack([eimages[j] for j in padded]))
        gains = jnp.stack([r.gains for r in ros_p])
        xtalks = jnp.stack([r.xtalk for r in ros_p])
        biases = jnp.stack([r.bias_levels for r in ros_p])
        noises = jnp.stack([r.read_noises for r in ros_p])
        pctes = jnp.stack([r.pcte for r in ros_p])
        sctes = jnp.stack([r.scte for r in ros_p])
        fw = jnp.asarray([float(r.full_well) for r in ros_p],
                         jnp.float32)
        spec = VENDOR_SPECS[vendor]

        def one(key, image, g, x, bl, rn, pc, sc, f):
            raw = readout_chain(
                key, image, g, x, bl, rn, pc, sc, vendor, f,
                spec["midline_bleed_stop"],
                float(r_cfg.get("dark_current", 0.02)), exptime,
                float(r_cfg.get("readout_time", 2.0)))
            return jnp.round(raw).astype(jnp.int32)

        sh = NamedSharding(mesh, P("ccd"))
        amps = jax.jit(jax.vmap(one),
                       in_shardings=(sh,) * 9,
                       out_shardings=sh)(
            keys, imgs, gains, xtalks, biases, noises, pctes, sctes, fw)
        amps = np.asarray(amps)
        for slot, j in enumerate(idxs):
            out[j] = amps[slot]
    return out
