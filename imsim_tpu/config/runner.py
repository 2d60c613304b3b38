"""Visit runner: config -> rendered CCDs on disk.

The LSST_CCD output pipeline (imsim/ccd.py + imsim/lsst_image.py +
imsim/readout.py orchestration, SURVEY §3.1) as one explicit flow:

  inputs (opsim metadata, telescope, atmosphere, sky model, tree rings,
  vignetting, checkpointer, catalog)
  -> per detector: WCS -> culled scene -> pooled photon render (full
     optics chain) -> sky + noise -> cosmic rays -> eimage FITS
     -> readout chain -> RICE amp FITS -> truth catalog

Detector-level parallelism: detectors are independent; `run_visit`
renders them sequentially on one chip, `parallel.visit.run_visit_sharded`
fans them out across a device mesh (the output.nproc analog).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..catalog import opsim as opsim_mod
from ..catalog.bandpass import rubin_bandpass
from ..catalog.instcat import read_instcat
from ..electronics.camera import PIXEL_SIZE_MM, get_camera
from ..electronics.readout import CcdReadout
from ..image import scene as scene_mod
from ..image.ccd_render import _add_sky_and_noise
from ..image.cosmic_rays import paint_cosmic_rays
from ..image.photon_pooling import PoolingConfig, render_ccd_pooled
from ..image.sky import CCD_Fringing, SkyGradient, SkyModel, \
    sensor_fringing_seed
from ..image.vignetting import Vignetting
from ..io.checkpoint import Checkpointer
from ..io.fits import HDU, write_fits
from ..meta_data import resolve_data_path as _data
from ..optics.wcs_factory import WCSFactory, make_wcs_factory
from ..photons.optics_ops import make_optics_context
from ..psf.atmosphere import AtmConfig, second_kick_table
from ..sensor.silicon import SiliconParams
from ..sensor.treerings import TreeRings
from ..utils.rng import stream
from .interpreter import ConfigView, load_config
from .registry import register_extra_output

DEG = np.pi / 180.0


@dataclasses.dataclass
class VisitContext:
    """Everything shared across the visit's detectors."""

    cfg: dict
    view: ConfigView
    opsim: opsim_mod.OpsimData
    camera: object
    telescope: object           # LoadedTelescope
    wcs_factory: WCSFactory
    bandpass: object
    sky_model: SkyModel
    tree_rings: TreeRings
    vignetting: Vignetting
    atm_cfg: AtmConfig | None
    screens: object | None
    seed: int


def build_visit_context(cfg: dict, logger=None) -> VisitContext:
    """Build the visit-scoped singletons, routing every input.<name>
    section through INPUT_TYPES (the reference's RegisterInputType /
    ProcessInput contract): replace a registry entry to swap an input
    implementation."""
    from .registry import INPUT_TYPES

    view = ConfigView(cfg)
    # --- opsim metadata -----------------------------------------------------
    ods = INPUT_TYPES["opsim_data"](
        cfg.get("input", {}).get("opsim_data"), view)
    view.state["opsim_data"] = ods
    band = ods.get("band", "r")
    seed = int(ods.get("seed", 42))
    # with the visit metadata known, $-expressions and @-references
    # anywhere in the tree collapse to values
    from .interpreter import deep_resolve

    cfg = deep_resolve(view, cfg)
    view.cfg = cfg

    # --- telescope + atmosphere (doOpt mutates the telescope, so the
    # atm_psf input runs before the WCS factory raytraces it) ---------
    in_cfg = cfg.get("input", {}) or {}
    telescope = INPUT_TYPES["telescope"](in_cfg.get("telescope"), view)
    view.state["telescope"] = telescope
    atm_cfg, screens = INPUT_TYPES["atm_psf"](in_cfg.get("atm_psf"),
                                              view)

    # --- WCS factory ----------------------------------------------------------
    ra = float(ods.get("fieldRA", 0.0)) * DEG
    dec = float(ods.get("fieldDec", 0.0)) * DEG
    view.state["boresight"] = (ra, dec)
    wcfg = cfg.get("image", {}).get("wcs", {}) or {}
    weather = {}
    if wcfg.get("pressure") is not None:
        weather["pressure_kpa"] = float(wcfg["pressure"])
    if wcfg.get("temperature") is not None:
        weather["temperature_k"] = float(wcfg["temperature"])
    if wcfg.get("H2O_pressure") is not None:
        weather["h2o_pressure_kpa"] = float(wcfg["H2O_pressure"])
    if wcfg.get("order") is not None:
        # SIP fit order (imsim/batoid_wcs.py:429-453 default 3)
        weather["order"] = int(wcfg["order"])
    if wcfg.get("dut1") is not None:
        # measured UT1-UTC [s]; overrides any EOP-file value
        weather["dut1"] = float(wcfg["dut1"])
    if wcfg.get("eop_file"):
        # IERS finals2000A.all path: measured UT1-UTC + polar motion
        # (the reference ships data/19-10-30-finals2000A.all; its own
        # erfa chain runs with IERS lookups disabled, imsim/utils.py:19-28
        # — this key turns the real EOP on)
        weather["eop"] = _data(wcfg["eop_file"])
    fac = make_wcs_factory(ra, dec, float(ods.get("mjd_mid", 60674.0)),
                           band=band, telescope=telescope, **weather)

    # --- bandpass, sky, sensors, vignetting ----------------------------------
    bp_cfg = cfg.get("image", {}).get("bandpass", {}) or {}
    tp_dir = _data(bp_cfg.get("throughputs_dir"))
    if tp_dir:
        # measured rubin_sim throughput files (imsim/bandpass.py:60-185)
        from ..catalog.bandpass import rubin_bandpass_from_files

        bandpass = rubin_bandpass_from_files(
            band, tp_dir, airmass=float(ods.get("airmass", 1.0)))
    else:
        bandpass = rubin_bandpass(band,
                                  airmass=float(ods.get("airmass", 1.0)))
    exptime = float(ods.get("exptime", 30.0))
    sky_sed = None
    sed_file = (cfg.get("image", {}) or {}).get("sky_sed_file")
    if sed_file:
        # loadable sky spectrum (image/sky_sed.py) — the rubin_sim
        # ESO-model data path of imsim/sky_model.py:33-87
        from ..image.sky_sed import load_sky_sed

        sky_sed = load_sky_sed(_data(sed_file))
    view.state["bandpass"] = bandpass
    view.state["sky_sed"] = sky_sed
    sky_model = INPUT_TYPES["sky_model"](in_cfg.get("sky_model"), view)
    tree_rings = INPUT_TYPES["tree_rings"](in_cfg.get("tree_rings"),
                                           view)
    view.state["tree_rings"] = tree_rings
    vignetting = INPUT_TYPES["vignetting"](in_cfg.get("vignetting"),
                                           view)

    cam_name = cfg.get("output", {}).get("camera", "LsstCamSim")
    r_cfg0 = cfg.get("output", {}).get("readout", {}) or {}
    camera = get_camera(
        cam_name, bias_levels_file=_data(r_cfg0.get("bias_levels_file")),
        overrides_file=_data(r_cfg0.get("camera_overrides_file")))
    return VisitContext(cfg=cfg, view=view, opsim=ods,
                        camera=camera, telescope=telescope,
                        wcs_factory=fac, bandpass=bandpass,
                        sky_model=sky_model, tree_rings=tree_rings,
                        vignetting=vignetting, atm_cfg=atm_cfg,
                        screens=screens, seed=seed)


def parse_photon_ops(ops_list):
    """stamp.photon_ops -> (apply_dcr, apply_diffraction,
    field_rotation): which ops run and their options — PhotonDCR
    presence, RubinDiffraction[Optics] presence + its
    disable_field_rotation (imsim/photon_ops.py:184,231-250,
    config/imsim-config.yaml:281-320).  Absent list = full chain."""
    if ops_list is None:
        return True, True, True
    op_types = {str(o.get("type")) for o in ops_list
                if isinstance(o, dict)}
    apply_dcr = "PhotonDCR" in op_types
    apply_diff = bool({"RubinDiffractionOptics",
                       "RubinDiffraction"} & op_types)
    field_rot = not any(isinstance(o, dict)
                        and o.get("disable_field_rotation")
                        for o in ops_list)
    return apply_dcr, apply_diff, field_rot


def _det_list(ctx: VisitContext):
    out_cfg = ctx.cfg.get("output", {})
    only = out_cfg.get("only_dets")
    if only:
        dets = [ctx.camera.det_num(d) for d in only]
    else:
        dets = out_cfg.get("det_num")
        if isinstance(dets, dict):
            # {type: List/Sequence, ...} forms from the reference's
            # configs (doc/usage.rst output.det_num example)
            dets = ctx.view.resolve(dets)
        if dets is None:
            dets = list(range(int(out_cfg.get("nfiles",
                                              len(ctx.camera.det_names)))))
        if isinstance(dets, (int, np.integer)):
            dets = [dets]
        dets = [int(d) for d in dets]
    # multi-job splitting (the galsim CLI's -n njobs -j job surface the
    # reference uses for cluster fan-out): job j of n renders every
    # n-th detector, so the 189-CCD axis splits evenly across jobs
    njobs = int(out_cfg.get("njobs", 1))
    job = int(out_cfg.get("job", 1))
    if njobs > 1:
        dets = dets[job - 1::njobs]
    return dets


def _format_name(template, ctx, det_name, det_num):
    """File-name template -> name: {visit}/{band}/{det_name}/{det_num}
    placeholders, or a {type: FormattedStr, ...} dict resolved with the
    current detector in scope (the reference's per-file FormattedStr
    usage, doc/config.rst checkpoint/process_info examples)."""
    if isinstance(template, dict):
        saved = {k: ctx.view.state.get(k) for k in ("det_name",
                                                    "det_num")}
        ctx.view.state["det_name"] = det_name
        ctx.view.state["det_num"] = det_num
        try:
            template = ctx.view.resolve(template)
        finally:
            ctx.view.state.update(saved)
    return str(template).format(
        visit=int(ctx.opsim.get("observationId", 0)),
        band=ctx.opsim.get("band", "r"), det_name=det_name,
        det_num=det_num)


@dataclasses.dataclass
class CcdPrep:
    """Everything `render_one_ccd` needs after the host-side per-detector
    preparation (catalog cull, scene build, per-det telescope/optics,
    sky/spike configuration).  Shared by the serial path and the
    mesh-sharded production path (parallel/visit.py::run_visit_mesh),
    which runs the same prep per CCD and fans the device work out."""

    det_name: str
    det_num: int
    ccd: object
    wcs: object
    octx: object
    tel32: object
    bandpass: object
    use_optics: bool
    host: object | None
    table: object | None
    silicon: object | None
    pcfg: PoolingConfig
    sky_level: float
    ra_c: float
    dec_c: float
    sk_table: object | None
    spikes: dict | None
    fft_vign: object | None
    ckpt: Checkpointer | None
    exptime: float


def render_one_ccd(ctx: VisitContext, det_num: int, logger=None,
                   write=True, prep: "CcdPrep | None" = None):
    """The LSST_CCD builder for one detector (imsim/ccd.py:20-206 flow).

    prep: a CcdPrep built ahead of time (run_visit_iter prefetches the
    next detector's host-side prep while the device renders the
    current one); None -> prepare here."""
    cfg = ctx.cfg
    img_cfg = cfg.get("image", {})

    # ---- flats (LSST_Flat image type, imsim/flat.py role) ----------------
    if img_cfg.get("type") == "LSST_Flat":
        det_name = ctx.camera.det_name(det_num)
        ccd = ctx.camera[det_name]
        # detector-sized by default; image.xsize/ysize override for
        # small calibration frames and tests
        nx = int(img_cfg.get("xsize", ccd.bounds.width))
        ny = int(img_cfg.get("ysize", ccd.bounds.height))
        exptime = float(ctx.opsim.get("exptime", 30.0))
        wcs = ctx.wcs_factory.get_wcs(ccd)
        from ..image.flat import (FlatConfig, build_flat,
                                  build_flat_photons)

        sp = SiliconParams.make(
            treering_model=ctx.tree_rings.get(det_name))
        # counts_per_pixel, or countrate_per_pixel * exptime
        # (imsim/flat.py:61-67; counts_per_pixel wins when both given)
        if "counts_per_pixel" in img_cfg:
            cpp = float(img_cfg["counts_per_pixel"])
            if "countrate_per_pixel" in img_cfg and logger:
                logger.warning(
                    "Both countrate_per_pixel and counts_per_pixel "
                    "given; using counts_per_pixel")
        elif "countrate_per_pixel" in img_cfg:
            cpp = float(img_cfg["countrate_per_pixel"]) * exptime
        else:
            cpp = 80_000.0
        fcfg = FlatConfig(
            counts_per_pixel=cpp,
            # the reference's key is max_counts_per_iter
            # (imsim/flat.py:44); counts_per_iter kept as an alias.
            # buffer_size/nx/ny section keys are accepted but moot:
            # the whole CCD renders in one device pass here.
            counts_per_iter=float(
                img_cfg.get("max_counts_per_iter",
                            img_cfg.get("counts_per_iter", 1000.0))),
            xsize=nx, ysize=ny, exptime=exptime)
        if img_cfg.get("sed"):
            # SED photon-shooting branch (imsim/flat.py:239-264:
            # `image.sed` switches to WavelengthSampler + accumulate)
            import os as _os

            from ..catalog.sed import _cached_raw_sed
            from ..image.scene import _wavelength_icdf

            sed_dir = ((cfg.get("input", {})
                        .get("instance_catalog", {}) or {})
                       .get("sed_dir", "."))
            sed = _cached_raw_sed(_os.path.join(sed_dir,
                                                img_cfg["sed"]))
            icdf = _wavelength_icdf(sed, ctx.bandpass)
            flat = build_flat_photons(ctx.seed + det_num, fcfg, icdf,
                                      sp, logger=logger)
        else:
            flat = build_flat(ctx.seed + det_num, fcfg, sp,
                              logger=logger)
        result = dict(det_name=det_name, det_num=det_num,
                      eimage=np.asarray(flat), wcs=wcs, modes=None,
                      host=None, ccd=ccd, table=None)
        if write:
            write_outputs(ctx, result, logger)
        return result

    if prep is None:
        prep = prepare_ccd(ctx, det_num, logger)
    host = prep.host
    pcfg = prep.pcfg

    # ---- pooled render -------------------------------------------------------
    realized = None
    if host is not None and host.n_objects > 0:
        track = bool((cfg.get("output", {}).get("truth", {})
                      or {}).get("enabled", True))
        image, modes, realized = render_ccd_pooled(
            ctx.seed + det_num, host, pcfg, silicon=prep.silicon,
            tel=prep.tel32 if prep.use_optics else None,
            ctx=prep.octx if prep.use_optics else None,
            screens=ctx.screens if prep.use_optics else None,
            sk_table=prep.sk_table if prep.use_optics else None,
            checkpointer=prep.ckpt, spikes=prep.spikes,
            track_realized=track, fft_vign=prep.fft_vign, logger=logger)
    else:
        image = jnp.zeros((pcfg.ysize, pcfg.xsize), jnp.float32)
        modes = None

    # ---- sky + noise ---------------------------------------------------------
    pieces = _sky_noise_pieces(ctx, prep)
    if pieces is not None:
        sky_level, grad, vig, vstep, fringe = pieces
        # image.noise {type: CCD, gain, read_noise}: eimage-level noise
        # surface (config/imsim-config.yaml:209-212; read noise defaults
        # to 0 there — the raw-file readout chain adds its own)
        n_cfg = ctx.cfg.get("image", {}).get("noise", {}) or {}
        image = _add_sky_and_noise(
            stream(ctx.seed, "sky", det_num), image,
            jnp.float32(sky_level), grad, jnp.asarray(vig, jnp.float32),
            pcfg.pixel_scale,
            read_noise=float(n_cfg.get("read_noise", 0.0)),
            gain=float(n_cfg.get("gain", 1.0)), vig_step=vstep,
            fringe=None if fringe is None else jnp.asarray(fringe))

    # ---- cosmic rays (host, sparse) -------------------------------------------
    eimage = np.asarray(image)
    eimage = _paint_cosmic_rays(ctx, det_num, eimage, prep.exptime,
                                logger)

    result = dict(det_name=prep.det_name, det_num=det_num, eimage=eimage,
                  wcs=prep.wcs, modes=modes, host=host, ccd=prep.ccd,
                  table=prep.table, realized=realized)
    if write:
        write_outputs(ctx, result, logger)
    return result


# Host-side wall-clock accumulators (seconds) for the two pieces of
# per-CCD work that `output.prefetch` / `output.io_workers` move off the
# render thread's critical path.  Thread-safe (prefetch + IO pools call
# these concurrently); reset + read them around a visit to measure how
# much host work the overlap machinery can hide (bench.py --visit).
HOST_TIMERS = {"prep_s": 0.0, "io_s": 0.0}
_TIMER_LOCK = threading.Lock()


def reset_host_timers():
    with _TIMER_LOCK:
        for k in HOST_TIMERS:
            HOST_TIMERS[k] = 0.0


def _timed(key):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.time()
            try:
                return fn(*args, **kwargs)
            finally:
                dt = time.time() - t0
                with _TIMER_LOCK:
                    HOST_TIMERS[key] += dt
        return wrapper
    return deco


@_timed("prep_s")
def prepare_ccd(ctx: VisitContext, det_num: int, logger=None) -> CcdPrep:
    """Host-side per-detector preparation shared by the serial and the
    mesh-sharded visit paths: WCS, per-det telescope/bandpass, catalog
    cull + scene build, silicon/sky/spike configuration."""
    cfg = ctx.cfg
    det_name = ctx.camera.det_name(det_num)
    ccd = ctx.camera[det_name]
    nx, ny = ccd.bounds.width, ccd.bounds.height
    exptime = float(ctx.opsim.get("exptime", 30.0))
    img_cfg = cfg.get("image", {})
    stamp_cfg = cfg.get("stamp", {})

    wcs = ctx.wcs_factory.get_wcs(ccd)
    octx = make_optics_context(ctx.wcs_factory, ccd)
    # per-detector QE bandpass (imsim/bandpass.py:129-183) when the
    # measured transmission_sensor data are configured
    bandpass = ctx.bandpass
    bp_cfg = (cfg.get("image", {}) or {}).get("bandpass", {}) or {}
    if bp_cfg.get("det_qe") and bp_cfg.get("throughputs_dir"):
        from ..catalog.bandpass import rubin_bandpass_from_files

        bandpass = rubin_bandpass_from_files(
            ctx.opsim.get("band", "r"), _data(bp_cfg["throughputs_dir"]),
            airmass=float(ctx.opsim.get("airmass", 1.0)),
            camera=ctx.camera.camera_name, det_name=det_name)
    # per-detector focal height -> telescope z-offset, so photons and
    # the fitted WCS share the same detector surface
    # (imsim/telescope_loader.py:354-415 DetectorTelescope)
    tel32 = ctx.wcs_factory.telescope.for_detector(
        det_name, z_offset=getattr(ccd, "height_mm", 0.0) * 1e-3)
    # the full optics chain (field-angle scene) only applies to the
    # AtmosphericPSF; fallback PSFs use the image-domain fast path
    use_optics = (cfg.get("psf", {}) or {}).get(
        "type", "AtmosphericPSF") == "AtmosphericPSF"

    # ---- catalog -> scene -------------------------------------------------
    cat_cfg = cfg.get("input", {}).get("instance_catalog", {}) or {}
    sky_cfg = cfg.get("input", {}).get("sky_catalog", {}) or {}
    host = None
    table = None
    if sky_cfg.get("file_name"):
        from ..catalog.skycat import SkyCatalogInterface

        skycat = SkyCatalogInterface(
            _data(sky_cfg["file_name"]),
            columns=sky_cfg.get("columns"),
            obj_types=tuple(sky_cfg["obj_types"])
            if sky_cfg.get("obj_types") else None,
            apply_dc2_dilation=bool(
                sky_cfg.get("apply_dc2_dilation", False)),
            skycatalog_root=sky_cfg.get("skycatalog_root"))
        table = skycat.to_object_table(
            wcs=wcs, xsize=nx, ysize=ny,
            edge_pix=float(sky_cfg.get("edge_pix", 100)), logger=logger)
        sed_dirs = sky_cfg.get("sed_dir") or \
            os.environ.get("SIMS_SED_LIBRARY_DIR", ".")
        if isinstance(sed_dirs, str):
            sed_dirs = [sed_dirs]
        if skycat.native is not None:
            # sed_file_root dirs from the yaml config (env expanded)
            sed_dirs = list(sed_dirs) + skycat.native.sed_dirs_hint()
        if sky_cfg.get("skip_missing_sed"):
            table = scene_mod.filter_missing_seds(table, sed_dirs,
                                                  logger=logger)
        # approx_nobjects (imsim/skycat.py getApproxNObjects) is a
        # processing-capacity hint; here it pins the static scene pad
        # so every CCD of a visit traces with one shape (no recompiles)
        approx = sky_cfg.get("approx_nobjects")
        pad_to = None
        if approx and int(approx) >= len(table):
            pad_to = max(int(2 ** np.ceil(np.log2(max(int(approx),
                                                      1)))), 16)
        host = scene_mod.build_scene(
            table, bandpass, sed_dirs, exptime=exptime,
            rng=np.random.default_rng(ctx.seed + det_num),
            pad_to=pad_to,
            max_flux=sky_cfg.get("max_flux"))
        if use_optics:
            thx, thy = ctx.wcs_factory.icrf_to_field(table.ra, table.dec)
            params = np.array(host.scene.params)
            params[:len(table), 0] = thx
            params[:len(table), 1] = thy
            host.scene = dataclasses.replace(
                host.scene, params=jnp.asarray(params))
    elif cat_cfg.get("file_name"):
        table = read_instcat(_data(cat_cfg["file_name"]), wcs=wcs,
                             xsize=nx,
                             ysize=ny,
                             edge_pix=float(cat_cfg.get("edge_pix", 100)),
                             sort_mag=bool(cat_cfg.get("sort_mag", True)),
                             flip_g2=bool(cat_cfg.get("flip_g2", True)),
                             min_source=cat_cfg.get("min_source"),
                             skip_invalid=bool(
                                 cat_cfg.get("skip_invalid", True)),
                             logger=logger)
        # image.nobjects: user cap on the object count (the reference's
        # CI drives `image.nobjects=10`, imsim/lsst_image.py:38-44);
        # tables are magnitude-sorted so the first N are the brightest
        n_obj_cap = img_cfg.get("nobjects")
        if n_obj_cap is not None and len(table) > int(n_obj_cap):
            table = table.select(
                np.arange(len(table)) < int(n_obj_cap))
            if logger:
                logger.info("image.nobjects: capped to %d objects",
                            len(table))
        sed_dirs = cat_cfg.get("sed_dir") or \
            os.environ.get("SIMS_SED_LIBRARY_DIR", ".")
        if isinstance(sed_dirs, str):
            sed_dirs = [sed_dirs]
        host = scene_mod.build_scene(
            table, bandpass, sed_dirs, exptime=exptime,
            rng=np.random.default_rng(ctx.seed + det_num))
        # optics chain wants field angles in COL_X/COL_Y
        if use_optics:
            thx, thy = ctx.wcs_factory.icrf_to_field(table.ra, table.dec)
            params = np.array(host.scene.params)
            params[:len(table), 0] = thx
            params[:len(table), 1] = thy
            host.scene = dataclasses.replace(
                host.scene, params=jnp.asarray(params))
    elif "scene_host" in ctx.view.state:
        host = ctx.view.state["scene_host"]

    # ---- silicon sensor -----------------------------------------------------
    silicon = None
    sensor_cfg = img_cfg.get("sensor", {}) or {}
    if sensor_cfg.get("type", "Silicon") == "Silicon":
        # sensor.strength scales the BF interaction (imsim-config.yaml
        # image.sensor.strength -> SiliconSensor strength)
        strength = float(sensor_cfg.get("strength", 1.0))
        bf_kernel = None
        model_name = sensor_cfg.get("sensor_model")
        if model_name:
            # measured Poisson-solver vertex file ('lsst_itl_50_32' /
            # a path; GalSim SiliconSensor's data files) -> exact
            # area-response BF kernel (sensor/sensor_model.py); the
            # reference-style '{vendor}' placeholder picks per-CCD
            from ..sensor.sensor_model import (bf_kernel_from_model,
                                               resolve_sensor_model)

            name = str(model_name).format(
                vendor=ccd.vendor.lower())
            from ..meta_data import data_dir as _data_dir

            dirs = [sensor_cfg.get("sensor_model_dir", ".")]
            if _data_dir():
                dirs.append(os.path.join(_data_dir(), "sensor_models"))
                dirs.append(_data_dir())
            path = resolve_sensor_model(name, search_dirs=dirs)
            bf_kernel = jnp.asarray(
                bf_kernel_from_model(path, strength=strength))
        elif not sensor_cfg.get("isotropic_kernel", False):
            # DEFAULT: the measured per-vendor anisotropic kernel
            # (shape from the reference's Poisson-solver vertex files,
            # amplitude pinned to the calibrated PTC scale) — so
            # default runs carry the channel-stop x/y asymmetry;
            # image.sensor.isotropic_kernel: true restores the
            # symmetric analytic kernel (sensor/silicon.py
            # vendor_bf_kernel).
            from ..sensor.silicon import vendor_bf_kernel

            bf_kernel = jnp.asarray(vendor_bf_kernel(
                ccd.vendor, strength=0.4 * strength))
        silicon = SiliconParams.make(
            treering_model=ctx.tree_rings.get(det_name),
            bf_strength=0.4 * strength)
        if bf_kernel is not None:
            silicon = dataclasses.replace(silicon, bf_kernel=bf_kernel)

    # ---- pooling configuration ---------------------------------------------
    ckpt = None
    ck_cfg = cfg.get("input", {}).get("checkpoint", {}) or {}
    if ck_cfg.get("dir"):
        # Visit/band/detector-keyed default, matching the reference's
        # checkpoint_%08d-%s-%s.hdf (config/imsim-config.yaml:120-128):
        # two visits sharing a checkpoint dir must never resume each
        # other's files.
        fname = (ck_cfg.get("file_name")
                 or "checkpoint_{visit:08d}-{band}-{det_name}.h5")
        ckpt = Checkpointer(_format_name(fname, ctx, det_name, det_num),
                            dir=ck_cfg["dir"])
    apply_dcr, apply_diff, field_rot = parse_photon_ops(
        stamp_cfg.get("photon_ops"))
    pcfg = PoolingConfig(
        xsize=nx, ysize=ny, exptime=exptime,
        apply_dcr=apply_dcr, apply_diffraction=apply_diff,
        diffraction_field_rotation=field_rot,
        nbatch=int(img_cfg.get("nbatch", 8)),
        # stamp.maxN is the reference's photon-batch size cap
        # (imsim/stamp.py:607-618); image.batch_size is the native key
        batch_size=int(stamp_cfg.get(
            "maxN", img_cfg.get("batch_size", 8_000_000))),
        nsub=int(img_cfg.get("nsubbatch", 4)),
        # max_flux_simple is the reference's faint-object threshold
        # (imsim/stamp.py:85,435); faint_thresh kept as an alias
        faint_thresh=float(stamp_cfg.get(
            "max_flux_simple", stamp_cfg.get("faint_thresh", 100.0))),
        fft_sb_thresh=float(stamp_cfg.get("fft_sb_thresh", 0.0))
        if str(stamp_cfg.get("method", "auto")) == "auto" else 0.0,
        force_fft=str(stamp_cfg.get("method", "auto")) == "fft",
        pixel_scale=float(img_cfg.get("pixel_scale", 0.2)),
        fwhm=float(ctx.opsim.get("FWHMeff", 0.8)),
        nbatch_per_checkpoint=int(img_cfg.get("nbatch_per_checkpoint", 1)),
        # ChromaticAtmosphere exponent of the screen PSF
        # (imsim/atmPSF.py:298-318; atm_psf.exponent, -0.3 Kolmogorov)
        chromatic_exponent=float(
            (cfg.get("input", {}).get("atm_psf", {}) or {})
            .get("exponent", -0.3)) if ctx.atm_cfg is not None else 0.0,
        wl_ref=float(bandpass.effective_wavelength))

    # per-pixel sky level (counts): both the noise floor added below and
    # the stamp-sizing folding threshold noise_var/flux
    # (imsim/stamp_utils.py:119-144)
    sky_cfg_val = img_cfg.get("sky_level")
    sky_level = 0.0
    ra_c, dec_c = wcs.xy_to_radec((nx - 1) / 2.0, (ny - 1) / 2.0)
    if isinstance(sky_cfg_val, (int, float)):
        sky_level = float(sky_cfg_val)
    elif sky_cfg_val is not None:
        sky_level = ctx.sky_model.get_sky_level(float(ra_c), float(dec_c))
    pcfg.noise_var = float(sky_level)

    sk_table = None
    if ctx.atm_cfg is not None:
        from ..utils.lookup import PolyCDF

        sk = second_kick_table(ctx.atm_cfg,
                               bandpass.effective_wavelength)
        # gather-free Chebyshev sampler (bulk fit error < 0.1%;
        # random gathers cost ~8.6 ns/photon on this TPU)
        sk_table, _ = PolyCDF.fit(sk)

    # fallback PSF families use the fast image-domain path (no raytrace):
    # DoubleGaussianPSF / KolmogorovPSF (imsim/atmPSF.py:448-538)
    psf_cfg = cfg.get("psf", {}) or {}
    psf_type = psf_cfg.get("type", "AtmosphericPSF")
    if psf_type == "DoubleGaussianPSF":
        from ..photons.profiles import radial_cdf_from_mtf
        if psf_cfg.get("fwhm") is not None:
            # the reference's required key: LSE-40 eq. 30 shape —
            # alpha = fwhm/2.3835, sigma1 = sqrt(a^2 - pix^2/12),
            # sigma2 = sqrt(4 a^2 - pix^2/12), mix 0.909*(g1 + 0.1 g2)
            # (imsim/atmPSF.py:448-487)
            alpha = float(psf_cfg["fwhm"]) / 2.3835
            pix = float(psf_cfg.get("pixel_scale", 0.2))
            s1 = np.sqrt(max(alpha ** 2 - pix ** 2 / 12.0, 1e-8))
            s2 = np.sqrt(max(4 * alpha ** 2 - pix ** 2 / 12.0, 1e-8))
            w1 = 1.0 / 1.1
            f1, f2 = 2.3548200450309493 * s1, 2.3548200450309493 * s2
        else:
            f1 = float(psf_cfg.get("fwhm1",
                                   ctx.opsim.get("FWHMgeom", 0.6)))
            f2 = float(psf_cfg.get("fwhm2", 2 * f1))
            w1 = float(psf_cfg.get("wgt1", 0.8))
            s1 = f1 / 2.3548200450309493
            s2 = f2 / 2.3548200450309493
        T = lambda k: (w1 * np.exp(-0.5 * (s1 * k) ** 2)
                       + (1 - w1) * np.exp(-0.5 * (s2 * k) ** 2))
        tab = radial_cdf_from_mtf(T, r_max=8 * f2, k_max=40.0 / f1)
        pcfg = dataclasses.replace(
            pcfg, psf_table=dataclasses.replace(tab,
                                                y=jnp.asarray(tab.y)))

    # saturation diffraction-spike overlay for FFT-drawn bright stars
    # (imsim/stamp.py:520-521 + imsim/diffraction_fft.py:126-227):
    # kernel built per (band, rotTelPos, field-rotation smear), charge
    # redistributed above the detector full well
    spikes = None
    dfft_cfg = stamp_cfg.get("diffraction_fft", {}) or {}
    if pcfg.fft_sb_thresh > 0 and dfft_cfg.get("enabled", True):
        from ..image.diffraction_fft import spike_kernel
        from ..optics.astrometry import RUBIN_LAT
        from ..photons.diffraction import field_rotation_angle

        # clip below the zenith pole (the rotation angle is undefined
        # AT alt=90, the runner default when opsim has no altitude)
        alt = min(float(ctx.opsim.get("altitude", 90.0)), 89.9) * DEG
        az = float(ctx.opsim.get("azimuth", 0.0)) * DEG
        # exact field-rotation curve sampled over the exposure (the
        # linearized rate diverges near zenith: alt 88 over 300 s is
        # 17.8 deg exact vs 8.7 deg linear) — the kernel sweeps the
        # same signed -theta(t) arc the photon path applies
        ts = np.linspace(0.0, max(exptime, 1e-3), 24)
        thetas = np.degrees(
            field_rotation_angle(ts, RUBIN_LAT, alt, az, xp=np))
        # spider arms at 45 deg in the pupil, rotated by the telescope
        # rotator (reference: alpha = pi/4 - rottelpos)
        alpha_deg = 45.0 - float(ctx.opsim.get("rotTelPos", 0.0))
        # spike_length_cutoff caps spike extent in pixels (the
        # reference's DiffractionFFT option, imsim/stamp.py:36-68);
        # the kernel half-width IS the spike length here
        kw_n = {}
        if dfft_cfg.get("spike_length_cutoff"):
            half = int(min(float(dfft_cfg["spike_length_cutoff"]), 2048))
            kw_n["n"] = 2 * max(half, 16) + 1
        kern = spike_kernel(
            wavelength_nm=float(bandpass.effective_wavelength),
            pixel_scale=pcfg.pixel_scale, alpha_deg=alpha_deg,
            rot_thetas_deg=tuple(np.round(thetas, 3)), **kw_n)
        spikes = dict(kernel=jnp.asarray(kern),
                      sat=float(dfft_cfg.get("brightness_threshold",
                                             ccd.full_well)))

    # FFT-stamp vignetting factors at the object positions (the
    # fft flux scaling of imsim/psf_utils.py:152-239)
    fft_vign = None
    if host is not None and pcfg.fft_sb_thresh > 0 and \
            host.pix_x is not None:
        yy_mm = (np.asarray(host.pix_y) - (ny - 1) / 2) \
            * PIXEL_SIZE_MM + ccd.center_mm[1]
        xx_mm = (np.asarray(host.pix_x) - (nx - 1) / 2) \
            * PIXEL_SIZE_MM + ccd.center_mm[0]
        fft_vign = ctx.vignetting(np.hypot(xx_mm, yy_mm))

    return CcdPrep(det_name=det_name, det_num=det_num, ccd=ccd, wcs=wcs,
                   octx=octx, tel32=tel32, bandpass=bandpass,
                   use_optics=use_optics, host=host, table=table,
                   silicon=silicon, pcfg=pcfg, sky_level=sky_level,
                   ra_c=float(ra_c), dec_c=float(dec_c),
                   sk_table=sk_table, spikes=spikes, fft_vign=fft_vign,
                   ckpt=ckpt, exptime=exptime)


def _sky_noise_pieces(ctx: VisitContext, prep: CcdPrep,
                      vig_step: int = 32):
    """(sky_level, gradient_abc, vig_coarse, vig_step, fringe) for the
    sky + noise stage, or None when the sky level is zero.  Host-side
    assembly shared by the serial and mesh paths (the sky/noise device
    op itself is image/ccd_render._add_sky_and_noise).

    The vignetting map is returned as a stride-`vig_step` coarse grid
    (utils.grid.coarse_shape) and bilinearly upsampled ON DEVICE inside
    _add_sky_and_noise: the full-res host map cost ~18 s/CCD of numpy
    (measured, round 4) and shipped 64 MB/CCD to the device.  fringe
    (E2V only) stays full-res — the etalon pattern is not smooth at the
    coarse scale."""
    if prep.sky_level <= 0:
        return None
    cfg = ctx.cfg
    img_cfg = cfg.get("image", {})
    ccd = prep.ccd
    ny, nx = prep.pcfg.ysize, prep.pcfg.xsize
    grad = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0))
    if img_cfg.get("apply_sky_gradient", True):
        sg = SkyGradient(ctx.sky_model, prep.wcs, prep.ra_c, prep.dec_c,
                         nx)
        grad = (jnp.float32(sg.a / sg.sky_level_center),
                jnp.float32(sg.b / sg.sky_level_center),
                jnp.float32(sg.c / sg.sky_level_center))
    from ..utils.grid import coarse_shape

    gh, gw = coarse_shape((ny, nx), vig_step)
    vig = np.ones((gh, gw), np.float32)
    fringe = None
    if img_cfg.get("apply_vignetting", True):
        ys = ((np.arange(gh) * vig_step) - (ny - 1) / 2) * PIXEL_SIZE_MM \
            + ccd.center_mm[1]
        xs = ((np.arange(gw) * vig_step) - (nx - 1) / 2) * PIXEL_SIZE_MM \
            + ccd.center_mm[0]
        vig = np.asarray(ctx.vignetting(
            np.hypot(xs[None, :], ys[:, None])), np.float32)
    if img_cfg.get("apply_fringing", True) and ccd.vendor == "E2V":
        # per-CCD angular offset from the boresight drives the fringe
        # amplitude variation (imsim/sky_model.py:214-233 computes it
        # from the CCD center's sky coordinates)
        bore_ra, bore_dec = ctx.view.state.get(
            "boresight", (prep.ra_c, prep.dec_c))
        off_deg = np.degrees(_angular_sep(
            float(bore_ra), float(bore_dec),
            float(prep.ra_c), float(prep.dec_c)))
        fr = CCD_Fringing(
            sensor_fringing_seed(ccd.getSerial(),
                                 int(ctx.opsim.get("observationId", 0))),
            boresight_offset_deg=float(off_deg))
        skyline = None
        sk_file = _data(img_cfg.get("fringing_skyline_file"))
        if sk_file:
            # measured OH skyline spatial-variation surface (the
            # skyline_var.fits data, imsim/sky_model.py:221-233)
            from ..io.fits import read_fits

            for hdr_f, dat_f in read_fits(sk_file):
                if dat_f is not None:
                    skyline = np.asarray(dat_f, float)
                    break
        # fringe amplitude from the ACTUAL sky spectrum when loaded:
        # etalon visibility of the OH line forest vs the synthetic
        # reference anchor (image/sky_sed.py::fringing_amplitude)
        from ..image.sky_sed import fringing_amplitude

        amp = fringing_amplitude(ctx.sky_model.sky_sed,
                                 ctx.bandpass)
        fringe = np.asarray(fr.fringing_map(
            (ny, nx), amplitude=amp, skyline_surface=skyline),
            np.float32)
    return prep.sky_level, grad, vig, vig_step, fringe


def _angular_sep(ra0, dec0, ra1, dec1):
    """Great-circle separation (radians in, radians out)."""
    s = (np.sin(0.5 * (dec1 - dec0)) ** 2
         + np.cos(dec0) * np.cos(dec1)
         * np.sin(0.5 * (ra1 - ra0)) ** 2)
    return 2.0 * np.arcsin(np.sqrt(np.clip(s, 0.0, 1.0)))


def _paint_cosmic_rays(ctx: VisitContext, det_num: int, eimage,
                       exptime: float, logger=None):
    """Host-side sparse cosmic-ray painting (imsim/ccd.py:122-136)."""
    out_cfg0 = ctx.cfg.get("output", {})
    cr_rate = float(out_cfg0.get("cosmic_ray_rate", 0.0))
    if cr_rate <= 0:
        return eimage
    from ..image.cosmic_rays import CosmicRayCatalog

    catalog = None
    cat_path = _data(out_cfg0.get("cosmic_ray_catalog"))
    if cat_path:
        if str(cat_path).endswith((".fits", ".fits.gz")):
            # measured span catalog (imsim/ccd.py:122-136 +
            # cosmic_rays.py:112-147); header rate is CRs/CCD/s
            catalog, cat_rate = \
                CosmicRayCatalog.read_catalog_fits(cat_path)
        else:
            catalog = CosmicRayCatalog.load(cat_path)
    return paint_cosmic_rays(eimage.copy(), exptime,
                             seed=ctx.seed * 189 + det_num,
                             ccd_rate=cr_rate, catalog=catalog,
                             logger=logger)


def eimage_header(ctx: VisitContext, det_name, wcs):
    """DM-ingestible eimage keywords (imsim/ccd.py:138-206) including
    the recomputed rotSkyPos = rotTelPos - parallactic angle; full
    keyword assembly lives in electronics.headers."""
    from ..electronics.headers import eimage_header as _eh

    q = float(ctx.wcs_factory.obs.parallactic_angle())
    ccd = ctx.camera[det_name]
    return _eh(ctx.opsim, det_name, ccd.getSerial(), ccd.vendor,
               ctx.cfg.get("output", {}).get("camera", "LsstCamSim"),
               wcs, np.degrees(q))


def _run_readout(ctx: VisitContext, result, r_cfg) -> np.ndarray:
    """Device readout chain -> (16, ny, nx) int amps as numpy."""
    ccd = result["ccd"]
    opt = {k: float(r_cfg[k]) for k in ("full_well", "read_noise",
                                        "bias_level")
           if r_cfg.get(k) is not None}
    ro = CcdReadout(ccd, readout_time=float(r_cfg.get("readout_time",
                                                      2.0)),
                    dark_current=float(r_cfg.get("dark_current", 0.02)),
                    scti=float(r_cfg.get("scti", 1e-6)),
                    pcti=float(r_cfg.get("pcti", 1e-6)), **opt)
    return np.asarray(ro.run(stream(ctx.seed, "readout",
                                    result["det_num"]),
                             jnp.asarray(result["eimage"]),
                             exptime=float(ctx.opsim.get("exptime",
                                                         30.0))))


def prepare_readout(ctx: VisitContext, result) -> None:
    """Run the DEVICE part of output generation (the readout chain) and
    stash the host arrays in `result`, so write_outputs becomes pure
    host IO (RICE compression in C++ releases the GIL; disk writes
    block) — the split that lets pipelined visits overlap one CCD's
    file output with the next CCD's render."""
    out_cfg = ctx.cfg.get("output", {})
    r_cfg = out_cfg.get("readout", {}) or {}
    if r_cfg.get("enabled", True):
        result["amps"] = _run_readout(ctx, result, r_cfg)
    result["eimage"] = np.asarray(result["eimage"])


@_timed("io_s")
def write_outputs(ctx: VisitContext, result, logger=None):
    cfg = ctx.cfg
    out_cfg = cfg.get("output", {})
    outdir = out_cfg.get("dir", "output")
    det_name = result["det_name"]
    det_num = result["det_num"]
    eimage = result["eimage"]
    wcs = result["wcs"]
    ccd = result["ccd"]

    # eimage
    fname = _format_name(out_cfg.get("file_name", "eimage.fits"), ctx,
                         det_name, det_num)
    ehdr = eimage_header(ctx, det_name, wcs)
    # output.header: user extras on the eimage header, $-expressions
    # resolved (imsim/ccd.py LSST_CCDBuilder 'header' option)
    for k, v in (out_cfg.get("header") or {}).items():
        ehdr[str(k)[:8].upper()] = ctx.view.resolve(v)
    write_fits(os.path.join(outdir, fname),
               [HDU(eimage.astype(np.float32), header=ehdr)])

    # raw amp file through the readout chain; `amps` may have been
    # precomputed by prepare_readout (pipelined visits keep device work
    # on the main thread and hand only pure host IO to workers)
    r_cfg = out_cfg.get("readout", {}) or {}
    if r_cfg.get("enabled", True):
        amps = result.get("amps")
        if amps is None:
            amps = _run_readout(ctx, result, r_cfg)
        from ..electronics.headers import amp_header, raw_primary_header

        eh = eimage_header(ctx, det_name, wcs)
        phdr = raw_primary_header(
            eh, ccd.getSerial(),
            ctx.cfg.get("output", {}).get("camera", "LsstCamSim"))
        # user-supplied primary keywords, $-expressions resolved
        # (imsim/readout.py:574-585 added_keywords)
        for k, v in (r_cfg.get("added_keywords") or {}).items():
            v = ctx.view.resolve(v)
            phdr[str(k)[:8].upper()] = v
        hdus = [HDU(None, header=phdr, is_primary=True)]
        for k, aname in enumerate(ccd.amp_names):
            hdus.append(HDU(amps[k], header=amp_header(ccd, ccd[aname],
                                                       wcs),
                            name=None, compress="rice"))
        rname = _format_name(r_cfg.get("file_name", "amp.fits"), ctx,
                             det_name, det_num)
        write_fits(os.path.join(outdir, rname), hdus)

    # extra outputs through the registry (the reference's
    # RegisterExtraOutput surface, SURVEY L2): built-ins opd/sag/truth
    # below; any other output.<key> dict carrying `type: <registered>`
    # dispatches to a user-registered handler with the same signature
    from .registry import EXTRA_OUTPUT_TYPES

    builtin = {"readout", "opd", "sag", "truth", "photon_pooling_truth",
               "camera", "dir", "file_name", "nfiles", "det_num",
               "only_dets", "mesh", "io_workers", "njobs", "job",
               "prefetch", "process_info", "cosmic_ray_rate",
               "cosmic_ray_catalog", "truth_realized"}
    # presence of the section activates the output (GalSim extra-output
    # semantics); enabled: false opts out explicitly
    for name in ("opd", "sag"):
        if name in out_cfg:
            EXTRA_OUTPUT_TYPES[name](ctx, result,
                                     out_cfg.get(name) or {},
                                     det_name, det_num, outdir)
    # truth variants each dispatch under their OWN key (so a handler
    # registered as photon_pooling_truth is honored); bare `truth`
    # runs by default (enabled: true) when neither key is configured
    if "photon_pooling_truth" in out_cfg:
        EXTRA_OUTPUT_TYPES["photon_pooling_truth"](
            ctx, result, out_cfg["photon_pooling_truth"] or {},
            det_name, det_num, outdir)
    if "truth" in out_cfg or "photon_pooling_truth" not in out_cfg:
        EXTRA_OUTPUT_TYPES["truth"](ctx, result,
                                    out_cfg.get("truth") or {},
                                    det_name, det_num, outdir)
    for key, node in out_cfg.items():
        if key in builtin or not isinstance(node, dict):
            continue
        handler = EXTRA_OUTPUT_TYPES.get(node.get("type", key))
        if handler is not None:
            handler(ctx, result, node, det_name, det_num, outdir)
    if logger:
        logger.info("wrote outputs for %s", det_name)


@register_extra_output("opd")
def _extra_opd(ctx, result, node, det_name, det_num, outdir):
    """OPD maps + annular Zernikes (the `opd` extra output, imsim/opd.py)."""
    if not node.get("enabled", True):
        return
    from ..optics.opd import annular_zernikes, opd_fits_header, opd_map

    fields = node.get("fields", [[0.0, 0.0]])
    wl = float(node.get("wavelength",
                        ctx.bandpass.effective_wavelength))
    tel = ctx.wcs_factory.telescope.fiducial
    # annular-Zernike obscuration (imsim/opd.py `eps`, default the
    # telescope pupil obscuration); sphereRadius is accepted and
    # recorded — our OPD is referenced to the chief ray, so the
    # reference-sphere radius only annotates the output
    from ..optics.opd import OBSCURATION
    eps = float(node.get("eps", OBSCURATION))
    jmax = int(node.get("jmax", 28))
    sph_rad = node.get("sphereRadius")
    hdus = [HDU(None, is_primary=True)]
    for (fx_deg, fy_deg) in fields:
        thx = fx_deg * DEG
        thy = fy_deg * DEG
        img, mask, _, _ = opd_map(tel, thx, thy, wl,
                                  nx=int(node.get("nx", 255)))
        hdr = opd_fits_header(thx, thy, wl, jmax=jmax, eps=eps)
        if sph_rad is not None:
            hdr["SPH_RAD"] = float(sph_rad)
        zk = annular_zernikes(tel, thx, thy, wl, jmax=jmax, eps=eps,
                              nx=65)
        for j, c in enumerate(zk, start=1):
            hdr[f"AZ_{j:03d}"] = float(c)
        hdus.append(HDU(np.nan_to_num(img).astype(np.float32),
                        header=hdr))
    oname = _format_name(node.get("file_name", "opd.fits"), ctx,
                         det_name, det_num)
    write_fits(os.path.join(outdir, oname), hdus)


@register_extra_output("sag")
def _extra_sag(ctx, result, node, det_name, det_num, outdir):
    """Surface sag maps (the `sag` extra output, imsim/sag.py)."""
    if not node.get("enabled", True):
        return
    from ..optics.opd import surface_sag_map

    tel = ctx.wcs_factory.telescope.fiducial
    hdus = [HDU(None, is_primary=True)]
    for sname in node.get("surfaces", ["M1", "M2", "M3"]):
        sag, mask, u = surface_sag_map(tel, sname,
                                       nx=int(node.get("nx", 255)))
        hdus.append(HDU(np.nan_to_num(sag).astype(np.float32),
                        header={"SURFACE": sname, "UNITS": "m",
                                "RMAX": float(u[-1])}, name=sname))
    sname_out = _format_name(node.get("file_name", "sag.fits"),
                             ctx, det_name, det_num)
    write_fits(os.path.join(outdir, sname_out), hdus)


@register_extra_output("truth")
@register_extra_output("photon_pooling_truth")
def _extra_truth(ctx, result, node, det_name, det_num, outdir):
    """Truth catalog ("centroid" file, config/imsim-config.yaml:370-393):
    object_id ra dec x y nominal_flux phot_flux fft_flux realized_flux
    with phot/fft split by rendering mode and realized accumulated
    across pooled batches (imsim/photon_pooling.py:472-507)."""
    if not node.get("enabled", True) or result["host"] is None:
        return
    host = result["host"]
    tname = _format_name(node.get("file_name", "centroid.txt"), ctx,
                         det_name, det_num)
    path = os.path.join(outdir, tname)
    table = result.get("table")
    if host.pix_x is not None:
        xs, ys = host.pix_x, host.pix_y
    else:
        params = np.asarray(host.scene.params)[:host.n_objects]
        xs, ys = params[:, 0], params[:, 1]
    n = host.n_objects
    ras = np.degrees(table.ra) if table is not None else np.zeros(n)
    decs = np.degrees(table.dec) if table is not None else np.zeros(n)
    ids = table.id if table is not None and len(
        getattr(table, "id", ())) == n else np.arange(n)
    modes = result["modes"]
    realized = result.get("realized")
    with open(path, "w") as f:
        f.write("# object_id ra dec x y nominal_flux phot_flux "
                "fft_flux realized_flux mode\n")
        for i in range(n):
            m = int(modes[i]) if modes is not None else 1
            phot = host.flux[i] if m != 0 else 0.0
            fft = host.flux[i] if m == 0 else 0.0
            real = realized[i] if realized is not None \
                else host.flux[i]
            f.write(f"{ids[i]} {ras[i]:.8f} {decs[i]:.8f} "
                    f"{xs[i]:.4f} {ys[i]:.4f} "
                    f"{host.nominal_flux[i]:.2f} {phot:.0f} "
                    f"{fft:.0f} {real:.2f} {m}\n")


def run_visit_iter(cfg_or_path, overrides=(), logger=None):
    """Generator form of `run_visit`: yields each per-CCD result dict
    as soon as its outputs are written (or scheduled on the IO pool),
    so a caller iterating a 189-CCD visit never holds more than the
    in-flight CCDs in memory.  `run_visit` is a thin collector on top.

    Routing (same as run_visit): `output.mesh` -> the sharded
    production path; `output.io_workers` -> pipelined IO; else serial.
    With `output.process_info: {file_name: ...}` a per-detector
    process catalog (det_name pid rss uss user_time unix_time — the
    reference's per-stamp columns, imsim/process_info.py:9-38) is
    written at the end of the visit."""
    cfg = load_config(cfg_or_path, overrides)
    ctx = build_visit_context(cfg, logger)
    out_cfg = cfg.get("output", {}) or {}
    dets = _det_list(ctx)
    pi_cfg = out_cfg.get("process_info") or {}

    def note(result):
        if pi_cfg:
            from ..utils.process_info import record_det_row

            record_det_row(result["det_name"], logger)
        return result

    mesh_cfg = out_cfg.get("mesh")
    io_workers = int(out_cfg.get("io_workers", 0))
    is_flat = (cfg.get("image", {}) or {}).get("type") == "LSST_Flat"

    def preps_ahead():
        """Prefetch the NEXT detector's host-side prep (catalog cull,
        scene build, WCS/telescope) in a worker thread while the
        device renders the current one — JAX dispatch releases the
        GIL on blocking device calls, so prep and render overlap.
        output.prefetch: false disables."""
        if is_flat or len(dets) <= 1 \
                or out_cfg.get("prefetch", True) is False:
            for det_num in dets:
                yield det_num, None
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(prepare_ccd, ctx, dets[0], logger)
            for k, det_num in enumerate(dets):
                prep = fut.result()
                if k + 1 < len(dets):
                    fut = pool.submit(prepare_ccd, ctx, dets[k + 1],
                                      logger)
                yield det_num, prep

    if mesh_cfg and not is_flat:
        from ..parallel.visit import run_visit_mesh

        for result in run_visit_mesh(ctx, dets, mesh_cfg, logger):
            yield note(result)
    elif io_workers <= 0 or len(dets) <= 1:
        for det_num, prep in preps_ahead():
            yield note(render_one_ccd(ctx, det_num, logger, prep=prep))
    else:
        from concurrent.futures import ThreadPoolExecutor

        def write_and_release(result):
            # bound memory: each pending write holds a (16, 2050, 544)
            # amp stack (~70 MB); drop it once the file is on disk
            write_outputs(ctx, result, logger)
            result.pop("amps", None)

        futures = []
        with ThreadPoolExecutor(max_workers=io_workers) as pool:
            for det_num, prep in preps_ahead():
                # backpressure: never hold more than 2*io_workers
                # pending CCD outputs in memory
                while len(futures) >= 2 * io_workers:
                    futures.pop(0).result()
                result = render_one_ccd(ctx, det_num, logger,
                                        write=False, prep=prep)
                prepare_readout(ctx, result)      # device, main thread
                futures.append(pool.submit(write_and_release, result))
                yield note(result)
            for f in futures:
                f.result()                        # propagate IO errors

    if pi_cfg:
        from ..utils.process_info import write_det_catalog

        fname = _format_name(pi_cfg.get("file_name",
                                        "process_info_{visit}.txt"),
                             ctx, "all", 0)
        write_det_catalog(os.path.join(out_cfg.get("dir", "output"),
                                       fname))


def run_visit(cfg_or_path, overrides=(), logger=None):
    """Entry point: `imsim_tpu.run_visit('user.yaml')` — the
    `galsim user.yaml` equivalent.  Returns the per-CCD result list.

    With `output.io_workers: N` (N >= 1) multi-CCD visits run a
    PIPELINED output stage: the device renders CCD k+1 while worker
    threads RICE-compress and write CCD k's files (the C++ codec and
    disk IO release the GIL; all device work stays on the main
    thread).  The per-CCD fan-out role of the reference's
    output.nproc (imsim/ccd.py + multiprocessing) for the IO-bound
    tail — compute fan-out is the mesh path (parallel/visit.py).

    With `output.mesh` ({ccd: C, phot: M} | int | auto) the visit runs
    the PRODUCTION multi-device path (parallel/visit.run_visit_mesh):
    blocks of C CCDs render concurrently over a jax.sharding.Mesh —
    photon batches over ('ccd', 'phot'), sky/noise and the readout
    chain over 'ccd' — and write the same per-CCD outputs.  This is
    the device-mesh replacement for the reference's output.nproc
    process fan-out (config/imsim-config.yaml:326).

    Memory: full-focal-plane visits would retain ~13 GB of eimages in
    the returned list (VERDICT r2), so pixel arrays are DROPPED from
    retained results beyond the first 16 CCDs unless
    `output.keep_images: true` (files always carry the full data;
    `run_visit_iter` streams complete results regardless)."""
    cfg = load_config(cfg_or_path, overrides)
    keep = (cfg.get("output", {}) or {}).get("keep_images")
    results = []
    for result in run_visit_iter(cfg, logger=logger):
        strip = (keep is False) or (keep is not True
                                    and len(results) >= 16)
        if strip:
            result = dict(result)
            result["eimage"] = None
            result.pop("amps", None)
        results.append(result)
    return results
