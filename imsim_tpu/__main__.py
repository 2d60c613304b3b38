"""CLI: `python -m imsim_tpu user.yaml [key.path=value ...]`

The `galsim user.yaml` equivalent (doc/usage.rst:9-16): run a visit
config with dotted-key overrides.  Extra flags: -v/-q logging,
--profile for per-stage timing (the process_info observability analog).
"""
import argparse
import logging
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="imsim_tpu",
        description="TPU-native Rubin/LSST image simulator")
    p.add_argument("config", help="visit config YAML")
    p.add_argument("overrides", nargs="*",
                   help="dotted-key overrides: image.nbatch=4 ...")
    p.add_argument("-v", "--verbose", action="count", default=1)
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="log per-detector wall time + peak RSS")
    p.add_argument("--visits", default=None,
                   help="comma-separated opsim visit ids (or a:b range) "
                        "to render in sequence; overrides "
                        "input.opsim_data.visit per visit.  Compiled "
                        "kernels are reused across visits (static "
                        "shapes), so visit 2+ skips all XLA compiles — "
                        "the DC2-style batch-production mode")
    p.add_argument("-n", "--njobs", type=int, default=1,
                   help="split this visit's detectors across N "
                        "cluster jobs (the galsim CLI's -n; pair "
                        "with -j)")
    p.add_argument("-j", "--job", type=int, default=1,
                   help="which job (1..njobs) this invocation is")
    args = p.parse_args(argv)

    level = logging.WARNING if args.quiet else (
        logging.DEBUG if args.verbose > 1 else logging.INFO)
    logging.basicConfig(level=level, stream=sys.stdout,
                        format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("imsim_tpu")

    from .config.runner import run_visit_iter
    from .utils.process_info import stage_profile

    if args.visits:
        if ":" in args.visits:
            a, b = args.visits.split(":")
            visit_ids = list(range(int(a), int(b)))
        else:
            visit_ids = [int(v) for v in args.visits.split(",")]
    else:
        visit_ids = [None]

    t0 = time.time()
    for visit in visit_ids:
        overrides = list(args.overrides)
        if visit is not None:
            overrides.append(f"input.opsim_data.visit={visit}")
        if args.njobs > 1:
            overrides += [f"output.njobs={args.njobs}",
                          f"output.job={args.job}"]
        tv = time.time()
        # run_visit_iter routes serial / pipelined-IO (output.io_workers)
        # / mesh (output.mesh) identically to the library API and yields
        # per-CCD results as their outputs land
        with stage_profile("visit", logger, enabled=args.profile):
            for result in run_visit_iter(args.config, overrides,
                                         logger=logger):
                # the CLI keeps no references: each result dict is
                # released as soon as its (possibly pipelined) write
                # completes, so memory is bounded by the IO window.
                # Do NOT mutate it here — the io_workers branch still
                # holds it for the pending write.
                if args.profile:
                    logger.info("det %s done at +%.1fs",
                                result["det_name"], time.time() - tv)
        if visit is not None:
            logger.info("visit %s complete in %.1fs", visit,
                        time.time() - tv)
    logger.info("%d visit(s) complete in %.1fs", len(visit_ids),
                time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
