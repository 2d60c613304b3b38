"""Visit-level fan-out across hosts (DCN axis).

The reference scales past one node by launching independent processes
per visit/CCD-shard from a cluster scheduler (SURVEY §2c: "cluster-scale
runs are embarrassingly parallel by visit/CCD driven externally"; the
galsim CLI's ``-n njobs -j job`` split).  TPU-native equivalent: the
per-host program renders its share of the focal plane on its local
chips (the intra-host mesh of parallel/visit.py), and hosts coordinate
only on WHO renders WHAT — there is no cross-host reduction in a visit,
so the DCN carries no collective traffic and scaling is linear by
construction.

Topology discovery, in priority order:

1. an already-initialized ``jax.distributed`` runtime
   (process_index/process_count) — the standard multi-host JAX launch;
2. ``coordinator`` arguments -> ``jax.distributed.initialize`` (one
   controller per host, TPU pod style);
3. scheduler environment: ``IMSIM_TPU_NUM_HOSTS``/``IMSIM_TPU_HOST_ID``
   or SLURM's ``SLURM_NTASKS``/``SLURM_PROCID`` — the reference's
   external-driver pattern, no coordinator needed.

Within a host, ``run_visit_iter`` routes through the mesh / pipelined-IO
paths exactly as single-host runs do; multi-visit lists additionally
stride visits across hosts before CCDs (coarsest parallelism first, the
cheapest DCN layout).
"""
from __future__ import annotations

import os


def detect_topology(coordinator: str | None = None,
                    num_hosts: int | None = None,
                    host_id: int | None = None):
    """Return (num_hosts, host_id)."""
    import jax

    if (num_hosts is None) != (host_id is None) and not coordinator:
        raise ValueError(
            "detect_topology: pass BOTH num_hosts and host_id (or a "
            "coordinator); a lone value would silently fall back to "
            "single-host and duplicate work across the fleet")
    if num_hosts is not None and host_id is not None:
        return int(num_hosts), int(host_id)
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_hosts) if num_hosts else None,
            process_id=int(host_id) if host_id is not None else None)
        return jax.process_count(), jax.process_index()
    if jax.process_count() > 1:
        return jax.process_count(), jax.process_index()
    for n_var, i_var in (("IMSIM_TPU_NUM_HOSTS", "IMSIM_TPU_HOST_ID"),
                         ("SLURM_NTASKS", "SLURM_PROCID")):
        n = os.environ.get(n_var)
        if n and int(n) > 1:
            return int(n), int(os.environ.get(i_var, 0))
    return 1, 0


def host_share(items, num_hosts: int, host_id: int):
    """Strided split (matches the galsim CLI's -n/-j semantics, which
    the in-config output.njobs/job path also uses): host j of n takes
    every n-th item starting at j."""
    return list(items)[host_id::num_hosts]


def run_visit_multihost(cfg_or_path, overrides=(), logger=None,
                        coordinator: str | None = None,
                        num_hosts: int | None = None,
                        host_id: int | None = None):
    """Render this host's share of a visit (or of a visit list).

    Single visit: the detector list (after output.only_dets /
    output.det_num filtering) strides across hosts via the existing
    output.njobs/job mechanism, so mesh + pipelined-IO + process-info
    all apply per host.  Returns the per-CCD results of THIS host.
    """
    from ..config.runner import run_visit_iter

    n, j = detect_topology(coordinator, num_hosts, host_id)
    if logger:
        logger.info("multihost: host %d/%d", j, n)
    ov = list(overrides) + [f"output.njobs={n}", f"output.job={j + 1}"]
    return list(run_visit_iter(cfg_or_path, overrides=ov, logger=logger))


def run_visits_multihost(cfg_or_path, visits, overrides=(), logger=None,
                         coordinator: str | None = None,
                         num_hosts: int | None = None,
                         host_id: int | None = None):
    """Multi-visit production: visits stride across hosts first (each
    visit rendered whole by one host — zero cross-host traffic), CCDs
    parallelize on the host's local chips.  `visits` is a list of visit
    ids resolved through input.opsim_data.visit."""
    n, j = detect_topology(coordinator, num_hosts, host_id)
    out = {}
    for visit in host_share(visits, n, j):
        from ..config.runner import run_visit_iter

        ov = list(overrides) + [f"input.opsim_data.visit={visit}"]
        if logger:
            logger.info("multihost: host %d/%d rendering visit %s",
                        j, n, visit)
        out[visit] = list(run_visit_iter(cfg_or_path, overrides=ov,
                                         logger=logger))
    return out
