"""Per-stage wall/RSS profiling — the `process_info` extra output
(imsim/process_info.py:20-51 logs per-stamp PID/RSS/USS/cpu-time rows).
Here: a context manager logging wall time + peak RSS per stage, and a
row collector that can be dumped as the process-info catalog."""
from __future__ import annotations

import contextlib
import os
import resource
import time

_rows: list[dict] = []


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@contextlib.contextmanager
def stage_profile(name: str, logger=None, enabled: bool = True):
    t0 = time.time()
    cpu0 = time.process_time()
    try:
        yield
    finally:
        if enabled:
            row = dict(stage=name, pid=os.getpid(),
                       wall_s=time.time() - t0,
                       cpu_s=time.process_time() - cpu0,
                       maxrss_mb=rss_mb())
            _rows.append(row)
            if logger:
                logger.info("%s: wall %.2fs cpu %.2fs maxrss %.0f MB",
                            name, row["wall_s"], row["cpu_s"],
                            row["maxrss_mb"])


def rows():
    return list(_rows)


# per-detector process rows — the reference's per-stamp catalog columns
# (imsim/process_info.py:9-38: object_id pid rss uss user_time
# unix_time); the pooled architecture has no per-stamp host units, so
# the unit of record is the detector
_det_rows: list[dict] = []


def record_det_row(det_name: str, logger=None) -> None:
    try:
        import psutil

        proc = psutil.Process(os.getpid())
        mem = proc.memory_full_info()
        rss, uss = mem.rss / 1024 ** 3, mem.uss / 1024 ** 3
        user_time = proc.cpu_times().user
    except Exception:               # psutil-less fallback
        rss = rss_mb() / 1024.0
        uss = rss
        user_time = time.process_time()
    row = dict(det_name=det_name, pid=os.getpid(), rss=rss, uss=uss,
               user_time=user_time, unix_time=time.time())
    _det_rows.append(row)
    if logger:
        logger.info("det %s, pid %d, RSS %.2f GB, USS %.2f GB, "
                    "user_time %.2f, unix_time %.1f", det_name,
                    row["pid"], rss, uss, user_time, row["unix_time"])


def write_det_catalog(path: str) -> None:
    """The process_info extra-output catalog (one row per detector)."""
    with open(path, "w") as f:
        f.write("# det_name pid rss uss user_time unix_time\n")
        for r in _det_rows:
            f.write(f"{r['det_name']} {r['pid']} {r['rss']:.4f} "
                    f"{r['uss']:.4f} {r['user_time']:.2f} "
                    f"{r['unix_time']:.1f}\n")
    _det_rows.clear()


def write_catalog(path: str):
    """Dump collected rows as the process_info output catalog."""
    with open(path, "w") as f:
        f.write("# stage pid wall_s cpu_s maxrss_mb\n")
        for r in _rows:
            f.write(f"{r['stage']!r} {r['pid']} {r['wall_s']:.3f} "
                    f"{r['cpu_s']:.3f} {r['maxrss_mb']:.1f}\n")
