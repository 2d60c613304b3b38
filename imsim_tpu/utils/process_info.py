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


def write_catalog(path: str):
    """Dump collected rows as the process_info output catalog."""
    with open(path, "w") as f:
        f.write("# stage pid wall_s cpu_s maxrss_mb\n")
        for r in _rows:
            f.write(f"{r['stage']!r} {r['pid']} {r['wall_s']:.3f} "
                    f"{r['cpu_s']:.3f} {r['maxrss_mb']:.1f}\n")
