"""Catalog-ingest benchmark: native C++ tokenizer vs the Python
reference parser on a synthetic DC2-scale instance catalog.

Usage: python benchmarks/instcat_bench.py [n_rows]

Measures (a) one cold parse each way, (b) the per-CCD cost after the
visit-level parse cache (read_instcat with a WCS cull) — the number a
189-CCD visit actually pays per detector.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_catalog(path, n):
    rng = np.random.default_rng(1)
    with open(path, "w") as f:
        f.write("rightascension 30.0\ndeclination -20.0\n")
        for i in range(n):
            t = i % 3
            ra, dec = 30 + rng.random(), -20 + rng.random()
            if t == 0:
                f.write(f"object {i} {ra:.6f} {dec:.6f} "
                        f"{18 + 6 * rng.random():.4f} "
                        f"starSED/mlt/lte{i % 90:03d}.txt.gz 0 0 0 0 0 0 "
                        f"point none CCM {rng.random():.3f} 3.1\n")
            elif t == 1:
                f.write(f"object {i} {ra:.6f} {dec:.6f} "
                        f"{19 + 5 * rng.random():.4f} "
                        f"galaxySED/Exp.spec.gz {rng.random():.3f} "
                        f"{0.01 * rng.random():.5f} {0.01 * rng.random():.5f} "
                        f"{0.002 * rng.random():.5f} 0 0 sersic2d "
                        f"{0.5 + rng.random():.4f} {0.2 + 0.3 * rng.random():.4f} "
                        f"{360 * rng.random():.3f} {0.5 + 3 * rng.random():.3f} "
                        f"CCM {0.3 * rng.random():.3f} 3.1 "
                        f"CCM {0.1 * rng.random():.3f} 3.1\n")
            else:
                f.write(f"object {i} {ra:.6f} {dec:.6f} "
                        f"{20 + 4 * rng.random():.4f} "
                        f"galaxySED/Inst.spec.gz {rng.random():.3f} 0 0 0 "
                        f"0 0 knots {0.5 + rng.random():.4f} "
                        f"{0.2 + 0.3 * rng.random():.4f} "
                        f"{360 * rng.random():.3f} "
                        f"{int(5 + 20 * rng.random())} none "
                        f"CCM {0.1 * rng.random():.3f} 3.1\n")


class FlatWCS:
    def radec_to_xy(self, ra, dec):
        return ((ra - 30.0 * np.pi / 180) * 2e5,
                (dec + 20.0 * np.pi / 180) * 2e5)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    path = "/tmp/instcat_bench.txt"
    if not os.path.exists(path) or os.path.getsize(path) < n * 50:
        make_catalog(path, n)

    from imsim_tpu.catalog.instcat import (_parse_instcat,
                                           _parse_instcat_cached,
                                           read_instcat)
    from imsim_tpu.catalog.native_instcat import parse_instcat_native

    parse_instcat_native(path)  # warm the .so build
    t0 = time.time()
    nat, _ = parse_instcat_native(path)
    t_nat = time.time() - t0
    t0 = time.time()
    py, _ = _parse_instcat(path, force_python=True)
    t_py = time.time() - t0
    _parse_instcat_cached.cache_clear()
    read_instcat(path, wcs=FlatWCS())       # populate cache
    t0 = time.time()
    tab = read_instcat(path, wcs=FlatWCS())
    t_ccd = time.time() - t0
    print(f"rows: {len(nat)}  native: {t_nat:.2f}s  python: {t_py:.2f}s "
          f"({t_py / t_nat:.1f}x)  per-CCD cull (cached parse): "
          f"{t_ccd * 1e3:.0f} ms ({len(tab)} kept)")


if __name__ == "__main__":
    main()
