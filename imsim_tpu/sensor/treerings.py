"""Tree-ring displacement model — imsim/treerings.py parity.

The reference reads per-detector parameter files (189 detectors x 40
sinusoid frequencies) measured from flats, and feeds a radial
displacement LookupTable + ring center to GalSim's SiliconSensor
(imsim/treerings.py:14-68 TreeRingRadialFunction; consumed via
TreeRingCenter/TreeRingFunc at config/imsim-config.yaml:230-235).

Here the same *model family* is generated deterministically per
detector (sha256-seeded, like the reference's fringing seeds): radial
displacement
    dr(r) = cumulative-integral of sum_k A_k (a + b r^4) sin(2 pi r / T_k + phi_k)
with the published amplitude scale (~ 0.01-0.04 pixel displacement) and
period range (~ 100-200 pixels), ring centers a few thousand pixels off
the sensor corner.  The output is the dense radial profile table the
Pallas/jnp silicon sensor samples in its hot loop
(imsim_tpu.sensor.silicon SiliconParams.treering_*).
"""
from __future__ import annotations

import hashlib

import numpy as np

from ..utils.lookup import UniformTable


def _rng_for(det_name: str) -> np.random.Generator:
    h = hashlib.sha256(f"treering:{det_name}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


class TreeRingModel:
    """Per-detector ring center + radial displacement profile."""

    def __init__(self, det_name: str, r_max: float = 8000.0,
                 n_points: int = 2048, only_dets=None, defer=False):
        self.det_name = det_name
        self.r_max = r_max
        rng = _rng_for(det_name)
        # center: outside the sensor, a few kpx off one of the 4 corners
        corner = rng.integers(0, 4)
        cx = rng.uniform(2000.0, 7000.0)
        cy = rng.uniform(2000.0, 7000.0)
        sx = -1.0 if corner in (0, 3) else 1.0
        sy = -1.0 if corner in (0, 1) else 1.0
        # sensor ~4k: put center offset from the [0,4k] box
        self.center = (2048.0 + sx * cx, 2048.0 + sy * cy)

        # 40 sinusoidal components of the *doping variation*; the
        # displacement profile is its integral, with an (a + b r^4)
        # radial envelope like the measured data
        nfreq = 40
        periods = rng.uniform(95.0, 210.0, nfreq)        # pixels
        phases = rng.uniform(0, 2 * np.pi, nfreq)
        amps = rng.lognormal(np.log(0.25), 0.5, nfreq) / nfreq
        r = np.linspace(0.0, r_max, n_points)
        a_env, b_env = 1.0, 1.0 / 8000.0**4
        wave = np.zeros_like(r)
        for T, ph, A in zip(periods, phases, amps):
            wave += A * np.sin(2 * np.pi * r / T + ph)
        profile = wave * (a_env + b_env * r**4)
        # overall amplitude: ~0.02 px rms displacement (measured scale)
        rms = np.std(profile[n_points // 4:])
        profile *= 0.02 / max(rms, 1e-9)
        self.profile = profile.astype(np.float32)
        self.table = UniformTable(0.0, r_max / (n_points - 1), self.profile)

    def radial_displacement(self, r):
        return self.table(np.asarray(r, np.float32))


class TreeRings:
    """Lazy per-detector cache (imsim/treerings.py:169-195 reads lazily
    because loading all 189 profiles eagerly costs ~30 s in the
    reference; generation here is ~1 ms per detector but the same lazy
    interface is kept)."""

    def __init__(self, only_dets=None, defer_load=True):
        self._cache: dict[str, TreeRingModel] = {}
        if only_dets and not defer_load:
            for d in only_dets:
                self.get(d)

    def get(self, det_name: str) -> TreeRingModel:
        if det_name not in self._cache:
            self._cache[det_name] = TreeRingModel(det_name)
        return self._cache[det_name]

    def get_center(self, det_name: str):
        return self.get(det_name).center

    def get_func(self, det_name: str):
        return self.get(det_name).table
