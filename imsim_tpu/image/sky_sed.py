"""Loadable sky-spectrum data path — the rubin_sim.skybrightness role
(imsim/sky_model.py:33-87: the reference evaluates an ESO-model sky SED
at the pointing and integrates it through the HARDWARE bandpass).

That package and its template library are not available here, so this
module defines a documented, open data surface instead:

* a 2-column text/ECSV file ``wavelength_nm  flambda`` — one spectrum,
  interpreted as the dark-sky zenith spectrum
  [erg/s/cm^2/nm/arcsec^2]; observing conditions layer on analytically
  (image/sky.py flux-ratio morphology), or
* an ``.npz`` with ``wave`` plus any of the component spectra
  ``airglow``, ``zodiacal``, ``moonlight``, ``twilight``, ``merged``
  (each (N,), same units).  Components are integrated separately and
  each rides its own analytic spatial/conditions scaling, mirroring the
  ESO model's per-component composition.

The spectrum feeds two consumers:

* ``photon_rate`` — photons/s/cm^2/arcsec^2 through a bandpass, the
  reference's ``sed.calculateFlux(bp_hardware)`` (sky_model.py:80-87);
* ``etalon_visibility`` — the fringe CONTRAST of the spectrum through
  the sensor's epitaxial etalon: narrow OH Meinel lines interfere,
  smooth continuum washes out, so the y-band fringing amplitude follows
  the actual sky spectrum (the reference scales fringing by the OH
  skyline level, sky_model.py:214-233).
"""
from __future__ import annotations

import dataclasses

import numpy as np

_HC_ERG_NM = 6.62607015e-27 * 2.99792458e10 * 1e7  # h*c in erg*nm

COMPONENTS = ("airglow", "zodiacal", "moonlight", "twilight", "merged")


@dataclasses.dataclass(frozen=True)
class SkySED:
    """wave_nm (N,) and per-component flambda [erg/s/cm^2/nm/arcsec^2];
    a plain 2-column file loads as the single component 'merged'."""

    wave_nm: np.ndarray
    components: dict

    @property
    def merged(self):
        if "merged" in self.components:
            return self.components["merged"]
        return np.sum(list(self.components.values()), axis=0)


def default_library_path() -> str:
    """The shipped component library (tools/make_sky_library.py):
    synthesized airglow/zodiacal/moonlight/twilight templates whose
    band integrals reproduce the analytic dark-sky rates exactly and
    whose morphology carries the OH line forest (y fringing contrast)
    and the Rayleigh/Mie moonlight blue-up the analytic solar-color
    scaling misses."""
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "sky_library.npz")


def load_sky_sed(path: str) -> SkySED:
    if str(path) == "default":
        path = default_library_path()
    if str(path).endswith(".pkl"):
        # the reference's DC2-production sky spectrum snapshot
        # (data/sky_model_sed_DC2Production.pkl): a pickled
        # (wave_nm[n], flambda[1, n]) tuple
        import pickle

        with open(path, "rb") as f:
            wave, flam = pickle.load(f)
        wave = np.asarray(wave, float)
        flam = np.asarray(flam, float).reshape(-1, wave.size)
        return SkySED(wave, {"merged": flam.sum(axis=0)})
    if str(path).endswith(".npz"):
        with np.load(path) as z:
            wave = np.asarray(z["wave"], float)
            comps = {k: np.asarray(z[k], float) for k in COMPONENTS
                     if k in z}
        if not comps:
            raise ValueError(f"{path}: no sky components among "
                             f"{COMPONENTS}")
        return SkySED(wave, comps)
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.replace(",", " ").split()
            if len(parts) >= 2:
                try:
                    rows.append((float(parts[0]), float(parts[1])))
                except ValueError:
                    continue  # header line
    arr = np.asarray(rows, float)
    order = np.argsort(arr[:, 0])
    return SkySED(arr[order, 0], {"merged": arr[order, 1]})


def photon_rate(wave_nm, flambda, bandpass) -> float:
    """photons/s/cm^2/arcsec^2 of a flambda spectrum through a
    catalog.bandpass.Bandpass."""
    T = bandpass(wave_nm)
    fphot = np.asarray(flambda, float) * wave_nm / _HC_ERG_NM
    return float(np.trapezoid(fphot * T, wave_nm))


def etalon_visibility(wave_nm, flambda, bandpass,
                      thickness_um: float = 40.0,
                      n_si: float = 3.55) -> float:
    """Fringe contrast V = |int p(l) exp(i 4 pi n t / l) dl| / int p dl
    of the photon spectrum p through the sensor's thin-film etalon
    (epitaxial layer optical thickness n*t).  Narrow emission lines
    (coherence length >> etalon) give V ~ line-flux fraction; a smooth
    continuum gives V ~ 0.  thickness_um is the EFFECTIVE interfering
    layer (deep-depletion epitaxial structure), not the full 100 um
    device."""
    T = bandpass(wave_nm)
    p = np.asarray(flambda, float) * wave_nm * T
    tot = np.trapezoid(p, wave_nm)
    if tot <= 0:
        return 0.0
    phase = 4.0 * np.pi * n_si * (thickness_um * 1e3) / wave_nm
    c = np.trapezoid(p * np.exp(1j * phase), wave_nm)
    return float(np.abs(c) / tot)


# --- synthetic y-band reference spectrum -----------------------------------
# OH Meinel rotational-vibrational bands dominate the y sky.  Band-head
# wavelengths (nm, vacuum) of the Delta-v = 2, 3 sequences in 900-1100,
# each expanded into a short rotational ladder.  Used only to ANCHOR the
# default fringing amplitude (0.2%, the reference's nominal) so a loaded
# real spectrum scales it by V/V_ref.
_OH_BANDS = [(9, 7, 908.0), (4, 1, 916.0), (8, 6, 958.0), (5, 2, 1029.0),
             (9, 8, 1042.0), (6, 3, 1080.0)]


def synthetic_y_sky(n: int = 4096):
    """(wave_nm, flambda) synthetic dark y-band sky: OH line forest on a
    thermal-ish continuum, line/continuum split ~85/15 (typical of the
    900-1100 nm dark sky)."""
    w = np.linspace(880.0, 1120.0, n)
    f = np.full(n, 1.0)
    rng = np.random.default_rng(20260817)
    for (vu, vl, head) in _OH_BANDS:
        # P/Q/R rotational ladder redward of the head, ~1.5 nm spacing
        for j in range(14):
            line = head + 1.55 * j + 0.3 * rng.standard_normal()
            amp = 60.0 * np.exp(-j / 5.0) * (0.7 + 0.6 * rng.random())
            f += amp * np.exp(-0.5 * ((w - line) / 0.12) ** 2)
    return w, f


_VREF_CACHE: dict = {}


def fringing_amplitude(sky_sed: SkySED | None, bandpass,
                       base_amplitude: float = 0.002,
                       thickness_um: float = 40.0) -> float:
    """Fringing amplitude for CCD_Fringing: base_amplitude anchored to
    the synthetic OH reference spectrum, scaled by the loaded
    spectrum's actual etalon visibility.  None -> base_amplitude."""
    if sky_sed is None:
        return base_amplitude
    key = (id(bandpass), thickness_um)
    vref = _VREF_CACHE.get(key)
    if vref is None:
        wr, fr = synthetic_y_sky()
        vref = etalon_visibility(wr, fr, bandpass, thickness_um)
        _VREF_CACHE[key] = vref
    v = etalon_visibility(sky_sed.wave_nm, sky_sed.merged, bandpass,
                          thickness_um)
    return base_amplitude * v / max(vref, 1e-12)
