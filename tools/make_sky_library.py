"""Generate the shipped sky component spectral library
(imsim_tpu/data/sky_library.npz).

The reference composes per-condition sky SPECTRA from rubin_sim's ESO
model template library (imsim/sky_model.py:44-85); that library is not
redistributable here, so this tool SYNTHESIZES a component library that

  * reproduces the analytic model's pinned per-band dark-sky rates
    exactly by construction (image/sky.py DARK_SKY_SB, themselves
    validated against the reference's data/sky_model_sed_DC2Production
    snapshot in tests/test_sky_sed.py), and
  * carries physically-motivated spectral morphology on top: the
    airglow line forest ([OI] 557.7/630.0/636.4, NaD, O2(0-1) 864.5,
    OH Meinel Delta-v ladders; Rousselot et al. 2000 / Hanuschik 2003
    band structure) that sets y-band fringing contrast, and the
    Rayleigh + aerosol scattering law that makes moonlight BLUER than
    the solar spectrum (Krisciunas & Schaefer 1991; Noll et al. 2012
    moon module) — the color the analytic solar-color scaling misses.

Component normalization conventions (consumed by image/sky.py):

  airglow    the FULL dark zenith sky spectrum (the analytic model
             adds its zodiacal floor ON TOP of DARK_SKY_SB, and the
             library mirrors that composition for exact path parity);
             the van-Rhijn/extinction factor applies to it
  zodiacal   ecliptic-pole brightness (the ecliptic morphology factor
             is >= 1 elsewhere)
  moonlight  scattered-moonlight spectrum normalized so its V-band
             photon rate equals the dark-sky V rate — i.e. "unit
             Krisciunas & Schaefer V-ratio"; the K&S geometry scalar
             multiplies it directly, the template carries the color
  twilight   scattered-sunlight (Rayleigh-weighted) spectrum
             normalized so its r-band rate equals the dark-sky r rate
             ("unit twilight r-ratio", see SkyModel._twilight_excess)

Run:  python tools/make_sky_library.py [out.npz]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imsim_tpu.catalog.bandpass import (hardware_bandpass,  # noqa: E402
                                        rubin_bandpass)
from imsim_tpu.image.sky import (DARK_SKY_SB, EXTINCTION_K,  # noqa: E402
                                 SUN_AB_MAG, V_DARK_SB, ZODI_POLE_SB)
from imsim_tpu.image.sky_sed import photon_rate  # noqa: E402

BANDS = "ugrizy"
_HC_ERG_NM = 6.62607015e-27 * 2.99792458e10 * 1e7
_C_NM = 2.99792458e17          # c in nm/s
WAVE = np.arange(305.0, 1149.0, 0.1)   # nm

# band effective wavelengths for smooth-interpolation anchors
BAND_EFF = {"u": 367.0, "g": 482.0, "r": 622.0,
            "i": 754.0, "z": 869.0, "y": 971.0}


def v_bandpass():
    """Johnson-ish V for the K&S normalization: Gaussian 551/88 nm."""
    from imsim_tpu.catalog.bandpass import Bandpass
    t = np.exp(-0.5 * ((WAVE - 551.0) / (88.0 / 2.3548)) ** 2)
    return Bandpass(WAVE, t, "V")


def ab_flambda(m_ab):
    """flambda [erg/s/cm^2/nm/arcsec^2] of a flat-fnu AB source."""
    fnu = 3631e-23 * 10 ** (-0.4 * np.asarray(m_ab, float))
    return fnu * _C_NM / WAVE ** 2


def band_mag(flam, bp) -> float:
    """AB mag/arcsec^2 of flambda through a (non-zeropointed) bandpass:
    photon-rate ratio vs the AB-zero flat-fnu spectrum."""
    rate = photon_rate(WAVE, flam, bp)
    rate0 = photon_rate(WAVE, ab_flambda(0.0), bp)
    return -2.5 * np.log10(rate / rate0)


def analytic_rate(band: str, mag: float) -> float:
    """photons/s/cm^2/arcsec^2 that image/sky.py's ANALYTIC path
    assigns to surface brightness `mag`: through the total-system
    AB zeropoint (SkyModel.get_sky_level's convention).  The library
    is calibrated so hardware-bandpass integration of its templates
    reproduces these exact rates — the two SkyModel code paths then
    agree at dark conditions by construction."""
    return 10 ** (-0.4 * (mag - rubin_bandpass(band).zeropoint))


def rate_err_mag(flam, bps, targets):
    """Per-band -2.5 log10(got/target) of hardware-integrated rates."""
    return np.array([
        -2.5 * np.log10(photon_rate(WAVE, flam, bps[b])
                        / targets[b]) for b in BANDS])


def fit_smooth(mags: dict, bps: dict, iters=10):
    """Smooth spectrum whose HARDWARE-integrated photon rates match
    the analytic path's rates for the given surface brightnesses.

    Interpolates AB(lambda) through the band anchors (flat
    extrapolation), then iterates additive anchor corrections until
    every band rate matches to <1 mmag."""
    anchors = np.array([BAND_EFF[b] for b in BANDS])
    m = np.array([mags[b] for b in BANDS], float)
    targets = {b: analytic_rate(b, mags[b]) for b in BANDS}
    corr = np.zeros(len(BANDS))
    flam = None
    for _ in range(iters):
        mi = np.interp(WAVE, anchors, m + corr)
        flam = ab_flambda(mi)
        err = rate_err_mag(flam, bps, targets)
        if np.abs(err).max() < 1e-3:
            break
        corr -= err
    return flam


def airglow_lines():
    """Additive airglow emission-line forest (relative flambda units,
    scaled later).  Main discrete features of the optical/NIR night
    sky: [OI] auroral/nebular lines, NaD, the O2(0-1) atmospheric
    band, and OH Meinel Delta-v = 2..4 ladders that dominate 700-1100
    nm (Rousselot et al. 2000 band heads; Hanuschik 2003 fluxes set
    the relative scale)."""
    rng = np.random.default_rng(20260820)
    f = np.zeros_like(WAVE)

    def line(center, amp, sigma=0.15):
        nonlocal f
        f = f + amp * np.exp(-0.5 * ((WAVE - center) / sigma) ** 2)

    line(557.73, 9.0)          # [OI] green — brightest visible line
    line(630.03, 3.0)          # [OI] red (variable; quiet-sky level)
    line(636.38, 1.0)
    line(589.0, 1.2)           # NaD blend
    line(589.6, 0.8)
    # O2(0-1) atmospheric band ~ 864.5: rotational envelope
    for j in range(10):
        line(860.0 + 1.1 * j, 2.2 * np.exp(-j / 4.0), 0.2)
    # OH Meinel ladders: (band head nm, strength) for the strong
    # Delta-v sequences 700-1120; each head expands into a P/Q/R
    # rotational ladder redward (~1.5 nm spacing, exponential decay)
    heads = [(712.0, 2.0), (728.0, 2.6), (740.0, 3.2), (775.0, 3.6),
             (791.0, 4.2), (830.0, 5.4), (846.0, 6.0), (888.0, 7.6),
             (902.0, 8.0), (924.0, 8.6), (948.0, 9.4), (972.0, 9.8),
             (1010.0, 10.8), (1028.0, 11.2), (1064.0, 12.0),
             (1082.0, 12.4), (1110.0, 12.6)]
    for head, s in heads:
        for j in range(12):
            amp = s * np.exp(-j / 4.5) * (0.7 + 0.6 * rng.random())
            line(head + 1.5 * j + 0.25 * rng.standard_normal(), amp)
    return f


def extinction_curve():
    """Smooth k(lambda) [mag/airmass] through the per-band
    coefficients (image/sky.py EXTINCTION_K) with a Rayleigh-like
    blue rise."""
    anchors = np.array([BAND_EFF[b] for b in BANDS])
    k = np.array([EXTINCTION_K[b] for b in BANDS])
    return np.interp(WAVE, anchors, k)


def main(out=None):
    out = out or os.path.join(os.path.dirname(__file__), "..",
                              "imsim_tpu", "data", "sky_library.npz")
    bps = {b: hardware_bandpass(b) for b in BANDS}
    bpv = v_bandpass()

    # --- zodiacal: smooth solar-ish spectrum at the ecliptic pole ----
    zodi = fit_smooth(ZODI_POLE_SB, bps)

    # --- dark zenith sky: smooth base matching DARK_SKY_SB, with the
    # airglow line forest folded in WITHOUT changing band integrals:
    # fit_smooth's correction loop runs against (smooth + lines) ------
    lines = airglow_lines()
    # scale the forest so it carries ~55% of the y-band flux (typical
    # line/continuum split of the 950-1100 nm dark sky once the smooth
    # pseudo-continuum — which includes scattered/instrumental light —
    # is counted); fit_smooth then recalibrates every band exactly
    dark0 = fit_smooth(DARK_SKY_SB, bps)
    y_rate = photon_rate(WAVE, dark0, bps["y"])
    l_rate = photon_rate(WAVE, lines, bps["y"])
    lines = lines * (0.55 / 0.45) * (y_rate / max(l_rate, 1e-30))

    # iterate a smooth MULTIPLICATIVE correction on (smooth + lines):
    # it rescales the line forest and the continuum together, so bands
    # where the OH ladders alone exceed the target (i, z) still
    # converge, and each band's line/continuum split is preserved
    anchors = np.array([BAND_EFF[b] for b in BANDS])
    dark_targets = {b: analytic_rate(b, DARK_SKY_SB[b]) for b in BANDS}
    dark = dark0 + lines
    for _ in range(12):
        err = rate_err_mag(dark, bps, dark_targets)
        if np.abs(err).max() < 1e-3:
            break
        dark = dark * 10 ** (-0.4 * np.interp(WAVE, anchors, -err))
    assert np.abs(err).max() < 5e-3, err

    # "airglow" = the FULL dark zenith spectrum.  The analytic model
    # (image/sky.py get_sky_level) adds the zodiacal term ON TOP of
    # DARK_SKY_SB (the measured dark sky already contains the pole
    # zodiacal light; the analytic model keeps the extra term as a
    # documented floor) — the library mirrors that composition exactly
    # so the two code paths agree at dark conditions by construction.
    airglow = dark

    # --- moonlight: solar spectral shape x scattering law x one
    # reference extinction path, normalized to unit K&S V-ratio -------
    sun_shape = fit_smooth(SUN_AB_MAG, bps)          # absolute scale free
    lam_ratio = 551.0 / WAVE
    scatter = 0.75 * lam_ratio ** 4 + 0.25 * lam_ratio ** 1.3
    k = extinction_curve()
    path = 10 ** (-0.4 * k * 1.5)    # reference moon path Xm = 1.5
    moon = sun_shape * scatter * path
    v_dark_rate = photon_rate(WAVE, ab_flambda(V_DARK_SB), bpv)
    moon = moon * v_dark_rate / photon_rate(WAVE, moon, bpv)

    # --- twilight: Rayleigh-weighted scattered sunlight, unit r-ratio
    twi = sun_shape * lam_ratio ** 4 * 10 ** (-0.4 * k * 1.0)
    r_dark_rate = photon_rate(WAVE, dark, bps["r"])
    twi = twi * r_dark_rate / photon_rate(WAVE, twi, bps["r"])

    np.savez_compressed(out, wave=WAVE, airglow=airglow, zodiacal=zodi,
                        moonlight=moon, twilight=twi)
    print(f"wrote {out}")
    for b in BANDS:
        got = photon_rate(WAVE, airglow, bps[b])
        tgt = analytic_rate(b, DARK_SKY_SB[b])
        print(f"  {b}: dark rate {got:9.3e} / analytic {tgt:9.3e} "
              f"({got / tgt:5.3f})  moon/dark "
              f"{photon_rate(WAVE, moon, bps[b]) / got:6.2f}  "
              f"twi/dark {photon_rate(WAVE, twi, bps[b]) / got:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
