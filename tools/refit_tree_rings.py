#!/usr/bin/env python
"""Refit a measured tree-ring displacement profile into the reference's
``tree_ring_parameters`` text format.

Analog of devel-tools/refit_tree_ring_data.py: takes a measured radial
displacement curve dr(r) for a detector (two-column text/npy: radius in
pixels, displacement in pixels) and produces one parameter block in the
format consumed by ``imsim_tpu.sensor.treerings.read_tree_ring_parameters``
(and the reference's imsim/treerings.py:120-136):

    <title>
    Rx Ry Sx Sy Cx Cy A B
    <column header>
    numfreqs rows of: cfreq cphase sfreq sphase

The parameterization constrains each sinusoid's amplitude to
period/(2*pi) inside an (A + B r^4) envelope, so the fit proceeds:

1. pick the ``numfreqs`` dominant periods from the FFT periodogram of
   dr(r) (envelope-flattened),
2. linear LSQ for per-period sin/cos coefficients under the running
   (A + B r^4) envelope, iterating the envelope fit once,
3. convert each free-amplitude sinusoid R sin(wr + phi) into the
   format's fixed-amplitude pair — the cfreq term contributes
   (T/2pi) sin(wr + cp) and the sfreq term (T/2pi) sin(wr + sp - pi/2);
   two equal unit phasors at angle delta apart sum to magnitude
   2 cos(delta/2), so cp = phi + delta/2, sp = phi - delta/2 + pi/2
   with delta = 2 acos(min(R w T / (4 pi), 1) ... see _split_phases —
   any R <= 2T/(2pi) is exactly representable; a global scale folds
   the remainder into A and B.
"""
from __future__ import annotations

import argparse
import re
import sys

import numpy as np


def _fit_envelope(r, dr):
    """Fit env(r) = A + B r^4 by regressing |dr| over ALL samples:
    E|dr| = env(r) * E|wave| with the wave factor r-independent, so the
    regression recovers (A, B) up to the global scale that the
    representability step folds back in anyway.  (Local-maxima
    envelope samples are far too noisy under 6+ beating sinusoids.)"""
    a = np.abs(dr)
    # normalized r^4 column: the raw (1, r^4) design spans ~15 decades
    # and lstsq's rcond cutoff silently zeroes the constant column
    r4max = float(np.max(r)) ** 4 or 1.0
    M = np.stack([np.ones_like(r), r**4 / r4max], axis=1)
    A, Bs = np.linalg.lstsq(M, a, rcond=None)[0]
    if A <= 0:                       # degenerate: flat envelope
        return float(np.mean(a)) or 1.0, 0.0
    return float(A), max(float(Bs) / r4max, 0.0)


def _top_periods(r, w, nfreq, tmin=50.0, tmax=2000.0):
    """Dominant periods of the flattened wave via a 16x zero-padded
    rfft periodogram with parabolic sub-bin peak refinement (a half-bin
    frequency error drifts the phase by ~pi over a 4k-pixel sensor and
    would decorrelate the LSQ fit)."""
    step = float(np.median(np.diff(r)))
    n = len(r)
    npad = 16 * n
    power = np.abs(np.fft.rfft(w * np.hanning(n), n=npad)) ** 2
    freqs = np.fft.rfftfreq(npad, d=step)
    ok = np.zeros(len(freqs), bool)
    nz = freqs > 0
    ok[nz] = (1.0 / freqs[nz] >= tmin) & (1.0 / freqs[nz] <= tmax)
    # local maxima only
    peak = np.zeros_like(ok)
    peak[1:-1] = (power[1:-1] >= power[:-2]) & (power[1:-1] >= power[2:])
    idx = np.argsort(power * (ok & peak))[::-1]
    out = []
    for i in idx:
        if not (ok[i] and peak[i]) or power[i] <= 0:
            continue
        # parabolic interpolation of log power around the peak bin
        f = freqs[i]
        if 0 < i < len(power) - 1 and power[i - 1] > 0 and power[i + 1] > 0:
            la, lb, lc = np.log(power[i - 1: i + 2])
            den = la - 2 * lb + lc
            if den < 0:
                f = freqs[i] + 0.5 * (la - lc) / den * (freqs[1] - freqs[0])
        T = 1.0 / f
        # keep peaks separated by one PHYSICAL resolution bin
        if all(abs(1 / T - 1 / t) > 0.5 / (n * step) for t in out):
            out.append(float(T))
        if len(out) == nfreq:
            break
    while len(out) < nfreq:        # degenerate input: pad the grid
        out.append(tmin * (tmax / tmin) ** (len(out) / nfreq))
    return np.array(out)


def _split_phases(Rw, phi, T):
    """Express R sin(wr+phi) as (T/2pi)[sin(wr+cp) - cos(wr+sp)].

    -cos(x+sp) = sin(x+sp-pi/2); two unit phasors separated by delta
    sum to 2 cos(delta/2).  rho = R / (T/2pi) in [0, 2]."""
    rho = np.clip(Rw / (T / (2 * np.pi)), 0.0, 2.0)
    delta = 2.0 * np.arccos(rho / 2.0)
    cp = phi + delta / 2.0
    sp = phi - delta / 2.0 + np.pi / 2.0
    return cp % (2 * np.pi), sp % (2 * np.pi)


def refit_profile(r, dr, numfreqs=20):
    """Fit (A, B, cfreqs, cphases, sfreqs, sphases) to dr(r) [pixels]."""
    r = np.asarray(r, float)
    dr = np.asarray(dr, float)
    A, B = _fit_envelope(r, dr / 0.01)
    for _ in range(2):                      # envelope <-> wave iteration
        env = 0.01 * (A + B * r**4)
        w = dr / np.maximum(env, 1e-12)
        periods = _top_periods(r, w, numfreqs)
        # linear LSQ in the envelope-weighted domain
        cols = []
        for T in periods:
            cols += [np.sin(2 * np.pi * r / T), np.cos(2 * np.pi * r / T)]
        M = np.stack(cols, axis=1) * env[:, None]
        coef = np.linalg.lstsq(M, dr, rcond=None)[0]
        a, b = coef[0::2], coef[1::2]
        Rj = np.hypot(a, b)
        # representability: scale so every R_j <= 2 T_j / 2pi
        s = float(min(1.0, np.min((2 * periods / (2 * np.pi))
                                  / np.maximum(Rj, 1e-12))))
        A, B = A / s, B / s
        Rj = Rj * s
        phij = np.arctan2(b, a)
    cp, sp = _split_phases(Rj, phij, periods)
    return A, B, periods, cp, periods.copy(), sp


def model_displacement(r, A, B, cf, cph, sf, sph):
    r = np.asarray(r, float)
    wave = np.zeros_like(r)
    for T, p in zip(cf, cph):
        wave += np.sin(2 * np.pi * r / T + p) * T / (2 * np.pi)
    for T, p in zip(sf, sph):
        wave += -np.cos(2 * np.pi * r / T + p) * T / (2 * np.pi)
    return 0.01 * (A + B * r**4) * wave


def format_block(det_name, center, A, B, cf, cph, sf, sph):
    m = re.fullmatch(r"R(\d)(\d)_S(\d)(\d)", det_name)
    if not m:
        raise ValueError(f"bad detector name {det_name!r}")
    cx, cy = center[0] - 2048.5, center[1] - 2048.5
    lines = [f"Tree ring parameters refit for {det_name}",
             "%s %s %s %s %.3f %.3f %.6e %.6e" % (*m.groups(), cx, cy, A, B),
             "cfreq cphase sfreq sphase"]
    for row in zip(cf, cph, sf, sph):
        lines.append("%.8f %.8f %.8f %.8f" % row)
    return "\n".join(lines) + "\n"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("profile", help="two-column text/npy: r_px, dr_px")
    p.add_argument("--det", required=True, help="detector, e.g. R22_S11")
    p.add_argument("--center", nargs=2, type=float, default=[-100.0, -100.0],
                   help="ring center in pixel coords")
    p.add_argument("--numfreqs", type=int, default=20)
    p.add_argument("-o", "--output", default=None)
    a = p.parse_args(argv)
    if a.profile.endswith(".npy"):
        arr = np.load(a.profile)
        r, dr = arr[0], arr[1]
    else:
        r, dr = np.loadtxt(a.profile, unpack=True)
    A, B, cf, cph, sf, sph = refit_profile(r, dr, a.numfreqs)
    fit = model_displacement(r, A, B, cf, cph, sf, sph)
    rms = float(np.sqrt(np.mean((fit - dr) ** 2)))
    print(f"fit rms residual: {rms:.2e} px "
          f"(signal rms {np.sqrt(np.mean(dr**2)):.2e})", file=sys.stderr)
    block = format_block(a.det, a.center, A, B, cf, cph, sf, sph)
    if a.output:
        with open(a.output, "w") as f:
            f.write(block)
    else:
        sys.stdout.write(block)


if __name__ == "__main__":
    main()
