"""Derive measured FEA mode tables from the AOS sensitivity matrix.

The reference drives batoid_rubin's finite-element grids for its mirror
figure perturbations (imsim/telescope_loader.py:26-118); those grids are
not in this environment, but the reference DOES ship the measured
*optical response* of every bending mode: the AOS sensitivity matrix
(data/optics_data/sensitivity_matrix.txt, consumed at
imsim/optical_system.py:223-224) — 35 hexapolar field points x 19
annular Zernikes (Noll 4..22) x 50 degrees of freedom, where DOF 10-29
are the 20 M1M3 bending modes and DOF 30-49 the 20 M2 bending modes,
in micron-of-wavefront per micron of mode amplitude.

This tool projects those measured responses into the fea/ npz exchange
tables (imsim_tpu/optics/fea.py module docstring):

  bending modes:  surface figure = field-center wavefront response / 2
                  (near-normal reflection double-pass), split 0.7/0.3
                  between the M1 and M3 areas of the monolith.  The
                  *relative shape* — which Zernikes each physical mode
                  excites, with measured amplitudes — is the payload;
                  it replaces the seeded random basis previously used.
  gravity:        print-through expressed in the span of the measured
                  low-order bending modes (the AOS LUT corrects gravity
                  with exactly these actuator modes, so the residual
                  lives in their span): sin-zenith row = the softest
                  mode shape, (cos-zenith - 1) row = the second, each
                  normalized to unit surface RMS and scaled to the
                  0.4 um (M1M3) / 0.15 um (M2) horizon amplitudes.
  temperature:    per-degree figure terms mapped onto the measured
                  modes by symmetry — bulk/z-grad/r-grad onto the most
                  axisymmetric (Z4/Z11/Z22-dominated) modes, x/y
                  gradients onto the strongest x-coma / y-coma modes —
                  at the 0.1 um/C (M1M3) / 0.05 um/C (M2) scales.

Usage:
    python tools/derive_fea_from_sensitivity.py \
        [--matrix /root/reference/data/optics_data/sensitivity_matrix.txt] \
        [--out imsim_tpu/data/fea]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imsim_tpu.optics.aos import N_DOF, N_FIELD, N_ZK, \
    load_sensitivity_matrix  # noqa: E402

JMIN = 4          # tables span Noll j = 4..22, same as the matrix
_AXI = np.array([4, 11, 22]) - JMIN          # axisymmetric Noll j
_XCOMA = 8 - JMIN                            # Z8: horizontal (x) coma
_YCOMA = 7 - JMIN                            # Z7: vertical (y) coma


def _rms(v):
    return float(np.sqrt((np.asarray(v) ** 2).sum()))


def _unit(v):
    return np.asarray(v, float) / max(_rms(v), 1e-300)


def bending_tables(senM):
    """(m1m3_surface, m2_surface): (20, 19) field-center surface-figure
    response [um surface per um mode] for each bending-mode DOF."""
    wf_m1m3 = senM[0, :, 10:30].T          # (20, 19) um wf / um mode
    wf_m2 = senM[0, :, 30:50].T
    return wf_m1m3 / 2.0, wf_m2 / 2.0      # reflection double-pass


def _by_symmetry(modes):
    """Rank mode indices: (axisymmetric-ranked, x-coma best, y-coma
    best).  `modes` is (n, 19) surface tables."""
    p = modes ** 2
    tot = p.sum(axis=1) + 1e-300
    axi_frac = p[:, _AXI].sum(axis=1) / tot
    axi_order = np.argsort(-axi_frac)
    x_best = int(np.argmax(p[:, _XCOMA] / tot))
    y_best = int(np.argmax(p[:, _YCOMA] / tot))
    return axi_order, x_best, y_best


def derive(senM):
    m1m3_b, m2_b = bending_tables(senM)

    def grav(modes, amp):
        # softest (largest-response) two modes carry the print-through
        resp = np.sqrt((modes ** 2).sum(axis=1))
        order = np.argsort(-resp)
        return np.stack([amp * _unit(modes[order[0]]),
                         amp * _unit(modes[order[1]])])

    axi13, x13, y13 = _by_symmetry(m1m3_b)
    m1m3_temp = np.stack([
        0.1e-6 * _unit(m1m3_b[axi13[0]]),   # TBulk
        0.1e-6 * _unit(m1m3_b[x13]),        # TxGrad
        0.1e-6 * _unit(m1m3_b[y13]),        # TyGrad
        0.1e-6 * _unit(m1m3_b[axi13[1]]),   # TzGrad
        0.1e-6 * _unit(m1m3_b[axi13[2]]),   # TrGrad
    ])
    axi2, _, _ = _by_symmetry(m2_b)
    m2_temp = np.stack([
        0.05e-6 * _unit(m2_b[axi2[0]]),     # TzGrad
        0.05e-6 * _unit(m2_b[axi2[1]]),     # TrGrad
    ])

    g13 = grav(m1m3_b, 0.4e-6)
    m1m3 = {
        "jmin": np.int32(JMIN),
        # bending tables: m per um of mode amplitude, 0.7/0.3 monolith
        # split (um->m is the 1e-6)
        "m1_bending": 0.7 * m1m3_b * 1e-6,
        "m3_bending": 0.3 * m1m3_b * 1e-6,
        "m1_gravity": 0.7 * g13,
        "m3_gravity": 0.3 * g13,
        "m1_temp": 0.7 * m1m3_temp,
        "m3_temp": 0.3 * m1m3_temp,
    }
    m2 = {
        "jmin": np.int32(JMIN),
        "m2_bending": m2_b * 1e-6,
        "m2_gravity": grav(m2_b, 0.15e-6),
        "m2_temp": m2_temp,
    }
    return m1m3, m2


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default=(
        "/root/reference/data/optics_data/sensitivity_matrix.txt"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "imsim_tpu", "data", "fea"))
    a = ap.parse_args(argv)

    senM = load_sensitivity_matrix(a.matrix)
    assert senM.shape == (N_FIELD, N_ZK, N_DOF)
    m1m3, m2 = derive(senM)
    os.makedirs(a.out, exist_ok=True)
    np.savez(os.path.join(a.out, "m1m3_modes.npz"), **m1m3)
    np.savez(os.path.join(a.out, "m2_modes.npz"), **m2)
    for name, d in (("m1m3_modes", m1m3), ("m2_modes", m2)):
        print(name, {k: getattr(v, "shape", v) for k, v in d.items()})


if __name__ == "__main__":
    main()
