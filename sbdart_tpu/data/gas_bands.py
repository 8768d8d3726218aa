"""Gas band-model parameters.

Replaces the LOWTRAN7 band-model coefficient tables compiled into taugas.f
(reference component #3 — the largest and most parity-critical table,
SURVEY.md section 3.3).  REGENERATED (see data/__init__.py): each gas is
described by its known vibration-rotation bands (center, width, band
strength) driving a Malkmus statistical band model, plus gray continuum
cross-sections for the electronic-band absorbers (O3 UV/visible, NO2) and
the H2O continuum.  Band strengths are tuned to reproduce the
right order of atmospheric absorptance for standard columns; they are NOT
the LOWTRAN7 coefficients — swap those in for bit parity (section 8.6).

Units: band centers/widths in um; strengths S in (absorber unit)^-1 where
the absorber unit is g/cm^2 for H2O, atm-cm for O3, molecules/cm^2 *1e-20
for the uniformly mixed gases.
"""

from __future__ import annotations

import numpy as np

# Each band: (center_um, halfwidth_um, S_band, beta0)
#   S_band: mean line-strength/spacing at band center per absorber unit
#   beta0:  Malkmus line-overlap parameter at 1013 mb
# Wing shape: S(lam) = S_band * exp(-|lam-center|/halfwidth * 3)

H2O_BANDS = [
    # near-IR / SW bands
    (0.72, 0.015, 0.08, 0.15), (0.82, 0.02, 0.15, 0.15),
    (0.94, 0.03, 0.8, 0.15), (1.14, 0.035, 1.5, 0.15),
    (1.38, 0.05, 8.0, 0.15), (1.87, 0.06, 12.0, 0.15),
    (2.70, 0.10, 60.0, 0.15), (3.20, 0.12, 20.0, 0.15),
    # 6.3 um vibration and the far-IR rotational band
    (6.30, 0.50, 150.0, 0.20), (16.0, 4.0, 40.0, 0.25),
    (25.0, 8.0, 300.0, 0.30), (50.0, 25.0, 2000.0, 0.35),
]

CO2_BANDS = [
    (1.40, 0.02, 0.015, 0.10), (1.60, 0.025, 0.03, 0.10),
    (2.00, 0.03, 0.12, 0.10), (2.70, 0.06, 1.5, 0.10),
    (4.30, 0.18, 60.0, 0.12), (5.20, 0.05, 0.06, 0.10),
    (9.40, 0.15, 0.015, 0.10), (10.40, 0.15, 0.02, 0.10),
    (15.0, 1.8, 12.0, 0.15),
]

O3_BANDS = [
    (4.75, 0.15, 0.6, 0.12), (9.60, 0.45, 18.0, 0.12), (14.1, 0.8, 3.0, 0.15),
]

O2_BANDS = [
    (0.628, 0.006, 0.0025, 0.05), (0.688, 0.006, 0.012, 0.05),
    (0.762, 0.008, 0.10, 0.05), (1.27, 0.015, 0.008, 0.05),
    (6.4, 1.0, 1e-4, 0.1),
]

CH4_BANDS = [
    (1.66, 0.04, 0.10, 0.10), (2.20, 0.05, 0.25, 0.10),
    (3.31, 0.10, 6.0, 0.10), (7.66, 0.35, 5.0, 0.12),
]

N2O_BANDS = [
    (2.87, 0.04, 1.0, 0.10), (3.90, 0.05, 0.4, 0.10),
    (4.50, 0.10, 10.0, 0.10), (7.78, 0.25, 3.0, 0.12),
    (16.98, 0.6, 1.5, 0.12),
]

CO_BANDS = [(2.34, 0.04, 0.12, 0.08), (4.67, 0.10, 3.0, 0.10)]

SO2_BANDS = [(7.3, 0.3, 2.0, 0.1), (8.7, 0.3, 1.5, 0.1)]
NH3_BANDS = [(10.5, 0.6, 8.0, 0.1), (6.1, 0.3, 3.0, 0.1)]
NO_BANDS = [(5.3, 0.15, 1.0, 0.1)]
HNO3_BANDS = [(11.3, 0.4, 10.0, 0.1), (7.6, 0.3, 8.0, 0.1)]
# O2-O2 collision complex: weak visible features treated as one pseudo-band
O4_BANDS = [(1.06, 0.02, 1e-5, 0.5), (1.27, 0.02, 3e-5, 0.5),
            (0.577, 0.01, 8e-6, 0.5), (0.63, 0.01, 5e-6, 0.5)]

# (p, T) scaling exponents for effective absorber amounts:
#   u_eff = u (p/p0)^np (T0/T)^nt
SCALING = {
    "h2o": (0.9, 0.45), "co2": (0.75, 0.5), "o3": (0.4, 0.2),
    "o2": (0.95, 0.5), "ch4": (0.8, 0.5), "n2o": (0.8, 0.5),
    "co": (0.8, 0.5), "so2": (0.8, 0.5), "nh3": (0.8, 0.5),
    "no": (0.8, 0.5), "hno3": (0.8, 0.5), "o4": (1.9, 0.5),
}

BANDS = {
    "h2o": H2O_BANDS, "co2": CO2_BANDS, "o3": O3_BANDS, "o2": O2_BANDS,
    "ch4": CH4_BANDS, "n2o": N2O_BANDS, "co": CO_BANDS, "so2": SO2_BANDS,
    "nh3": NH3_BANDS, "no": NO_BANDS, "hno3": HNO3_BANDS, "o4": O4_BANDS,
}


def band_parameters(gas: str, wl_um: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(S, beta) Malkmus parameters for `gas` at wavelengths wl_um.

    S in (absorber unit)^-1; beta dimensionless at p0 = 1013 mb.

    Band wing shapes are evaluated in WAVENUMBER space (band physics lives
    there); a band centered at `c` um with halfwidth `hw` um has wavenumber
    width 1e4*hw/c^2 cm^-1, so broad far-IR bands never leak into the SW.
    """
    wl = np.asarray(wl_um, np.float64)
    nu = 1.0e4 / np.maximum(wl, 1e-6)
    s = np.zeros_like(wl)
    b_accum = np.zeros_like(wl)
    for c, hw, s0, beta0 in BANDS.get(gas, []):
        nuc = 1.0e4 / c
        nuhw = 1.0e4 * hw / c**2
        x = np.abs(nu - nuc) / nuhw
        shape = np.where(x < 6.0, np.exp(-3.0 * x), 0.0)
        s += s0 * shape
        b_accum += beta0 * s0 * shape
    beta = np.where(s > 0, b_accum / np.maximum(s, 1e-300), 0.1)
    return s, beta


# --------------------------------------------------------------------------
# Continuum (gray, Beer–Lambert) cross-sections
# --------------------------------------------------------------------------

def o3_continuum_xsec(wl_um: np.ndarray) -> np.ndarray:
    """O3 electronic-band cross-section [cm^2/molecule]: Hartley, Huggins,
    Chappuis, Wulf (approximate log-interpolated curve)."""
    wl = np.asarray(wl_um, np.float64)
    pts = np.array([
        [0.20, 3.0e-19], [0.22, 2.0e-18], [0.245, 1.0e-17], [0.255, 1.15e-17],
        [0.27, 8.0e-18], [0.29, 1.5e-18], [0.30, 3.5e-19], [0.31, 1.0e-19],
        [0.32, 3.5e-20], [0.33, 1.1e-20], [0.34, 3.0e-21], [0.35, 9.0e-22],
        [0.37, 1.0e-22], [0.40, 1.0e-23], [0.45, 2.0e-22], [0.50, 1.3e-21],
        [0.55, 3.2e-21], [0.60, 4.6e-21], [0.65, 3.5e-21], [0.70, 1.7e-21],
        [0.75, 8.0e-22], [0.80, 3.0e-22], [0.90, 5.0e-23], [1.00, 1.0e-23],
    ])
    lx = np.log(np.interp(wl, pts[:, 0], pts[:, 1], left=pts[0, 1], right=1e-26))
    return np.exp(lx)


def no2_xsec(wl_um: np.ndarray) -> np.ndarray:
    """NO2 visible cross-section [cm^2/molecule] (approximate)."""
    wl = np.asarray(wl_um, np.float64)
    pts = np.array([
        [0.25, 2.0e-20], [0.30, 1.0e-19], [0.35, 3.0e-19], [0.40, 6.0e-19],
        [0.44, 6.5e-19], [0.50, 4.0e-19], [0.55, 2.0e-19], [0.60, 1.0e-19],
        [0.70, 2.0e-20], [0.80, 5.0e-21],
    ])
    return np.interp(wl, pts[:, 0], pts[:, 1], left=1e-20, right=0.0)


def h2o_continuum_coeff(wl_um: np.ndarray) -> np.ndarray:
    """Self-continuum absorption coefficient [per (g/cm^2)^2-ish]: the 8-13 um
    window e-type continuum, simplified to k = C(lam) * u * (e/e0) with the
    vapor-pressure weighting folded into an effective quadratic amount."""
    wl = np.asarray(wl_um, np.float64)
    pts = np.array([
        [7.0, 0.3], [8.0, 0.12], [9.0, 0.07], [10.0, 0.06], [11.0, 0.08],
        [12.0, 0.12], [13.0, 0.20], [14.0, 0.35],
    ])
    return np.interp(wl, pts[:, 0], pts[:, 1], left=0.0, right=0.5)
