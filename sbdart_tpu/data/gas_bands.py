"""Gas band-model parameters.

Replaces the LOWTRAN7 band-model coefficient tables compiled into taugas.f
(reference component #3 — the largest and most parity-critical table,
SURVEY.md section 3.3).  REGENERATED (see data/__init__.py): each gas is
described by its known vibration-rotation bands (center, width, band
strength) driving a Malkmus statistical band model, plus gray continuum
cross-sections for the electronic-band absorbers (O3 UV/visible, NO2) and
the H2O continuum.

PROVENANCE (2026-08-20 calibration — tests/test_gas_calibration.py pins
all of it):
  * H2O SW bands: calibrated against the Lacis & Hansen (1974) column-
    absorptance parametrization, <= 9% over 0.2-10 cm water paths;
  * O3 UV/vis cross-sections: Hartley/Huggins/Chappuis magnitudes, column
    absorption within ~7% of Lacis & Hansen;
  * O2 bands: strengths set to published per-band solar absorptions
    (A-band 2.5 W/m^2, B 0.5, gamma 0.2, 1.27 um 1.0);
  * H2O rotational band, 6.3 um, e-type continuum, CO2 15 um: calibrated
    against LBL-class clear-sky OLR/DLR for tropical / midlat-summer /
    subarctic-winter columns (agreement ~2%, SAW OLR ~3%).
These are physically-shaped, integrally-calibrated coefficients — NOT the
LOWTRAN7 tables; swap those in for bit parity when the reference mount is
populated (SURVEY.md section 8.6).

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
#
# NOTE (round 3): the H2O/CO2/O3/O2/CH4/N2O entries below are SUPERSEDED in
# production by the 20 cm^-1 tables of data/gas_bands20.py (gas.py routes
# the major gases there); they are retained as the round-2 calibration
# record and for the minor-gas code path, which still reads this table.

# SW strengths/overlap CALIBRATED 2026-08-20 against the Lacis & Hansen
# (1974, JAS 31, 118) water-vapor absorption parametrization
# A(y) = 2.9y / [(1 + 141.5y)^0.635 + 5.925y]: flux-weighted column
# absorptance matches to <= 9% over y in [0.2, 10] cm (S x 40, beta x
# 0.1625 vs the round-1 order-of-magnitude values — the absorption sits in
# the Malkmus strong-line sqrt(S beta u) regime, as for real H2O lines).
H2O_BANDS = [
    # near-IR / SW bands
    (0.72, 0.015, 3.2, 0.024), (0.82, 0.02, 6.0, 0.024),
    (0.94, 0.03, 32.0, 0.024), (1.14, 0.035, 60.0, 0.024),
    (1.38, 0.05, 320.0, 0.024), (1.87, 0.06, 480.0, 0.024),
    (2.70, 0.10, 2400.0, 0.024), (3.20, 0.12, 800.0, 0.024),
    # 6.3 um vibration and the far-IR rotational band.  Rotational-band
    # strengths CALIBRATED 2026-08-20 (x 0.3) against LBL-class clear-sky
    # OLR/DLR for tropical / midlatitude-summer / subarctic-winter columns
    # (tests/test_gas_calibration.py): the stronger round-1 values put the
    # far-IR emission level in the upper troposphere (Tb ~ 225 K at
    # 25-50 um vs ~245 K observed), depressing OLR ~3%.
    (6.30, 0.50, 150.0, 0.20), (16.0, 4.0, 12.0, 0.25),
    (25.0, 8.0, 90.0, 0.30), (50.0, 25.0, 600.0, 0.35),
]

CO2_BANDS = [
    (1.40, 0.02, 0.015, 0.10), (1.60, 0.025, 0.03, 0.10),
    (2.00, 0.03, 0.12, 0.10), (2.70, 0.06, 1.5, 0.10),
    (4.30, 0.18, 60.0, 0.12), (5.20, 0.05, 0.06, 0.10),
    (9.40, 0.15, 0.015, 0.10), (10.40, 0.15, 0.02, 0.10),
    # 15 um strength calibrated (x 0.75) with the OLR/DLR anchor set; the
    # round-1 value over-chilled the 13-16 um brightness temperatures
    (15.0, 1.8, 9.0, 0.15),
]

O3_BANDS = [
    (4.75, 0.15, 0.6, 0.12), (9.60, 0.45, 18.0, 0.12), (14.1, 0.8, 3.0, 0.15),
]

# CALIBRATED 2026-08-20: strengths set so each band's flux-weighted slant
# (M = 1.16) absorption matches its published magnitude — gamma 0.2 W/m^2,
# B 0.5, A-band 2.5, 1.27 um (a1Dg) 1.0 W/m^2; round-1 values were
# ~500-2000x too strong and a spurious 6.4 um pseudo-band (tau ~ 2!) has
# been removed.
O2_BANDS = [
    (0.628, 0.006, 1.35e-6, 0.05), (0.688, 0.006, 5.2e-6, 0.05),
    (0.762, 0.008, 5.25e-5, 0.05), (1.27, 0.015, 2.39e-5, 0.05),
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
#   u_eff = u ((p + p_d)/p0)^np (T0/T)^nt
SCALING = {
    "h2o": (0.9, 0.45), "co2": (0.75, 0.5), "o3": (0.4, 0.2),
    "o2": (0.95, 0.5), "ch4": (0.8, 0.5), "n2o": (0.8, 0.5),
    "co": (0.8, 0.5), "so2": (0.8, 0.5), "nh3": (0.8, 0.5),
    "no": (0.8, 0.5), "hno3": (0.8, 0.5), "o4": (1.9, 0.5),
}

# Doppler-floor equivalent pressure p_d [mb]: below ~10 mb the Lorentz width
# alpha_L = alpha_L0 (p/p0) (alpha_L0 ~ 0.07 cm^-1) drops under the Doppler
# width alpha_D = 4.3e-7 nu0 sqrt(T/M), so line cores keep absorbing and a
# pure (p/p0)^a scaling kills stratospheric absorption (measured effect:
# the CO2 15-um stratopause cooling peak collapses from ~6.5 to ~2 K/day —
# tests/test_heating_profile.py).  p_d = p where alpha_L = alpha_D for each
# gas's dominant LW band (CO2 667 cm^-1, H2O rotational ~400, O3 1050).
# SW-band gases (O2 A-band etc.) keep p_d = 0: their columns are
# troposphere-dominated and their strengths were calibrated without it.
DOPPLER_FLOOR_MB = {"h2o": 9.0, "co2": 10.0, "o3": 15.0}

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
    vapor-pressure weighting folded into an effective quadratic amount.

    Band-wing values (7-9, 13-14.5 um) REVERTED 2026-08-21 to the round-1
    magnitudes: the round-2 x2.5 inflation compensated the old band model's
    missing wing structure, which the 20 cm^-1 tables (data/gas_bands20.py)
    now carry explicitly; keeping both double-counted the window-edge
    opacity (+10-20% DLR).
    """
    wl = np.asarray(wl_um, np.float64)
    pts = np.array([
        [7.0, 0.30], [8.0, 0.12], [9.0, 0.07], [10.0, 0.06], [11.0, 0.08],
        [12.0, 0.12], [13.0, 0.20], [14.0, 0.35],
    ])
    return np.interp(wl, pts[:, 0], pts[:, 1], left=0.0, right=1.2)
