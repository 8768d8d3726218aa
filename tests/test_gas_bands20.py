"""20 cm^-1 gas band tables: intensities, structure, and growth laws.

Pins data/gas_bands20.py (the production tables for H2O/CO2/O3/O2/CH4/N2O)
at three levels the old band-scale envelopes could not support:

  1. INTEGRATED INTENSITY: int S dnu over each feature equals its quoted
     published band intensity by construction — the table cannot drift
     from the spectroscopic magnitudes without failing here.
  2. SPECTRAL STRUCTURE at 20 cm^-1: band edges, Q branches and window
     boundaries sit where spectroscopy puts them (e.g. the CO2 nu3 band
     absorbs at 2349 but NOT at 2200 cm^-1; the 8-12 um window is not
     contaminated by the H2O rotational band).
  3. CURVE OF GROWTH: total band absorptance follows the published
     Malkmus regimes (Goody & Yung ch. 4): linear A ~ S u in the weak
     limit, square-root A ~ sqrt(S beta u) in the strong-line regime.
"""

import numpy as np
import pytest

from sbdart_tpu.data.gas_bands20 import (
    FEATURES20,
    NU_GRID,
    _UNIT,
    band_parameters20,
    tables20,
)
from sbdart_tpu.gas import malkmus_transmission


def test_grid_is_20_percm():
    assert np.allclose(np.diff(NU_GRID), 20.0)
    assert NU_GRID[0] == 100.0 and NU_GRID[-1] >= 39990.0


@pytest.mark.parametrize("gas", sorted(FEATURES20))
def test_integrated_intensity_matches_quoted(gas):
    """int S dnu == sum of quoted feature intensities (unit-converted)."""
    s, _ = tables20(gas)
    total = np.trapezoid(s, NU_GRID)
    quoted = sum(f["s_atm"] for f in FEATURES20[gas]) * _UNIT[gas]
    assert total == pytest.approx(quoted, rel=1e-3), (gas, total, quoted)


def test_co2_band_edges():
    """nu3 absorbs at its center, not 150 cm^-1 outside; 15 um complex
    bounded by ~550-800 cm^-1; the 10 um window is clean."""
    s, _ = tables20("co2")

    def at(nu):
        return np.interp(nu, NU_GRID, s)

    assert at(2349.0) > 100.0 * at(2150.0)
    assert at(667.0) > 30.0 * at(520.0)
    assert at(667.0) > 30.0 * at(900.0)
    assert at(1000.0) < 0.05                 # window (laser bands are weak)


def test_h2o_window_clean():
    """H2O line absorption in the 8-12 um window stays below ~0.3
    (g/cm^2)^-1 — the rotational band must not leak a pseudo-continuum
    (the e-type continuum is modeled separately)."""
    s, _ = tables20("h2o")
    win = (NU_GRID >= 900.0) & (NU_GRID <= 1100.0)
    assert s[win].max() < 0.3, s[win].max()
    # while the rot band core is orders of magnitude stronger
    core = (NU_GRID >= 150.0) & (NU_GRID <= 350.0)
    assert s[core].max() > 1000.0


def test_o3_96um_double_structure():
    """The 9.6 um feature peaks near 1042 cm^-1 and is gone by 900."""
    s, _ = tables20("o3")

    def at(nu):
        return np.interp(nu, NU_GRID, s)

    assert at(1042.0) > 20.0 * at(900.0)
    assert at(701.0) > 5.0 * at(850.0)       # nu2 distinct from 9.6 um


def test_o2_aband_position():
    """A band at 13121 cm^-1 (762 nm), narrow: gone 200 cm^-1 away."""
    s, _ = tables20("o2")

    def at(nu):
        return np.interp(nu, NU_GRID, s)

    assert at(13121.0) > 50.0 * at(12800.0)


@pytest.mark.parametrize("gas,ulo,uhi", [
    ("co2", 1e-6, 1e-4),      # weak regime amounts [1e20 molec/cm^2]
    ("ch4", 1e-6, 1e-4),
])
def test_weak_limit_linear_growth(gas, ulo, uhi):
    """A(u) ~ u in the optically thin limit (published weak-line law)."""
    s, beta = tables20(gas)
    a_lo = np.trapezoid(1 - malkmus_transmission(s, beta, ulo), NU_GRID)
    a_hi = np.trapezoid(1 - malkmus_transmission(s, beta, uhi), NU_GRID)
    slope = np.log(a_hi / a_lo) / np.log(uhi / ulo)
    assert slope == pytest.approx(1.0, abs=0.08), slope


def test_strong_line_sqrt_growth_co2_15um():
    """CO2 15 um band-core absorptance grows ~ sqrt(u) in the strong-line
    regime (Goody & Yung eq. 4.x; the classic curve-of-growth result)."""
    s, beta = tables20("co2")
    band = (NU_GRID >= 550.0) & (NU_GRID <= 800.0)
    amounts = np.array([3.0, 12.0, 48.0])    # tropospheric-column-scale
    a = [
        np.trapezoid(
            1 - malkmus_transmission(s[band], beta[band], u), NU_GRID[band]
        )
        for u in amounts
    ]
    s1 = np.log(a[1] / a[0]) / np.log(4.0)
    s2 = np.log(a[2] / a[1]) / np.log(4.0)
    # sqrt regime, tempered by the saturated Q-branch core
    assert 0.25 < s1 < 0.62, (s1, a)
    assert 0.20 < s2 < 0.60, (s2, a)


def test_band_parameters20_interpolates_in_wavelength():
    wl = np.array([15.0, 10.0, 4.3, 0.762])
    s, b = band_parameters20("co2", wl)
    assert s[0] > 1.0 and s[2] > 50.0        # 15 um, 4.3 um bands
    assert s[1] < 0.05                        # window
    assert (b > 0).all()
