"""Mie-derived aerosol model tables (data/aerosol_mie.py).

Anchors are published-class values for the Shettle–Fenn / 5S models
(S&F 1979 AFGL-TR-79-0214; Tanre et al. 5S): single-scatter albedo,
asymmetry, and Angstrom exponents at 0.55 um.  Tolerances are loose —
the tables are regenerated physics, not the reference's DATA blocks —
but tight enough to catch convention errors (sign of the imaginary
index, normalization, growth direction).
"""

import numpy as np
import pytest

from sbdart_tpu.data.aerosol_mie import RH_GRID, WL_GRID, tables
from sbdart_tpu.data.aerosols import bl_model, strat_model


def _angstrom(iaer, rh=70.0):
    wl = np.array([0.55, 0.70])
    e, _, _ = bl_model(iaer, wl, rh)
    return -np.log(e[1] / e[0]) / np.log(wl[1] / wl[0])


class TestBLAnchors:
    def test_rural(self):
        _, w0, g = bl_model(1, np.array([0.55]), 70.0)
        assert 0.90 < w0[0] < 0.99          # S&F rural ~0.94-0.97
        assert 0.6 < g[0] < 0.8
        assert 0.9 < _angstrom(1) < 1.5     # ~1.1-1.3

    def test_urban_absorbs(self):
        _, w0u, _ = bl_model(2, np.array([0.55]), 70.0)
        _, w0r, _ = bl_model(1, np.array([0.55]), 70.0)
        assert w0u[0] < w0r[0] - 0.1        # soot: strongly more absorbing
        assert 0.55 < w0u[0] < 0.85

    def test_oceanic_coarse_flat(self):
        _, w0, g = bl_model(3, np.array([0.55]), 70.0)
        assert w0[0] > 0.99                  # sea salt: conservative in vis
        assert 0.7 < g[0] < 0.85
        assert abs(_angstrom(3)) < 0.35      # nearly flat spectrum

    def test_tropospheric_fine(self):
        assert _angstrom(4) > 1.0            # fine mode only

    def test_growth_monotonic(self):
        """More humidity -> more water -> higher w0 for absorbing models."""
        t = tables()
        i55 = int(np.argmin(abs(t["wl"] - 0.55)))
        for i in range(2):                   # rural, urban
            w0 = t["bl_w0"][i, :, i55]
            assert np.all(np.diff(w0) > -1e-9)

    def test_ext_normalized(self):
        for iaer in (1, 2, 3, 4):
            for rh in (0.0, 73.0, 99.0):
                e, _, _ = bl_model(iaer, np.array([0.55]), rh)
                np.testing.assert_allclose(e[0], 1.0, rtol=1e-6)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            bl_model(9, np.array([0.55]), 50.0)


class TestStratAnchors:
    def test_background_sulfate(self):
        e, w0, g = strat_model(1, np.array([0.55, 0.70]))
        assert w0[0] > 0.999                 # H2SO4: non-absorbing in vis
        a = -np.log(e[1] / e[0]) / np.log(0.70 / 0.55)
        assert 1.0 < a < 2.0                 # small droplets, steep spectrum

    def test_fresh_volcanic_flatter_and_darker(self):
        e1, w1, _ = strat_model(1, np.array([0.55, 0.70]))
        e3, w3, _ = strat_model(3, np.array([0.55, 0.70]))
        a1 = -np.log(e1[1] / e1[0]) / np.log(0.70 / 0.55)
        a3 = -np.log(e3[1] / e3[0]) / np.log(0.70 / 0.55)
        assert a3 < a1                       # bigger particles
        assert w3[0] < w1[0]                 # ash absorbs

    def test_sulfate_ir_feature(self):
        """75% H2SO4 has its strong 9.5 um absorption: w0 drops in the IR."""
        _, w0, _ = strat_model(1, np.array([0.55, 9.5]))
        assert w0[1] < 0.6 < w0[0]

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            strat_model(0, np.array([0.55]))


class TestTableShape:
    def test_axes(self):
        t = tables()
        assert t["bl_ext"].shape == (4, len(RH_GRID), len(WL_GRID))
        assert t["st_ext"].shape == (4, len(WL_GRID))
        for k in ("bl_ext", "bl_w0", "bl_g", "st_ext", "st_w0", "st_g"):
            assert np.isfinite(t[k]).all(), k
            assert (t[k] >= 0).all(), k
