"""Extraterrestrial solar irradiance spectrum.

Replaces the solar databases compiled into spectra.f (reference component
#6: LOWTRAN7 [nf=2, default], 5S [nf=1], MODTRAN3 [nf=3]).  REGENERATED
(see data/__init__.py): a smoothed composite solar spectrum anchored at
standard-spectrum values (Wehrli-85 / ASTM-E490 class) through the
SW, with a 5777 K Planck continuation for the IR tail, normalized so the
0-inf integral equals the modern TSI (1361 W/m^2).  All nf database codes
map to this table (documented approximation); nf=0 is spectrally flat,
nf=-1 reads the user's solar.dat.
"""

from __future__ import annotations

import functools

import numpy as np

from sbdart_tpu.constants import SOLAR_CONSTANT

# anchor points [um, W/m^2/um] (smoothed composite)
_ANCHORS = np.array([
    [0.20, 12.0], [0.22, 45.0], [0.25, 64.0], [0.28, 220.0], [0.30, 514.0],
    [0.32, 830.0], [0.35, 975.0], [0.40, 1430.0], [0.45, 2030.0],
    [0.50, 1940.0], [0.55, 1870.0], [0.60, 1750.0], [0.65, 1590.0],
    [0.70, 1420.0], [0.75, 1280.0], [0.80, 1160.0], [0.85, 1030.0],
    [0.90, 900.0], [0.95, 830.0], [1.00, 745.0], [1.10, 600.0],
    [1.20, 485.0], [1.30, 410.0], [1.40, 340.0], [1.50, 290.0],
    [1.60, 245.0], [1.70, 200.0], [1.80, 165.0], [1.90, 130.0],
    [2.00, 105.0], [2.20, 82.0], [2.50, 55.0], [2.80, 40.0], [3.00, 31.0],
    [3.50, 17.0], [4.00, 9.5],
])

_T_SUN = 5777.0


def _planck_wl(wl_um: np.ndarray, t: float) -> np.ndarray:
    """Planck spectral radiance in wavelength, arbitrary scale."""
    c2 = 14387.77  # um K
    x = c2 / (wl_um * t)
    return wl_um**-5 / np.expm1(x)


@functools.lru_cache(maxsize=None)
def solar_table() -> tuple[np.ndarray, np.ndarray]:
    """(wl [um], E0 [W/m^2/um]) on a dense grid 0.2-100 um, TSI-normalized."""
    wl = np.concatenate([
        np.arange(0.20, 4.001, 0.005),
        np.geomspace(4.05, 100.0, 400),
    ])
    e = np.interp(wl, _ANCHORS[:, 0], _ANCHORS[:, 1], left=0.0, right=np.nan)
    # IR tail: Planck continuation matched at 4 um
    pl = _planck_wl(wl, _T_SUN)
    scale = _ANCHORS[-1, 1] / _planck_wl(np.array([4.0]), _T_SUN)[0]
    tail = pl * scale
    e = np.where(np.isnan(e), tail, e)
    total = np.trapezoid(e, wl)
    e *= SOLAR_CONSTANT / total
    return wl, e


def solar_irradiance(wl_um: np.ndarray, nf: int = 2) -> np.ndarray:
    """Solar spectral irradiance at 1 AU [W/m^2/um].

    nf: -1 handled by the caller (solar.dat); 0 flat (1 W/m^2/um);
    1/2/3 all map to the regenerated composite table (see module docstring).
    """
    wl = np.asarray(wl_um, np.float64)
    if nf == 0:
        return np.ones_like(wl)
    twl, te = solar_table()
    return np.interp(wl, twl, te, left=0.0, right=0.0)
