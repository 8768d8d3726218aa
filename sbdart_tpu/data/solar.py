"""Extraterrestrial solar irradiance spectra.

Replaces the solar databases compiled into spectra.f (reference component
#6: LOWTRAN7 [nf=2, default], 5S [nf=1], MODTRAN3 [nf=3]).  REGENERATED
(see data/__init__.py): a smoothed composite solar spectrum anchored at
standard-spectrum values (Wehrli-85 / ASTM-E490 class) through the SW,
with a 5777 K Planck continuation for the IR tail.

The three database codes are DISTINCT tables built from the same anchor
shape with each database's documented character (provenance honest, exact
tables pending reference extraction — SURVEY.md section 8.6):

  nf=1 (5S, Tanre et al.):    5 nm-smoothed, no Fraunhofer structure,
                              normalized to the 5S solar constant 1358 W/m^2;
  nf=2 (LOWTRAN7, default):   moderate-resolution Fraunhofer line dips
                              (Ca II H/K, G band, H-beta, Mg b, Na D,
                              H-alpha), solar constant 1368 W/m^2;
  nf=3 (MODTRAN3 / Kurucz):   sharper, deeper line structure (higher
                              native resolution), solar constant 1362 W/m^2.

nf=0 is spectrally flat (1 W/m^2/um); nf=-1 reads the user's solar.dat.
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

# Database solar constants [W/m^2] (documented values of each source)
_DB_TSI = {1: 1358.0, 2: 1368.0, 3: 1362.0}

# Major Fraunhofer features: (center um, fractional depth, half-width um)
# — depths are band-averaged at ~2 nm resolution (LOWTRAN7-class)
_FRAUNHOFER = np.array([
    (0.3934, 0.35, 0.0015),   # Ca II K
    (0.3968, 0.30, 0.0015),   # Ca II H
    (0.4305, 0.15, 0.0020),   # CH G band
    (0.4861, 0.12, 0.0015),   # H-beta
    (0.5172, 0.10, 0.0020),   # Mg b
    (0.5890, 0.10, 0.0015),   # Na D
    (0.6563, 0.12, 0.0015),   # H-alpha
    (0.8542, 0.08, 0.0020),   # Ca II IR triplet
])


def _planck_wl(wl_um: np.ndarray, t: float) -> np.ndarray:
    """Planck spectral radiance in wavelength, arbitrary scale."""
    c2 = 14387.77  # um K
    x = c2 / (wl_um * t)
    return wl_um**-5 / np.expm1(x)


def _base_shape(wl: np.ndarray) -> np.ndarray:
    e = np.interp(wl, _ANCHORS[:, 0], _ANCHORS[:, 1], left=0.0, right=np.nan)
    # IR tail: Planck continuation matched at 4 um
    pl = _planck_wl(wl, _T_SUN)
    scale = _ANCHORS[-1, 1] / _planck_wl(np.array([4.0]), _T_SUN)[0]
    return np.where(np.isnan(e), pl * scale, e)


@functools.lru_cache(maxsize=None)
def solar_table(nf: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """(wl [um], E0 [W/m^2/um]) on a dense grid 0.2-100 um, TSI-normalized
    per database (see module docstring for the nf=1/2/3 distinctions)."""
    wl = np.concatenate([
        np.arange(0.20, 4.001, 0.002),
        np.geomspace(4.05, 100.0, 400),
    ])
    e = _base_shape(wl)
    if nf in (2, 3):
        # Fraunhofer line dips; MODTRAN3/Kurucz resolves them sharper/deeper
        depth_fac, width_fac = (1.0, 1.0) if nf == 2 else (1.25, 0.6)
        for c, d, hw in _FRAUNHOFER:
            prof = np.exp(-0.5 * ((wl - c) / (hw * width_fac)) ** 2)
            e = e * (1.0 - min(depth_fac * d, 0.9) * prof)
    elif nf == 1:
        # 5S: 5 nm boxcar smoothing of the anchor shape
        k = 3  # +-3 samples of the 2 nm grid ~ 5 nm window (SW section)
        sw = wl <= 4.0
        pad = np.pad(e[sw], k, mode="edge")
        sm = np.convolve(pad, np.ones(2 * k + 1) / (2 * k + 1), mode="valid")
        e = e.copy()
        e[sw] = sm
    total = np.trapezoid(e, wl)
    e = e * (_DB_TSI.get(nf, SOLAR_CONSTANT) / total)
    return wl, e


def solar_irradiance(wl_um: np.ndarray, nf: int = 2) -> np.ndarray:
    """Solar spectral irradiance at 1 AU [W/m^2/um].

    nf: -1 handled by the caller (solar.dat); 0 flat (1 W/m^2/um);
    1 (5S) / 2 (LOWTRAN7) / 3 (MODTRAN3) are distinct tables.
    """
    wl = np.asarray(wl_um, np.float64)
    if nf == 0:
        return np.ones_like(wl)
    if nf not in _DB_TSI:
        raise ValueError(f"unsupported solar database nf={nf}")
    twl, te = solar_table(nf)
    return np.interp(wl, twl, te, left=0.0, right=0.0)
