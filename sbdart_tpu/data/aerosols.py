"""Aerosol optical models.

Replaces the 5S/LOWTRAN aerosol tables of tauaero.f (reference component
#5).  REGENERATED (see data/__init__.py): spectral extinction (relative to
0.55 um), single-scatter albedo and asymmetry for the four boundary-layer
models (rural, urban, oceanic, tropospheric) at a set of relative
humidities, plus the four stratospheric models (background, aged volcanic,
fresh volcanic, meteoric dust).  Shapes follow the published Shettle–Fenn /
5S behavior; values are representative, not the reference's tables.
"""

from __future__ import annotations

import numpy as np

WL = np.array([0.25, 0.3, 0.4, 0.55, 0.7, 1.0, 1.5, 2.0, 3.0, 4.0, 10.0, 40.0])
RH_GRID = np.array([0.0, 50.0, 70.0, 80.0, 90.0, 95.0, 98.0, 99.0])

# BL models at RH=70: (angstrom alpha, w0(0.55), g(0.55), spectral slopes)
_BL_BASE = {
    1: dict(alpha=1.10, w0=0.941, g=0.647, name="rural"),
    2: dict(alpha=1.00, w0=0.647, g=0.608, name="urban"),
    3: dict(alpha=0.15, w0=0.998, g=0.772, name="oceanic"),
    4: dict(alpha=1.20, w0=0.960, g=0.630, name="tropospheric"),
}

# hygroscopic growth of extinction: ext(RH)/ext(dry) (Hanel-type)
_GROWTH_GAMMA = {1: 0.35, 2: 0.30, 3: 0.55, 4: 0.35}


def bl_model(iaer: int, wl_um: np.ndarray, rh: float):
    """(ext_rel, w0, g) for boundary-layer model `iaer` at humidity rh [%].

    ext_rel is extinction relative to its 0.55 um value at the same rh.
    """
    if iaer not in _BL_BASE:
        raise ValueError(f"unknown BL aerosol model {iaer}")
    wl = np.asarray(wl_um, np.float64)
    base = _BL_BASE[iaer]
    rhc = np.clip(rh, 0.0, 99.0)
    grow = (1.0 - rhc / 100.0) ** (-_GROWTH_GAMMA[iaer])
    grow70 = (1.0 - 0.70) ** (-_GROWTH_GAMMA[iaer])
    # humidified particles are bigger: alpha drops, w0/g rise slightly
    f = np.log(grow / grow70 + 1e-12)
    alpha = base["alpha"] - 0.25 * f
    w0 = np.clip(base["w0"] + 0.05 * f, 0.3, 0.9999)
    g = np.clip(base["g"] + 0.06 * f, 0.4, 0.9)
    ext_rel = (wl / 0.55) ** (-alpha)
    # flatten spectral slope in the IR (coarse-mode floor)
    ext_rel = np.maximum(ext_rel, 0.08 * (wl / 0.55) ** -0.3)
    w0_spec = w0 * np.exp(-np.clip(wl - 2.5, 0, None) * 0.25)
    w0_spec = np.clip(w0_spec, 0.2, 0.9999)
    g_spec = np.clip(g + 0.03 * np.log(np.maximum(wl / 0.55, 0.3)), 0.3, 0.95)
    return ext_rel, w0_spec, g_spec


# stratospheric models: (alpha, w0, g)
_STRAT = {
    1: dict(alpha=1.4, w0=0.999, g=0.70, name="background"),
    2: dict(alpha=0.5, w0=0.990, g=0.73, name="aged volcanic"),
    3: dict(alpha=0.0, w0=0.950, g=0.78, name="fresh volcanic"),
    4: dict(alpha=-0.2, w0=0.650, g=0.80, name="meteoric dust"),
}

# default layer center altitudes [km] for the 5 stratospheric slots when
# zaer is not given (SBDART: jaer slots at ~20, 25, 30, 35, 40 km bands)
STRAT_DEFAULT_Z = [20.0, 25.0, 30.0, 35.0, 40.0]


def strat_model(jaer: int, wl_um: np.ndarray):
    """(ext_rel, w0, g) for stratospheric model jaer (1..4)."""
    if jaer not in _STRAT:
        raise ValueError(f"unknown stratospheric aerosol model {jaer}")
    wl = np.asarray(wl_um, np.float64)
    m = _STRAT[jaer]
    ext_rel = (wl / 0.55) ** (-m["alpha"])
    w0 = np.full_like(wl, m["w0"]) * np.exp(-np.clip(wl - 3.0, 0, None) * 0.15)
    w0 = np.clip(w0, 0.2, 0.9999)
    g = np.full_like(wl, m["g"])
    return ext_rel, w0, g
