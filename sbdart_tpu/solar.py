"""Solar geometry and spectral weighting.

Replaces ZENSUN (reference component #8; Ricchiazzi's well-known ephemeris
routine) with the standard Spencer (1971) Fourier-series ephemeris —
declination, equation of time, and Earth–Sun distance factor — plus the
spectral machinery of spectra.f (solar irradiance selection and satellite
filter functions).
"""

from __future__ import annotations

import numpy as np

from sbdart_tpu.config import Config
from sbdart_tpu.data.solar import solar_irradiance


def zensun(iday: int, time_ut: float, alat: float, alon: float):
    """Solar zenith/azimuth [deg] and Earth–Sun distance factor.

    Args:
      iday: day of year (1..365).
      time_ut: UTC decimal hours.
      alat, alon: latitude/longitude [deg], east positive.

    Returns:
      (zenith_deg, azimuth_deg, solfac) with solfac = (r0/r)^2.
    """
    g = 2.0 * np.pi * (iday - 1 + (time_ut - 12.0) / 24.0) / 365.0
    # Spencer (1971): declination [rad]
    decl = (
        0.006918
        - 0.399912 * np.cos(g) + 0.070257 * np.sin(g)
        - 0.006758 * np.cos(2 * g) + 0.000907 * np.sin(2 * g)
        - 0.002697 * np.cos(3 * g) + 0.00148 * np.sin(3 * g)
    )
    # equation of time [minutes]
    eqt = 229.18 * (
        0.000075
        + 0.001868 * np.cos(g) - 0.032077 * np.sin(g)
        - 0.014615 * np.cos(2 * g) - 0.040849 * np.sin(2 * g)
    )
    # Earth-Sun distance factor (1/r^2 in AU)
    solfac = (
        1.000110
        + 0.034221 * np.cos(g) + 0.001280 * np.sin(g)
        + 0.000719 * np.cos(2 * g) + 0.000077 * np.sin(2 * g)
    )
    # hour angle [deg]: solar time = UTC + lon/15 + eqt/60
    tsolar = time_ut + alon / 15.0 + eqt / 60.0
    ha = np.deg2rad(15.0 * (tsolar - 12.0))
    lat = np.deg2rad(alat)
    cosz = np.sin(lat) * np.sin(decl) + np.cos(lat) * np.cos(decl) * np.cos(ha)
    zen = np.rad2deg(np.arccos(np.clip(cosz, -1.0, 1.0)))
    sinz = np.sqrt(max(1.0 - cosz**2, 1e-12))
    cosa = (np.sin(decl) - np.sin(lat) * cosz) / (np.cos(lat) * sinz)
    azi = np.rad2deg(np.arccos(np.clip(cosa, -1.0, 1.0)))
    if np.sin(ha) > 0:
        azi = 360.0 - azi
    return float(zen), float(azi), float(solfac)


def solar_geometry(cfg: Config) -> tuple[float, float]:
    """Resolve (cos_sza, solfac) from the namelist parameters.

    Priority (sbdart.f): csza >= 0 wins; else iday > 0 invokes the ephemeris;
    else sza is used directly.  solfac multiplies the beam irradiance.
    """
    solfac = cfg.solfac
    if cfg.csza >= 0.0:
        return max(cfg.csza, 1e-6), solfac
    if cfg.iday > 0:
        zen, _azi, sf = zensun(cfg.iday, cfg.time, cfg.alat, cfg.alon)
        return max(np.cos(np.deg2rad(zen)), 1e-6), solfac * sf
    return max(np.cos(np.deg2rad(cfg.sza)), 1e-6), solfac


# --------------------------------------------------------------------------
# Satellite filter functions (spectra.f:FILTER equivalent)
# --------------------------------------------------------------------------

# Built-in approximate channel response curves (isat > 0): (center, width)
# of near-rectangular response with cosine-tapered edges [um].
_BUILTIN_FILTERS = {
    1: (0.55, 0.30, "METEOSAT vis"),
    2: (0.59, 0.16, "GOES-E vis"),
    3: (0.61, 0.19, "GOES-W vis"),
    4: (0.63, 0.10, "AVHRR ch1"),
    5: (0.86, 0.28, "AVHRR ch2"),
    6: (0.65, 0.17, "GTR-100 vis"),
}


def filter_function(
    cfg: Config,
    wl_um: np.ndarray,
    user_table: tuple[np.ndarray, np.ndarray] | None = None,
) -> np.ndarray:
    """Spectral filter weight in [0, 1] at wl_um."""
    wl = np.asarray(wl_um, np.float64)
    if cfg.isat == 0:
        return np.ones_like(wl)
    if cfg.isat == -1:
        if user_table is None:
            d = np.loadtxt("filter.dat")
            user_table = (d[:, 0], d[:, 1])
        return np.interp(wl, user_table[0], user_table[1], left=0.0, right=0.0)
    if cfg.isat in _BUILTIN_FILTERS:
        c, wdt, _name = _BUILTIN_FILTERS[cfg.isat]
        x = (wl - c) / (wdt / 2.0)
        resp = np.where(np.abs(x) <= 0.8, 1.0, 0.0)
        edge = (np.abs(x) > 0.8) & (np.abs(x) < 1.2)
        resp = np.where(edge, 0.5 * (1 + np.cos(np.pi * (np.abs(x) - 0.8) / 0.4)), resp)
        return resp
    raise ValueError(f"unsupported isat={cfg.isat}")


def spectral_grid(cfg: Config) -> np.ndarray:
    """Wavelength sample points [um] for the spectral loop.

    wlinc semantics (rt.doc): 0 -> default step (0.005 um below 2 um, else
    the k-band grid); > 0 -> step in um; in (-1, 0) -> |wlinc| step in
    wavenumber-equivalent; < -1 -> constant resolving power |wlinc|.
    """
    lo, hi = cfg.wlinf, cfg.wlsup
    if hi <= lo:
        return np.array([lo])
    if cfg.wlinc > 0:
        n = int(np.floor((hi - lo) / cfg.wlinc + 1.5))
        return lo + cfg.wlinc * np.arange(n)
    if cfg.wlinc <= -1:
        # step of |wlinc| in wavenumber [cm^-1]: nu grid descending
        dnu = abs(cfg.wlinc)
        nu_hi, nu_lo = 1e4 / lo, 1e4 / hi
        n = int(np.floor((nu_hi - nu_lo) / dnu + 1.5))
        return 1e4 / (nu_hi - dnu * np.arange(n))
    if cfg.wlinc < 0:
        # -1 < wlinc < 0: constant resolving power, dlam = |wlinc| * lam
        r = 1.0 / abs(cfg.wlinc)
        n = int(np.ceil(np.log(hi / lo) / np.log1p(1.0 / r))) + 1
        return lo * (1.0 + 1.0 / r) ** np.arange(n)
    # default: 0.005 um in the SW, 20 cm^-1-equivalent in the IR
    if hi <= 2.0:
        step = 0.005
        n = int(np.floor((hi - lo) / step + 1.5))
        return lo + step * np.arange(n)
    nu_hi, nu_lo = 1e4 / lo, 1e4 / hi
    dnu = 20.0
    n = int(np.floor((nu_hi - nu_lo) / dnu + 1.5))
    return np.sort(1e4 / (nu_hi - dnu * np.arange(n)))


__all__ = [
    "zensun",
    "solar_geometry",
    "solar_irradiance",
    "filter_function",
    "spectral_grid",
]
