"""The six built-in model atmospheres.

Replaces atms.f (reference component #2, SURVEY.md section 3): the
McClatchey et al. (1972) / AFGL model atmospheres on the standard 33-level
grid (0–25 km by 1 km, then 30, 35, 40, 45, 50, 70, 100 km), providing
z [km], p [mb], T [K], water-vapor density [g/m^3] and ozone density
[g/m^3], plus uniformly-mixed trace-gas volume mixing ratios.

Provenance: idatm=6 uses the TRANSCRIBED U.S. Standard Atmosphere 1976
z/T/p table (US76_TABLE below — internally hydrostatic to < 2e-4 below
20 km, the transcription check).  The other five are REGENERATED (see
data/__init__.py): temperature structures from the published breakpoint
climatologies, pressure by hydrostatic integration, vapor/ozone from the
published surface values, scale heights, and column amounts — accurate to
a few percent against the published tables; swap in the reference DATA
blocks for bit parity.

idatm codes (sbdart.f convention): 1 tropical, 2 midlatitude summer,
3 midlatitude winter, 4 subarctic summer, 5 subarctic winter, 6 US-1962
standard.
"""

from __future__ import annotations

import functools

import numpy as np

from sbdart_tpu.constants import AIR_MOLAR_MASS, GRAVITY

# standard 33-level altitude grid [km]
Z33 = np.array(
    [float(i) for i in range(26)] + [30.0, 35.0, 40.0, 45.0, 50.0, 70.0, 100.0]
)

# Temperature breakpoints (z [km], T [K]) per atmosphere — piecewise linear.
# From the McClatchey/AFGL climatologies (approximate).
_T_BREAKS = {
    1: [(0, 299.7), (17, 195.0), (25, 221.0), (47, 270.0), (51, 270.0),
        (70, 219.0), (100, 210.0)],                        # tropical
    2: [(0, 294.0), (13, 215.8), (17, 215.8), (25, 225.0), (47, 275.0),
        (51, 275.0), (70, 218.0), (100, 210.0)],           # midlat summer
    3: [(0, 272.2), (10, 218.0), (25, 218.0), (47, 265.0), (51, 265.0),
        (70, 230.0), (100, 210.0)],                        # midlat winter
    4: [(0, 287.0), (10, 225.0), (25, 225.0), (47, 277.0), (51, 277.0),
        (70, 216.0), (100, 210.0)],                        # subarctic summer
    5: [(0, 257.1), (9, 217.2), (25, 217.2), (47, 262.0), (51, 262.0),
        (70, 233.0), (100, 210.0)],                        # subarctic winter
    6: [(0, 288.1), (11, 216.7), (20, 216.7), (32, 228.5), (47, 270.6),
        (51, 270.6), (71, 214.0), (100, 210.0)],           # US standard 1962
}

# surface pressure [mb]
_P_SURF = {1: 1013.0, 2: 1013.0, 3: 1018.0, 4: 1010.0, 5: 1013.0, 6: 1013.25}

# water vapor: surface density [g/m^3], scale height [km], column [g/cm^2]
_H2O = {
    1: (19.0, 2.0, 4.12),
    2: (14.0, 2.1, 2.92),
    3: (3.5, 1.9, 0.85),
    4: (9.1, 2.1, 2.09),
    5: (1.2, 1.8, 0.42),
    6: (5.9, 2.0, 1.42),
}

# ozone: total column [atm-cm], peak altitude [km], peak width [km]
_O3 = {
    1: (0.247, 25.0, 6.5),
    2: (0.331, 23.0, 6.0),
    3: (0.376, 20.0, 6.5),
    4: (0.344, 21.0, 6.0),
    5: (0.480, 18.0, 7.0),
    6: (0.349, 22.5, 6.3),
}

# Uniformly mixed gas default volume mixing ratios (ppv).  SBDART's defaults
# (rt.doc; xco2 etc. scale these).
MIXING_RATIOS = {
    "n2": 0.781,
    "o2": 0.209,
    "co2": 360.0e-6,
    "ch4": 1.74e-6,
    "n2o": 0.32e-6,
    "co": 0.15e-6,
    "no2": 2.3e-11,
    "so2": 3.0e-10,
    "nh3": 5.0e-10,
    "no": 3.0e-10,
    "hno3": 5.0e-11,
}

O3_DENSITY_STP = 2.1415e-2  # g/cm^3 of pure ozone at STP (for atm-cm conversion)

# ---------------------------------------------------------------------------
# TRANSCRIBED PUBLISHED TABLE (round 4): U.S. Standard Atmosphere 1976
# (NOAA/NASA/USAF, 1976) — z [km], T [K], p [mb] at the 33-level grid.
# idatm=6 (the reference's US-1962 selection) uses these in place of the
# breakpoint-regenerated profile: USSA-1962 and -1976 are identical below
# 50 km to the digits printed here.  tests/test_physics_setup.py pins a
# sample of the table.
# ---------------------------------------------------------------------------
US76_TABLE = np.array([
    # z      T [K]     p [mb]
    [0.0,  288.15, 1013.25],
    [1.0,  281.65,  898.76],
    [2.0,  275.15,  795.01],
    [3.0,  268.66,  701.21],
    [4.0,  262.17,  616.60],
    [5.0,  255.68,  540.48],
    [6.0,  249.19,  472.17],
    [7.0,  242.70,  411.05],
    [8.0,  236.21,  356.51],
    [9.0,  229.73,  308.00],
    [10.0, 223.25,  264.99],
    [11.0, 216.77,  226.99],
    [12.0, 216.65,  193.99],
    [13.0, 216.65,  165.79],
    [14.0, 216.65,  141.70],
    [15.0, 216.65,  121.11],
    [16.0, 216.65,  103.52],
    [17.0, 216.65,   88.497],
    [18.0, 216.65,   75.652],
    [19.0, 216.65,   64.674],
    [20.0, 216.65,   55.293],
    [21.0, 217.58,   47.289],
    [22.0, 218.57,   40.475],
    [23.0, 219.57,   34.668],
    [24.0, 220.56,   29.717],
    [25.0, 221.55,   25.492],
    [30.0, 226.51,   11.970],
    [35.0, 236.51,    5.746],
    [40.0, 250.35,    2.871],
    [45.0, 264.16,    1.491],
    [50.0, 270.65,    0.79779],
    [70.0, 219.59,    0.052209],
    [100.0, 195.08,   0.00032011],
])


def _temperature(idatm: int, z: np.ndarray) -> np.ndarray:
    br = np.array(_T_BREAKS[idatm])
    return np.interp(z, br[:, 0], br[:, 1])


def _pressure(z: np.ndarray, t: np.ndarray, p0: float) -> np.ndarray:
    """Hydrostatic integration dln(p)/dz = -g M / (R T) on a fine grid."""
    rd = 8.31446 / (AIR_MOLAR_MASS * 1e-3)   # J/(kg K)
    zf = np.linspace(z[0], z[-1], 4001)
    tf = np.interp(zf, z, t)
    integ = np.concatenate(
        [[0.0], np.cumsum(
            0.5 * (1.0 / tf[1:] + 1.0 / tf[:-1]) * np.diff(zf) * 1e3
        )]
    )
    lnp = np.log(p0) - (GRAVITY / rd) * integ
    return np.exp(np.interp(z, zf, lnp))


def _h2o_density(idatm: int, z: np.ndarray) -> np.ndarray:
    rho0, hs, col = _H2O[idatm]
    rho = rho0 * np.exp(-z / hs)
    rho[z > 15] = np.minimum(rho[z > 15], 1e-3 * np.exp(-(z[z > 15] - 15) / 7))
    # normalize to the published column (g/cm^2): integral rho dz
    c = np.trapezoid(rho, z * 1e5) * 1e-6  # g/m^3 * cm -> g/cm^2 (1e-6 m^3/cm^3)
    return rho * (col / c)


def _o3_density(idatm: int, z: np.ndarray) -> np.ndarray:
    col_atmcm, zpk, wid = _O3[idatm]
    # Chapman-layer-like shape plus small tropospheric floor
    x = (z - zpk) / wid
    rho = np.exp(1.0 - x - np.exp(-x))
    rho += 0.02 * np.exp(-z / 4.0)
    c_atmcm = np.trapezoid(rho, z * 1e5) * 1e-6 / O3_DENSITY_STP
    return rho * (col_atmcm / c_atmcm)   # g/m^3


@functools.lru_cache(maxsize=None)
def model_atmosphere(idatm: int) -> dict:
    """Return dict(z[km], p[mb], t[K], wh[g/m^3], wo[g/m^3]) on 33 levels,
    ordered surface -> top? No: TOA-first like atms.dat (z descending? )

    Convention: levels ordered top-of-atmosphere first (z descending), the
    same as SBDART's internal ordering (atms.f stores TOA-first).
    """
    if idatm not in _T_BREAKS:
        raise ValueError(f"idatm must be 1..6, got {idatm}")
    z = Z33
    if idatm == 6:
        # transcribed USSA-1976 table (identical to US-1962 below 50 km)
        assert np.allclose(US76_TABLE[:, 0], z)
        t = US76_TABLE[:, 1].copy()
        p = US76_TABLE[:, 2].copy()
    else:
        t = _temperature(idatm, z)
        p = _pressure(z, t, _P_SURF[idatm])
    wh = _h2o_density(idatm, z)
    wo = _o3_density(idatm, z)
    order = np.argsort(z)[::-1]
    return {
        "z": z[order].copy(),
        "p": p[order].copy(),
        "t": t[order].copy(),
        "wh": wh[order].copy(),
        "wo": wo[order].copy(),
    }
