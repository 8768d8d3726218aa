"""Mie scattering: cloud-droplet optical property tables.

Replaces the precomputed Mie tables of taucloud.f (reference component #4).
REGENERATED from first principles (see data/__init__.py): Bohren & Huffman
Mie coefficients a_n, b_n (logarithmic-derivative downward recurrence) give
Q_ext, Q_sca, and the asymmetry parameter g via the Wiscombe series — no
angular grids needed — integrated over a gamma size distribution
(effective variance 0.11) on an effective-radius x wavelength grid.

The reference (and this framework, with the default imomc=3) represents the
cloud phase function as Henyey–Greenstein from g, so (k_ext per LWP, w0, g)
is the complete table.  Tables are generated once and cached to
`mie_tables.npz` next to this module (committed for determinism).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from sbdart_tpu.data.refractive import ice_index, water_index

RE_GRID = np.array(
    [2.0, 3.0, 4.0, 6.0, 8.0, 10.0, 12.0, 16.0, 20.0, 24.0, 32.0, 48.0,
     64.0, 96.0, 128.0]
)
WL_GRID = np.concatenate([
    np.geomspace(0.25, 4.0, 44), np.geomspace(4.3, 100.0, 24),
])
VEFF = 0.11          # gamma-distribution effective variance
_NPZ = os.path.join(os.path.dirname(__file__), "mie_tables.npz")


def mie_batch(x: np.ndarray, m: complex):
    """Batched Mie efficiencies: Q_ext, Q_sca, g for an array of size
    parameters `x` sharing one refractive index `m`.

    The three sequential recurrences (log-derivative D_n downward,
    Riccati–Bessel psi/chi upward) run to the largest x's term count with
    per-x masking of the partial sums; overflow in the masked beyond-cutoff
    region is harmless (masked before summation).
    """
    x = np.asarray(x, np.float64)
    nmax_each = (x + 4.05 * np.cbrt(x) + 2.0).astype(int)
    nmax = int(nmax_each.max())
    nmx = nmax + 16
    mx = m * x

    with np.errstate(all="ignore"):
        d = np.zeros_like(mx)          # D_nmx
        dstack = np.empty((nmax + 1,) + x.shape, complex)
        for n in range(nmx, 0, -1):
            if n <= nmax:
                dstack[n] = d          # D_n (before stepping to D_{n-1})
            d = n / mx - 1.0 / (d + n / mx)
        # psi/chi upward
        pa, pb = np.cos(x), np.sin(x)       # psi_{-1}, psi_0
        ca, cb = -np.sin(x), np.cos(x)
        qext = np.zeros_like(x)
        qsca = np.zeros_like(x)
        gsum = np.zeros_like(x)
        absum = np.zeros_like(x)
        an_prev = np.zeros_like(mx)
        bn_prev = np.zeros_like(mx)
        for n in range(1, nmax + 1):
            pn = (2 * n - 1) / x * pb - pa
            cn = (2 * n - 1) / x * cb - ca
            psi_n, psi_nm1 = pn, pb
            xi_n = pn - 1j * cn
            xi_nm1 = pb - 1j * cb
            dn = dstack[n]
            fa = dn / m + n / x
            fb = dn * m + n / x
            an = (fa * psi_n - psi_nm1) / (fa * xi_n - xi_nm1)
            bn = (fb * psi_n - psi_nm1) / (fb * xi_n - xi_nm1)
            live = n <= nmax_each
            an = np.where(live & np.isfinite(an), an, 0.0)
            bn = np.where(live & np.isfinite(bn), bn, 0.0)
            qext += (2 * n + 1) * (an.real + bn.real)
            qsca += (2 * n + 1) * (np.abs(an) ** 2 + np.abs(bn) ** 2)
            absum += (2 * n + 1) / (n * (n + 1.0)) * (an * np.conj(bn)).real
            if n > 1:
                nm = n - 1
                gsum += (
                    nm * (nm + 2.0) / (nm + 1.0)
                    * (an_prev * np.conj(an) + bn_prev * np.conj(bn)).real
                )
            an_prev, bn_prev = an, bn
            pa, pb = pb, pn
            ca, cb = cb, cn

    x2 = np.maximum(x, 1e-12) ** 2
    qe = 2.0 / x2 * qext
    qs = 2.0 / x2 * qsca
    g = np.where(qs > 0, 4.0 / x2 * (gsum + absum) / np.maximum(qs, 1e-300), 0.0)
    return qe, qs, g


def mie_q_and_g(x: float, m: complex) -> tuple[float, float, float]:
    """Single-sphere convenience wrapper around mie_batch."""
    if x <= 0:
        return 0.0, 0.0, 0.0
    qe, qs, g = mie_batch(np.array([x]), m)
    return float(qe[0]), float(qs[0]), float(g[0])


def gamma_quadrature(re: float, veff: float = VEFF, nr: int = 32):
    """Radius nodes/weights (area-weighted use later) for a gamma
    distribution n(r) ~ r^((1-3v)/v) exp(-r/(re v))."""
    alpha = (1.0 - 3.0 * veff) / veff
    scale = re * veff
    # sample where the area-weighted density r^2 n(r) has mass
    lo = max(re * 0.02, 0.02)
    hi = re * (1.0 + 8.0 * np.sqrt(veff))
    r = np.linspace(lo, hi, nr)
    w = r ** alpha * np.exp(-r / scale)
    w /= np.trapezoid(w, r)
    return r, w


def droplet_properties(re: float, wl: float, m: complex):
    """Distribution-averaged (k_ext [m^2/g LWP], w0, g) at one (re, wl)."""
    r, w = gamma_quadrature(re)
    x = 2.0 * np.pi * r / wl
    qe, qs, gg = mie_batch(x, m)
    a2 = w * r**2
    ext = np.trapezoid(qe * a2, r)
    sca = np.trapezoid(qs * a2, r)
    gsc = np.trapezoid(gg * qs * a2, r)
    vol = np.trapezoid(w * r**3, r)
    k_ext = 0.75 * ext / vol          # m^2/g for water density 1 g/cm^3
    w0 = sca / ext if ext > 0 else 0.0
    g = gsc / sca if sca > 0 else 0.0
    return k_ext, w0, g


def generate_tables(progress: bool = False) -> dict:
    """Build the full (phase x re x wl) tables for water and ice."""
    out = {}
    for phase, indexer in (("water", water_index), ("ice", ice_index)):
        ke = np.zeros((len(RE_GRID), len(WL_GRID)))
        w0 = np.zeros_like(ke)
        gg = np.zeros_like(ke)
        midx = indexer(WL_GRID)
        for i, re in enumerate(RE_GRID):
            for j, wl in enumerate(WL_GRID):
                ke[i, j], w0[i, j], gg[i, j] = droplet_properties(
                    re, wl, complex(midx[j])
                )
            if progress:
                print(f"{phase} re={re}", flush=True)
        out[f"{phase}_kext"] = ke
        out[f"{phase}_w0"] = w0
        out[f"{phase}_g"] = gg
    out["re"] = RE_GRID
    out["wl"] = WL_GRID
    return out


@functools.lru_cache(maxsize=1)
def tables() -> dict:
    if os.path.exists(_NPZ):
        with np.load(_NPZ) as z:
            return {k: z[k] for k in z.files}
    t = generate_tables()
    np.savez_compressed(_NPZ, **t)
    return t


def cloud_properties(re, wl_um, phase: str = "water"):
    """Bilinear-in-log interpolation of (k_ext, w0, g) at (re, wl).

    re, wl_um broadcast; returns (k_ext [m^2/g], w0, g).
    """
    t = tables()
    lre = np.log(np.clip(np.asarray(re, np.float64), RE_GRID[0], RE_GRID[-1]))
    lwl = np.log(np.clip(np.asarray(wl_um, np.float64), WL_GRID[0], WL_GRID[-1]))
    gr = np.log(t["re"])
    gw = np.log(t["wl"])
    i = np.clip(np.searchsorted(gr, lre) - 1, 0, len(gr) - 2)
    j = np.clip(np.searchsorted(gw, lwl) - 1, 0, len(gw) - 2)
    fr = (lre - gr[i]) / (gr[i + 1] - gr[i])
    fw = (lwl - gw[j]) / (gw[j + 1] - gw[j])

    def bilin(a):
        return (
            a[i, j] * (1 - fr) * (1 - fw)
            + a[i + 1, j] * fr * (1 - fw)
            + a[i, j + 1] * (1 - fr) * fw
            + a[i + 1, j + 1] * fr * fw
        )

    return (
        bilin(t[f"{phase}_kext"]),
        bilin(t[f"{phase}_w0"]),
        bilin(t[f"{phase}_g"]),
    )
