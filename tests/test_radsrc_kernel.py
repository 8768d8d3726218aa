"""Direct unit test of the fused radiance-source kernel (pallas/radsrc.py).

The kernel is pinned end-to-end through tests/test_radlane.py; this file
isolates it against an independent numpy evaluation of the same algebra
(USRINT source amplitudes x analytic path integrals — SURVEY.md section
3.2 step 6), so a regression localizes to the kernel instead of the whole
radiance pipeline.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sbdart_tpu.pallas.radsrc import rad_source_lane

_RES_EPS = 1e-5


def _int_toward_np(k, delta, u):
    return (1.0 - np.exp(-(k + 1.0 / u) * delta)) / (u * k + 1.0)


def _int_away_np(k, delta, u):
    e_u = np.exp(-delta / u)
    d = u * k - 1.0
    near = np.abs(d) < _RES_EPS
    safe = np.where(near, 1.0, d)
    exact = (e_u - np.exp(-k * delta)) / safe
    taylor = e_u * (delta / u) * (1.0 - d * delta / (2.0 * u))
    return np.where(near, taylor, exact)


def _reference(t1, t2, yu, c, y0d, gp, gm, kk, zp, zm, a, b,
               dtau, ebtop, mu0, scale, umu):
    """Straight numpy evaluation of the kernel's contract."""
    nm, nu, n, nstr = t1.shape
    lb = c.shape[-1]
    j = np.zeros((nm, nu, lb))
    for m in range(nm):
        mfac = 1.0 if m == 0 else 2.0
        e1 = np.einsum("uil,lB->uiB", t1[m], c)
        e2 = np.einsum("uil,lB->uiB", t2[m], c)
        sd = (np.einsum("uiB,ijB->ujB", e1, gp[m])
              + np.einsum("uiB,ijB->ujB", e2, gm[m]))
        su = (np.einsum("uiB,ijB->ujB", e1, gm[m])
              + np.einsum("uiB,ijB->ujB", e2, gp[m]))
        sz = (np.einsum("uiB,iB->uB", e1, zp[m])
              + np.einsum("uiB,iB->uB", e2, zm[m]))
        x0u = np.einsum("ul,lB->uB", yu[m], c * y0d[m])
        sz_tot = sz + x0u * (mfac * scale[0])[None, :]
        for ui, u in enumerate(umu):
            ua = abs(float(u))
            if u > 0:
                i_dn = _int_toward_np(kk[m], dtau[0], ua)
                i_up = _int_away_np(kk[m], dtau[0], ua)
                i_b = _int_toward_np(1.0 / mu0[0], dtau[0], ua)
            else:
                i_dn = _int_away_np(kk[m], dtau[0], ua)
                i_up = _int_toward_np(kk[m], dtau[0], ua)
                i_b = _int_away_np(1.0 / mu0[0], dtau[0], ua)
            j[m, ui] = (
                np.sum(a[m] * sd[ui] * i_dn, axis=0)
                + np.sum(b[m] * su[ui] * i_up, axis=0)
                + sz_tot[ui] * ebtop[0] * i_b
            )
    return j


def test_rad_source_kernel_matches_numpy():
    nm, nu, n, nstr, lb = 3, 4, 4, 8, 160
    rng = np.random.default_rng(9)
    t1 = rng.standard_normal((nm, nu, n, nstr)) * 0.2
    t2 = rng.standard_normal((nm, nu, n, nstr)) * 0.2
    yu = rng.standard_normal((nm, nu, nstr)) * 0.3
    c = rng.uniform(0.0, 0.4, (nstr, lb))
    y0d = rng.standard_normal((nm, nstr, lb)) * 0.3
    gp = rng.standard_normal((nm, n, n, lb)) * 0.3
    gm = rng.standard_normal((nm, n, n, lb)) * 0.3
    kk = rng.uniform(0.3, 5.0, (nm, n, lb))
    zp = rng.standard_normal((nm, n, lb)) * 0.3
    zm = rng.standard_normal((nm, n, lb)) * 0.3
    a = rng.standard_normal((nm, n, lb))
    b = rng.standard_normal((nm, n, lb))
    dtau = rng.uniform(0.01, 1.5, (1, lb))
    ebtop = rng.uniform(0.0, 1.0, (1, lb))
    mu0 = rng.uniform(0.2, 1.0, (1, lb))
    scale = rng.uniform(0.0, 0.2, (1, lb))
    # mixed-sign angles; include one near the u*k ~ 1 resonance range
    umu = np.array([0.2, 0.95, -0.4, -0.9])

    args_j = [jnp.asarray(x, jnp.float32) for x in
              (t1, t2, yu, c, y0d, gp, gm, kk, zp, zm, a, b,
               dtau, ebtop, mu0, scale)]
    j_k = np.asarray(rad_source_lane(*args_j, umu, interpret=True))
    j_ref = _reference(t1, t2, yu, c, y0d, gp, gm, kk, zp, zm, a, b,
                       dtau, ebtop, mu0, scale, umu)
    err = np.abs(j_k - j_ref).max() / max(np.abs(j_ref).max(), 1e-9)
    assert err < 1e-5, err


def test_lane_tile_always_128_aligned():
    """Every chosen lane tile must be a multiple of 128 (Mosaic rejects
    unaligned lane tiles — the round-2 trap).  LB in (128, tile_b) not a
    multiple of 128 (e.g. 288 = 32 layers x 9 band-columns) used to select
    tb = LB itself and fail to compile."""
    from sbdart_tpu.pallas.radsrc import _lane_tile

    for lb in (1, 64, 128, 130, 256, 288, 511, 512, 520, 4224, 8450, 16640):
        for tile_b in (128, 512, 2048):
            tb = _lane_tile(lb, tile_b)
            assert tb % 128 == 0, (lb, tile_b, tb)
            assert tb >= 128
            assert tb <= max(tile_b, 128)
    # divisor preference still holds where one exists
    assert _lane_tile(65 * 256, 512) == 256      # 16640 = 130 * 128 -> 256
    assert 65 * 256 % _lane_tile(65 * 256, 512) == 0
    assert 65 * 128 % _lane_tile(65 * 128, 512) == 0


def test_rad_source_kernel_pads_unaligned_lanes():
    """LB not a multiple of 128: the kernel pads internally and the result
    matches a direct run on the padded-free slice."""
    nm, nu, n, nstr = 2, 2, 4, 8
    rng = np.random.default_rng(10)

    def mk(lb):
        return [jnp.asarray(x, jnp.float32) for x in (
            rng.standard_normal((nm, nu, n, nstr)) * 0.2,
            rng.standard_normal((nm, nu, n, nstr)) * 0.2,
            rng.standard_normal((nm, nu, nstr)) * 0.3,
            rng.uniform(0.0, 0.4, (nstr, lb)),
            rng.standard_normal((nm, nstr, lb)) * 0.3,
            rng.standard_normal((nm, n, n, lb)) * 0.3,
            rng.standard_normal((nm, n, n, lb)) * 0.3,
            rng.uniform(0.3, 5.0, (nm, n, lb)),
            rng.standard_normal((nm, n, lb)) * 0.3,
            rng.standard_normal((nm, n, lb)) * 0.3,
            rng.standard_normal((nm, n, lb)),
            rng.standard_normal((nm, n, lb)),
            rng.uniform(0.01, 1.5, (1, lb)),
            rng.uniform(0.0, 1.0, (1, lb)),
            rng.uniform(0.2, 1.0, (1, lb)),
            rng.uniform(0.0, 0.2, (1, lb)),
        )]

    umu = np.array([0.5, -0.5])
    full = mk(200)                       # not a multiple of 128 -> pads
    j_full = np.asarray(rad_source_lane(*full, umu, interpret=True))
    sliced = [x[..., :130] if x.shape[-1] == 200 else x for x in full]
    j_part = np.asarray(rad_source_lane(*sliced, umu, interpret=True))
    np.testing.assert_allclose(j_part, j_full[..., :130], rtol=2e-6,
                               atol=1e-7)
