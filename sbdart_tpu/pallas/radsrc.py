"""Fused radiance source-function kernel (USRINT projections, per mode).

Computes, for every (azimuth mode, layer, column) lane and every static
user view angle u, the per-layer path-integrated source

    j[u] = sum_j a_j sd(u, j) I_dn(u, k_j) + sum_j b_j su(u, j) I_up(u, k_j)
           + sz_tot(u) * expbea_top * I_beam(u)

where sd/su are the eigenmode source amplitudes projected to user angles
through the static Legendre tables, sz_tot the beam multiple+pseudo source,
and I_* the analytic per-layer path integrals (solver/radiance.py's
_int_toward/_int_away, inlined resonance-safe).

Why a kernel: the same algebra as XLA einsums costs ~28 ms at the
(nstr=16, 65-layer, 256-column) radiance bench shape — the essential work
is ~0.4 GFLOP and ~220 MB of HBM interface traffic (sub-ms at roofline),
but XLA materializes the [U, N, mode, layer, column] intermediates between
loop fusions.  Here one kernel program holds a lane tile of every operand
in VMEM and the intermediates never touch HBM.

Layout: lane = flattened (layer, column) = LB, with the mode axis as a
grid dimension so the per-mode static tables arrive as indexed VMEM blocks
(t1/t2/yu below) — mode-dependent constants without gathers.  Operand
layout [*, M, LB] matches a free reshape of the eig kernel's flat
(M, L, Bc) lane output, so no relayout sits between the two kernels.

Reference map: the per-mode source setup inside disort.f:USRINT (SURVEY.md
section 3.2 step 6).  Equivalence vs the XLA path is pinned by
tests/test_radlane.py (interpret + compiled TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RES_EPS = 1e-5


def _int_toward(k, delta, inv_u):
    """int of decay toward the path start; u = 1/inv_u static or traced."""
    return (1.0 - jnp.exp(-(k + inv_u) * delta)) / (k / inv_u + 1.0)


def _int_away(k, delta, u):
    """Resonance-safe 'away' integral; u a python float."""
    e_u = jnp.exp(-delta / u)
    d = u * k - 1.0
    near = jnp.abs(d) < _RES_EPS
    safe = jnp.where(near, 1.0, d)
    exact = (e_u - jnp.exp(-k * delta)) / safe
    taylor = e_u * (delta / u) * (1.0 - d * delta / (2.0 * u))
    return jnp.where(near, taylor, exact)


def _kernel(u_vals, nstr, t1_ref, t2_ref, yu_ref, c_ref, y0d_ref, gp_ref,
            gm_ref, kk_ref, zp_ref, zm_ref, a_ref, b_ref, dtau_ref,
            ebtop_ref, mu0_ref, scale_ref, j_ref):
    n = gp_ref.shape[1]
    nu = len(u_vals)

    c = c_ref[...]                        # [nstr, TB]
    gp = gp_ref[0]                        # [N, N, TB]
    gm = gm_ref[0]
    kk = kk_ref[0]                        # [N, TB]
    zp = zp_ref[0]
    zm = zm_ref[0]
    a = a_ref[0]
    b = b_ref[0]
    dtau = dtau_ref[0]                    # [TB]
    ebtop = ebtop_ref[0]
    mu0 = mu0_ref[0]
    scale = scale_ref[0]
    y0d = y0d_ref[0]                      # [nstr, TB]

    # mfac = 2 - delta_m0 from the mode grid index
    m_idx = pl.program_id(0)
    mfac = jnp.where(m_idx == 0, 1.0, 2.0).astype(c.dtype)

    # e1[u, i] = sum_l T1[u, i, l] c_l ;  e2 likewise (T2 = T1 parity)
    e1 = None
    e2 = None
    for l in range(nstr):
        t1_l = t1_ref[0, :, :, l]         # [U, N]
        t2_l = t2_ref[0, :, :, l]
        term1 = t1_l[:, :, None] * c[l][None, None, :]
        term2 = t2_l[:, :, None] * c[l][None, None, :]
        e1 = term1 if e1 is None else e1 + term1
        e2 = term2 if e2 is None else e2 + term2
    # sd[u, j] = sum_i e1[u, i] gp[i, j] + e2[u, i] gm[i, j]
    sd = jnp.sum(e1[:, :, None, :] * gp[None, :, :, :], axis=1) \
        + jnp.sum(e2[:, :, None, :] * gm[None, :, :, :], axis=1)
    su = jnp.sum(e1[:, :, None, :] * gm[None, :, :, :], axis=1) \
        + jnp.sum(e2[:, :, None, :] * gp[None, :, :, :], axis=1)
    # sz[u] = sum_i e1[u, i] zp_i + e2[u, i] zm_i
    sz = jnp.sum(e1 * zp[None, :, :], axis=1) \
        + jnp.sum(e2 * zm[None, :, :], axis=1)
    # x0u[u] = sum_l YU[u, l] (c_l y0d_l)
    x0u = None
    for l in range(nstr):
        t = yu_ref[0, :, l][:, None] * (c[l] * y0d[l])[None, :]
        x0u = t if x0u is None else x0u + t
    sz_tot = sz + x0u * (mfac * scale)[None, :]        # [U, TB]

    inv_mu0 = 1.0 / mu0

    rows = []
    for ui, u in enumerate(u_vals):
        ua = abs(float(u))
        inv_ua = 1.0 / ua
        if u > 0:                         # upward-looking
            int_dn = _int_toward(kk, dtau[None, :], inv_ua)
            int_up = _int_away(kk, dtau[None, :], ua)
            int_beam = _int_toward(inv_mu0, dtau, inv_ua)
        else:                             # downward-looking
            int_dn = _int_away(kk, dtau[None, :], ua)
            int_up = _int_toward(kk, dtau[None, :], inv_ua)
            int_beam = _int_away(inv_mu0, dtau, ua)
        j_u = (
            jnp.sum(a * sd[ui] * int_dn, axis=0)
            + jnp.sum(b * su[ui] * int_up, axis=0)
            + sz_tot[ui] * ebtop * int_beam
        )                                 # [TB]
        rows.append(j_u)
    j_ref[0] = jnp.stack(rows, axis=0)    # [U, TB]


def _lane_tile(lb: int, tile_b: int) -> int:
    """128-aligned lane tile for a flat LB lane axis.

    Mosaic rejects lane tiles that are not 128-aligned (the round-2 trap
    blocktri.py:_tile_for_vmem documents), so round DOWN to a 128 multiple
    before anything else — an LB in (128, tile_b) not itself a multiple of
    128 (e.g. 32 layers x 9 band-columns = 288) must tile at 256 + pad,
    never at LB itself.  Then prefer a tile that divides LB exactly
    (LB = nlyr * columns often has a 128-multiple divisor, e.g. 65*256 =
    128*130): padding 12 operands costs ~0.5 ms at the bench shape for
    nothing.
    """
    tb = min(tile_b, max(128, (lb // 128) * 128))
    if lb % tb:
        for cand in range(tb, 127, -128):
            if lb % cand == 0:
                tb = cand
                break
    return tb


@functools.partial(
    jax.jit,
    static_argnames=("u_vals", "tile_b", "interpret"),
)
def _rad_source_call(t1, t2, yu, c, y0d, gp, gm, kk, zp, zm, a, b,
                     dtau, ebtop, mu0, scale, *, u_vals, tile_b, interpret):
    nm, nu, n, nstr = t1.shape
    lb = c.shape[-1]
    dtype = c.dtype

    tb = _lane_tile(lb, tile_b)
    pad = (-lb) % tb
    if pad:
        pad2 = [(0, 0), (0, pad)]
        pad3 = [(0, 0), (0, 0), (0, pad)]
        pad4 = [(0, 0), (0, 0), (0, 0), (0, pad)]
        c = jnp.pad(c, pad2)
        y0d = jnp.pad(y0d, pad3)
        gp = jnp.pad(gp, pad4)
        gm = jnp.pad(gm, pad4)
        kk = jnp.pad(kk, pad3, constant_values=1.0)
        zp = jnp.pad(zp, pad3)
        zm = jnp.pad(zm, pad3)
        a = jnp.pad(a, pad3)
        b = jnp.pad(b, pad3)
        dtau = jnp.pad(dtau, pad2, constant_values=0.1)
        ebtop = jnp.pad(ebtop, pad2)
        mu0 = jnp.pad(mu0, pad2, constant_values=0.5)
        scale = jnp.pad(scale, pad2)
    lbp = lb + pad
    grid = (nm, lbp // tb)

    def tab4(shape):
        return pl.BlockSpec(shape, lambda m, t: (m, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    lane2 = pl.BlockSpec((nstr, tb), lambda m, t: (0, t),
                         memory_space=pltpu.VMEM)
    row2 = pl.BlockSpec((1, tb), lambda m, t: (0, t),
                        memory_space=pltpu.VMEM)
    mode3 = lambda d: pl.BlockSpec((1, d, tb), lambda m, t: (m, 0, t),
                                   memory_space=pltpu.VMEM)
    mode4 = pl.BlockSpec((1, n, n, tb), lambda m, t: (m, 0, 0, t),
                         memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        j = pl.pallas_call(
            functools.partial(_kernel, u_vals, nstr),
            grid=grid,
            in_specs=[
                tab4((1, nu, n, nstr)),      # t1
                tab4((1, nu, n, nstr)),      # t2
                pl.BlockSpec((1, nu, nstr), lambda m, t: (m, 0, 0),
                             memory_space=pltpu.VMEM),   # yu
                lane2,                        # c
                mode3(nstr),                  # y0d
                mode4, mode4,                 # gp, gm
                mode3(n), mode3(n), mode3(n), # kk, zp, zm
                mode3(n), mode3(n),           # a, b
                row2, row2, row2, row2,       # dtau, ebtop, mu0, scale
            ],
            out_specs=pl.BlockSpec((1, nu, tb), lambda m, t: (m, 0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nm, nu, lbp), dtype),
            interpret=interpret,
        )(t1, t2, yu, c, y0d, gp, gm, kk, zp, zm, a, b,
          dtau, ebtop, mu0, scale)
    if pad:
        j = j[..., :lb]
    return j


def rad_source_lane(
    t1, t2,                # [M, U, N, nstr] static projection tables
    yu,                    # [M, U, nstr] static Lam_l^m(u) tables
    c,                     # [nstr, LB] scattering coefficients per lane
    y0d,                   # [M, nstr, LB] Lam_l^m(-mu0) per lane
    gp, gm,                # [M, N, N, LB] eigenvectors
    kk,                    # [M, N, LB] eigenvalues
    zp, zm,                # [M, N, LB] beam particular amplitudes
    a, b,                  # [M, N, LB] BVP amplitudes
    dtau, ebtop, mu0, scale,   # [1, LB] per-lane scalars
    umu,                   # [U] static user cosines (sign = direction)
    *,
    tile_b: int = 512,
    interpret: bool = False,
):
    """j [M, U, LB]: per-(mode, angle, layer, column) path source."""
    return _rad_source_call(
        t1, t2, yu, c, y0d, gp, gm, kk, zp, zm, a, b,
        dtau, ebtop, mu0, scale,
        u_vals=tuple(float(x) for x in np.asarray(umu)),
        tile_b=tile_b, interpret=interpret,
    )
