"""Boundary-value problem: stitch per-layer solutions into a column solution.

Replaces disort.f:SETMTX + SOLVE0 (+ the LINPACK banded LU SGBCO/SGBFA/SGBSL
underneath).  The reference assembles one banded matrix of order nstr*nlyr
(bandwidth 3*nstr/2 - 1) and factors it serially.  Structurally the system is
block-tridiagonal with 2N x 2N blocks over layers (N = nstr/2), which is the
form that maps to TPU: a `lax.scan` block-Thomas elimination whose every step
is a *batched* (batch x mode) small dense solve — the layer recursion is the
only sequential axis and it is at most ~65 long, while the batch axis carries
the parallelism.

All per-layer tensors use the lane layout of ops/lane.py — matrix dims
leading, flattened (batch x mode) in the minor axis: [L, 2N, 2N, B] — so the
block assembly, the elimination and the back-substitution are full-occupancy
vector code on TPU tiles (see ops/lane.py for the layout rationale).

Unknowns per layer l: x_l = [a_l (N), b_l (N)] — amplitudes of the
down-decaying (exp(-k t')) and up-decaying (exp(-k (dtau - t'))) eigenmodes.
Exponentials are stored in the boundary-anchored scaled form so nothing ever
overflows (same trick as DISORT's scaled SOLVE0 representation).

Equation layout (block row l):
  rows 0..N-1   : downward-intensity continuity at the TOP of layer l
                  (top boundary condition for l = 0),
  rows N..2N-1  : upward-intensity continuity at the BOTTOM of layer l
                  (Lambertian-surface boundary condition for l = L-1).
This row grouping is what makes the system exactly block-tridiagonal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sbdart_tpu.ops import lane
from sbdart_tpu.solver.eig import AngularTables, EigResult
from sbdart_tpu.solver.sources import BeamSource, ThermalSource


class BvpSolution(NamedTuple):
    aa: jnp.ndarray   # [..., m, L, N] down-decaying amplitudes
    bb: jnp.ndarray   # [..., m, L, N] up-decaying amplitudes


class ParticularAtBounds(NamedTuple):
    """Particular-solution intensities at each layer's top and bottom."""
    top_up: jnp.ndarray   # [..., m, L, N]
    top_dn: jnp.ndarray
    bot_up: jnp.ndarray
    bot_dn: jnp.ndarray


def particular_at_bounds(
    beam: BeamSource,
    thermal: ThermalSource | None,
    expbea: jnp.ndarray,     # [..., L+1] exp(-tau_l / mu0) at boundaries
    dtau: jnp.ndarray,       # [..., L]
    nmode: int,
) -> ParticularAtBounds:
    eb_top = expbea[..., None, :-1, None]     # [..., 1, L, 1]
    eb_bot = expbea[..., None, 1:, None]
    top_up = beam.zp * eb_top
    top_dn = beam.zm * eb_top
    bot_up = beam.zp * eb_bot
    bot_dn = beam.zm * eb_bot
    if thermal is not None:
        # thermal contributes to azimuth mode 0 only
        mode_mask = jnp.zeros((nmode, 1, 1), top_up.dtype).at[0].set(1.0)
        d = dtau[..., None]
        top_up = top_up + mode_mask * thermal.y0p[..., None, :, :]
        top_dn = top_dn + mode_mask * thermal.y0m[..., None, :, :]
        bot_up = bot_up + mode_mask * (thermal.y0p + thermal.y1p * d)[..., None, :, :]
        bot_dn = bot_dn + mode_mask * (thermal.y0m + thermal.y1m * d)[..., None, :, :]
    return ParticularAtBounds(top_up, top_dn, bot_up, bot_dn)


# --------------------------------------------------------------------------
# Layout shuffles between the solver's [..., m, L, ...] pytrees and the
# scan-ready lane layout [L, ..., B] (B = flattened batch x mode)
# --------------------------------------------------------------------------

def _to_scan_lane(x: jnp.ndarray, ndim_mat: int) -> jnp.ndarray:
    """[batch..., m, L, *mat] -> [L, *mat, B] with B = prod(batch)*m."""
    l_axis = x.ndim - ndim_mat - 1
    x = jnp.moveaxis(x, l_axis, 0)            # [L, batch..., m, *mat]
    bshape = x.shape[1: x.ndim - ndim_mat]
    b = 1
    for s in bshape:
        b *= s
    x = x.reshape((x.shape[0], b) + x.shape[x.ndim - ndim_mat:])
    return jnp.moveaxis(x, 1, -1)             # [L, *mat, B]


def _from_scan_lane(x: jnp.ndarray, batch_shape: tuple) -> jnp.ndarray:
    """[L, *mat, B] -> [batch..., m, L, *mat]."""
    x = jnp.moveaxis(x, -1, 1)                # [L, B, *mat]
    x = x.reshape((x.shape[0],) + batch_shape + x.shape[2:])
    return jnp.moveaxis(x, 0, len(batch_shape))


def _flat_bm(x: jnp.ndarray, nmode: int) -> jnp.ndarray:
    """[batch...] -> [B]: broadcast over the mode axis and flatten."""
    return jnp.broadcast_to(x[..., None], x.shape + (nmode,)).reshape(-1)


def solve_bvp(
    eig: EigResult,
    part: ParticularAtBounds,
    dtau: jnp.ndarray,        # [..., L] (delta-M scaled)
    surf_refl: jnp.ndarray,   # [..., m, N, N] surface reflection operator
                              # (Lambertian: 2*alb for m=0, 0 else; BRDF:
                              #  R_m(mu_i, mu_j) from solver/brdf.py)
    fisot: jnp.ndarray,       # [...]
    top_emission: jnp.ndarray,   # [...] temis * B(ttemp) (0 unless planck)
    surf_emission: jnp.ndarray,  # [..., N] eps(mu_i) * B(btemp) (0 unless planck)
    beam_refl_src: jnp.ndarray,  # [..., m, N] reflected-direct-beam source
    tab: AngularTables,
    dtype,
    method: str = "auto",     # auto | kernel | kernel_interpret | scan
) -> BvpSolution:
    """Assemble and solve the block-tridiagonal BVP for all azimuth modes."""
    n = tab.mu.shape[0]
    nmode = eig.kk.shape[-3]
    nlyr = eig.kk.shape[-2]
    batch_shape = eig.kk.shape[:-3] + (nmode,)
    w = jnp.asarray(tab.w, dtype)
    mu = jnp.asarray(tab.mu, dtype)
    wmu = (w * mu)[:, None]                        # [N, 1] column scale

    ee_std = jnp.exp(-eig.kk * dtau[..., None, :, None])   # [..., m, L, N]

    # relayout the per-layer operands once: [L, N(,N), B]
    gp = _to_scan_lane(eig.gp, 2)
    gm = _to_scan_lane(eig.gm, 2)
    ee = _to_scan_lane(ee_std, 1)

    p_tu = _to_scan_lane(part.top_up, 1)
    p_td = _to_scan_lane(part.top_dn, 1)
    p_bu = _to_scan_lane(part.bot_up, 1)
    p_bd = _to_scan_lane(part.bot_dn, 1)

    srefl = lane.to_lane(surf_refl)[0]             # [N, N, B]
    bref = lane.to_lane(beam_refl_src, 1)[0]       # [N, B]

    mode0 = jnp.zeros(batch_shape, dtype)
    mode0 = mode0.at[..., 0].set(1.0).reshape(-1)  # [B] 1 on azimuth mode 0
    iso = (_flat_bm(fisot, nmode) + _flat_bm(top_emission, nmode)) * mode0
    semis = (
        lane.to_lane(surf_emission[..., None, :] * jnp.ones((nmode, 1), dtype), 1)[0]
        * mode0[None, :]
    )                                              # [N, B]

    refl_op = srefl * wmu[None]                    # [N, N, B] R[i,k] w_k mu_k

    # ---- right-hand side --------------------------------------------------
    # top rows: l=0 -> (fisot + top emission) - Ip_dn(top of 0)
    #           l>0 -> Ip_dn(bottom of l-1) - Ip_dn(top of l)
    r_top0 = iso[None, :] - p_td[0]                            # [N, B]
    r_topl = p_bd[:-1] - p_td[1:]
    r_top = jnp.concatenate([r_top0[None], r_topl], axis=0)    # [L, N, B]

    # bottom rows: l<L-1 -> Ip_up(top of l+1) - Ip_up(bottom of l)
    #              l=L-1 -> surface terms - Ip_up(bottom) + refl of Ip_dn(bottom)
    r_botl = p_tu[1:] - p_bu[:-1]
    refl_part = lane.lmatvec(refl_op, p_bd[-1])
    r_botL = semis + bref + refl_part - p_bu[-1]
    r_bot = jnp.concatenate([r_botl, r_botL[None]], axis=0)
    rhs = jnp.concatenate([r_top, r_bot], axis=1)              # [L, 2N, B]

    # ---- block-Thomas elimination over layers ------------------------------
    # TPU: one fused Pallas kernel assembles the blocks from gp/gm/ee ON THE
    # FLY and holds all layers of a batch tile in VMEM (pallas/blocktri.py) —
    # the assembled [L, 2N, 2N, B] blocks (the largest tensors in the flux
    # hot path) never touch HBM.  Elsewhere: assemble + lax.scan fallback
    # (identical math).
    if method == "auto":
        from sbdart_tpu.dtypes import on_tpu

        use_kernel = on_tpu() and jnp.dtype(dtype) == jnp.float32
        method = "kernel" if use_kernel else "scan"
    if method in ("kernel", "kernel_interpret"):
        from sbdart_tpu.pallas import block_thomas_rt

        xs = block_thomas_rt(
            gp, gm, ee, refl_op, rhs, interpret=(method == "kernel_interpret")
        )                                                       # [L, 2N, B]
    else:
        diag, lower, upper = assemble_blocks(gp, gm, ee, refl_op)
        xs = block_thomas_scan(diag, lower, upper, rhs)
    x = _from_scan_lane(xs, batch_shape)                        # [..., m, L, 2N]
    return BvpSolution(x[..., :n], x[..., n:])


def assemble_blocks(gp, gm, ee, refl_op):
    """Materialize the block-tridiagonal operator (SETMTX equivalent).

    gp/gm [L, N, N, B], ee [L, N, B], refl_op [N, N, B] (R[i,k] w_k mu_k)
    -> (diag, lower, upper) each [L, 2N, 2N, B].  The XLA fallback path for
    pallas/blocktri.py:block_thomas_rt, which fuses this assembly.
    """
    e_col = ee[:, None, :, :]
    d_top = jnp.concatenate([gm, gp * e_col], axis=2)          # [L, N, 2N, B]
    d_bot = jnp.concatenate([gp * e_col, gm], axis=2)
    # surface reflection correction on the last layer's bottom rows:
    # row_i gains -sum_k w_k mu_k R_m[i,k] * (downward hom. solution)_kj
    refl_a = lane.lmatmul(refl_op, gm[-1] * e_col[-1])
    refl_b = lane.lmatmul(refl_op, gp[-1])
    refl = jnp.concatenate([refl_a, refl_b], axis=1)           # [N, 2N, B]
    d_bot = d_bot.at[-1].add(-refl)
    diag = jnp.concatenate([d_top, d_bot], axis=1)             # [L, 2N, 2N, B]

    # lower blocks (couple x_{l-1}); nonzero in top rows, l >= 1
    low_top = jnp.concatenate([gm * e_col, gp], axis=2)        # layer l-1 view
    lower = jnp.concatenate([-low_top, jnp.zeros_like(low_top)], axis=1)
    lower = jnp.concatenate([jnp.zeros_like(lower[:1]), lower[:-1]], axis=0)

    # upper blocks (couple x_{l+1}); nonzero in bottom rows, l <= L-2
    up_bot = jnp.concatenate([gp, gm * e_col], axis=2)         # layer l+1 view
    upper = jnp.concatenate([jnp.zeros_like(up_bot), -up_bot], axis=1)
    upper = jnp.concatenate([upper[1:], jnp.zeros_like(upper[:1])], axis=0)
    return diag, lower, upper


def block_thomas_scan(diag, lower, upper, rhs):
    """lax.scan block-Thomas (XLA fallback for pallas/blocktri.py).

    diag/lower/upper [L, m, m, B], rhs [L, m, B] -> xs [L, m, B].
    """
    m2 = diag.shape[1]
    # derive the zero carries from the varying operands (not fresh
    # constants) so the carry's varying-manual-axes match under
    # shard_map(check_vma=True) — see batch.py
    w0 = diag[0] * 0.0
    y0 = rhs[0] * 0.0

    def fwd(carry, inp):
        w_prev, y_prev = carry
        d_l, a_l, u_l, r_l = inp
        dt = d_l - lane.lmatmul(a_l, w_prev)
        rt = r_l - lane.lmatvec(a_l, y_prev)
        sol = lane.lsolve(dt, jnp.concatenate([u_l, rt[:, None, :]], axis=1))
        w_l = sol[:, :m2]
        y_l = sol[:, m2]
        return (w_l, y_l), (w_l, y_l)

    (_, _), (ws, ys) = jax.lax.scan(fwd, (w0, y0), (diag, lower, upper, rhs))

    def bwd(x_next, inp):
        w_l, y_l = inp
        x_l = y_l - lane.lmatvec(w_l, x_next)
        return x_l, x_l

    x_last = ys[-1]
    _, xs_rev = jax.lax.scan(bwd, x_last, (ws[:-1], ys[:-1]), reverse=True)
    return jnp.concatenate([xs_rev, x_last[None]], axis=0)      # [L, m, B]


class BoundaryIntensities(NamedTuple):
    """Quadrature-angle intensities at the L+1 layer boundaries."""
    up: jnp.ndarray   # [..., m, L+1, N]  I(+mu_i)
    dn: jnp.ndarray   # [..., m, L+1, N]  I(-mu_i)


def intensity_at_boundaries(
    eig: EigResult,
    sol: BvpSolution,
    part: ParticularAtBounds,
    dtau: jnp.ndarray,
) -> BoundaryIntensities:
    """Evaluate the full solution at every layer boundary (quadrature angles)."""
    nmode = eig.kk.shape[-3]
    batch_shape = eig.kk.shape[:-3] + (nmode,)
    ee_std = jnp.exp(-eig.kk * dtau[..., None, :, None])   # [..., m, L, N]

    gp = _to_scan_lane(eig.gp, 2)                # [L, N, N, B]
    gm = _to_scan_lane(eig.gm, 2)
    ee = _to_scan_lane(ee_std, 1)                # [L, N, B]
    a = _to_scan_lane(sol.aa, 1)
    b = _to_scan_lane(sol.bb, 1)
    e_col = ee[:, None, :, :]

    # at layer tops (t' = 0): hom = G a + (G~ e) b
    top_up = lane.lmatvec(gp, a) + lane.lmatvec(gm * e_col, b)   # [L, N, B]
    top_dn = lane.lmatvec(gm, a) + lane.lmatvec(gp * e_col, b)
    # at layer bottoms (t' = dtau): hom = (G e) a + G~ b
    bot_up = lane.lmatvec(gp * e_col, a) + lane.lmatvec(gm, b)
    bot_dn = lane.lmatvec(gm * e_col, a) + lane.lmatvec(gp, b)

    p_tu = _to_scan_lane(part.top_up, 1)
    p_td = _to_scan_lane(part.top_dn, 1)
    p_bu = _to_scan_lane(part.bot_up, 1)
    p_bd = _to_scan_lane(part.bot_dn, 1)

    up = jnp.concatenate(
        [top_up + p_tu, (bot_up + p_bu)[-1:]], axis=0
    )                                                            # [L+1, N, B]
    dn = jnp.concatenate([top_dn + p_td, (bot_dn + p_bd)[-1:]], axis=0)
    return BoundaryIntensities(
        _from_scan_lane(up, batch_shape), _from_scan_lane(dn, batch_shape)
    )
