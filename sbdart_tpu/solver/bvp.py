"""Boundary-value problem: stitch per-layer solutions into a column solution.

Replaces disort.f:SETMTX + SOLVE0 (+ the LINPACK banded LU SGBCO/SGBFA/SGBSL
underneath).  The reference assembles one banded matrix of order nstr*nlyr
(bandwidth 3*nstr/2 - 1) and factors it serially.  Structurally the system is
block-tridiagonal with 2N x 2N blocks over layers (N = nstr/2), which is the
form that maps to TPU: a `lax.scan` block-Thomas elimination whose every step
is a *batched* (batch x mode) small dense solve — the layer recursion is the
only sequential axis and it is at most ~65 long, while the batch axis carries
the parallelism.

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

from sbdart_tpu.ops import gauss_solve
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
) -> BvpSolution:
    """Assemble and solve the block-tridiagonal BVP for all azimuth modes."""
    n = tab.mu.shape[0]
    nmode = eig.kk.shape[-3]
    nlyr = eig.kk.shape[-2]
    w = jnp.asarray(tab.w, dtype)
    mu = jnp.asarray(tab.mu, dtype)
    wmu = w * mu

    gp, gm, kk = eig.gp, eig.gm, eig.kk
    ee = jnp.exp(-kk * dtau[..., None, :, None])   # [..., m, L, N]
    e_col = ee[..., None, :]                       # scale eigenmode columns

    mode0 = jnp.zeros((nmode,), dtype).at[0].set(1.0)  # [m]

    # ---- diagonal blocks --------------------------------------------------
    d_top = jnp.concatenate([gm, gp * e_col], axis=-1)          # [...,m,L,N,2N]
    d_bot = jnp.concatenate([gp * e_col, gm], axis=-1)
    # surface reflection correction on the last layer's bottom rows:
    # row_i gains -sum_k w_k mu_k R_m[i,k] * (downward hom. solution)_kj
    refl_a = jnp.einsum(
        "...mik,k,...mkj->...mij",
        surf_refl, wmu, gm[..., -1, :, :] * e_col[..., -1, :, :],
    )                                                            # [..., m, N, N]
    refl_b = jnp.einsum(
        "...mik,k,...mkj->...mij", surf_refl, wmu, gp[..., -1, :, :]
    )
    refl = jnp.concatenate([refl_a, refl_b], axis=-1)            # [..., m, N, 2N]
    d_bot_last = d_bot[..., -1, :, :] - refl
    d_bot = d_bot.at[..., -1, :, :].set(d_bot_last)
    diag = jnp.concatenate([d_top, d_bot], axis=-2)              # [...,m,L,2N,2N]

    # ---- lower blocks (couple x_{l-1}); nonzero in top rows, l >= 1 -------
    low_top = jnp.concatenate([gm * e_col, gp], axis=-1)         # layer l-1 view
    lower = jnp.concatenate(
        [-low_top, jnp.zeros_like(low_top)], axis=-2
    )                                                            # [...,m,L,2N,2N]
    # shift: block row l uses layer l-1 matrices; row 0 is zero
    lower = jnp.concatenate(
        [jnp.zeros_like(lower[..., :1, :, :]), lower[..., :-1, :, :]], axis=-3
    )

    # ---- upper blocks (couple x_{l+1}); nonzero in bottom rows, l <= L-2 --
    up_bot = jnp.concatenate([gp, gm * e_col], axis=-1)          # layer l+1 view
    upper = jnp.concatenate(
        [jnp.zeros_like(up_bot), -up_bot], axis=-2
    )
    upper = jnp.concatenate(
        [upper[..., 1:, :, :], jnp.zeros_like(upper[..., :1, :, :])], axis=-3
    )

    # ---- right-hand side --------------------------------------------------
    # top rows: l=0 -> (fisot + top emission) - Ip_dn(top of 0)
    #           l>0 -> Ip_dn(bottom of l-1) - Ip_dn(top of l)
    iso = (fisot[..., None] + top_emission[..., None]) * mode0   # [..., m]
    r_top0 = iso[..., None] - part.top_dn[..., 0, :]             # [..., m, N]
    r_topl = part.bot_dn[..., :-1, :] - part.top_dn[..., 1:, :]
    r_top = jnp.concatenate([r_top0[..., None, :], r_topl], axis=-2)

    # bottom rows: l<L-1 -> Ip_up(top of l+1) - Ip_up(bottom of l)
    #              l=L-1 -> surface terms - Ip_up(bottom) + refl of Ip_dn(bottom)
    r_botl = part.top_up[..., 1:, :] - part.bot_up[..., :-1, :]
    surf_src = (
        surf_emission[..., None, :] * mode0[:, None] + beam_refl_src
    )                                                            # [..., m, N]
    refl_part = jnp.einsum(
        "...mij,j,...mj->...mi", surf_refl, wmu, part.bot_dn[..., -1, :]
    )
    r_botL = surf_src + refl_part - part.bot_up[..., -1, :]      # [..., m, N]
    r_bot = jnp.concatenate([r_botl, r_botL[..., None, :]], axis=-2)
    rhs = jnp.concatenate([r_top, r_bot], axis=-1)               # [..., m, L, 2N]

    # ---- block-Thomas elimination over layers (lax.scan) ------------------
    # Move the layer axis to the front for scan.
    def to_front(x):
        return jnp.moveaxis(x, -3, 0)

    diag_s, lower_s, upper_s = to_front(diag), to_front(lower), to_front(upper)
    rhs_s = jnp.moveaxis(rhs, -2, 0)

    batch_shape = rhs.shape[:-2]  # includes mode axis
    w0 = jnp.zeros(batch_shape + (2 * n, 2 * n), dtype)
    y0 = jnp.zeros(batch_shape + (2 * n,), dtype)

    def fwd(carry, inp):
        w_prev, y_prev = carry
        d_l, a_l, u_l, r_l = inp
        dt = d_l - a_l @ w_prev
        rt = r_l - jnp.einsum("...ij,...j->...i", a_l, y_prev)
        sol = gauss_solve(dt, jnp.concatenate([u_l, rt[..., None]], axis=-1))
        w_l = sol[..., : 2 * n]
        y_l = sol[..., 2 * n]
        return (w_l, y_l), (w_l, y_l)

    (_, _), (ws, ys) = jax.lax.scan(fwd, (w0, y0), (diag_s, lower_s, upper_s, rhs_s))

    def bwd(x_next, inp):
        w_l, y_l = inp
        x_l = y_l - jnp.einsum("...ij,...j->...i", w_l, x_next)
        return x_l, x_l

    x_last = ys[-1]
    _, xs_rev = jax.lax.scan(
        bwd, x_last, (ws[:-1], ys[:-1]), reverse=True
    )
    xs = jnp.concatenate([xs_rev, x_last[None]], axis=0)          # [L, ..., 2N]
    x = jnp.moveaxis(xs, 0, -2)                                   # [..., m, L, 2N]
    return BvpSolution(x[..., :n], x[..., n:])


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
    ee = jnp.exp(-eig.kk * dtau[..., None, :, None])   # [..., m, L, N]
    a = sol.aa[..., None]   # mode amplitudes as column vecs [..., m, L, N, 1]
    b = sol.bb[..., None]
    e = ee[..., None]

    # at layer tops (t' = 0): hom = G a + (G~ e) b
    top_up = (eig.gp @ a + (eig.gm * jnp.swapaxes(e, -1, -2)) @ b)[..., 0]
    top_dn = (eig.gm @ a + (eig.gp * jnp.swapaxes(e, -1, -2)) @ b)[..., 0]
    # at layer bottoms (t' = dtau): hom = (G e) a + G~ b
    bot_up = ((eig.gp * jnp.swapaxes(e, -1, -2)) @ a + eig.gm @ b)[..., 0]
    bot_dn = ((eig.gm * jnp.swapaxes(e, -1, -2)) @ a + eig.gp @ b)[..., 0]

    up = jnp.concatenate(
        [top_up + part.top_up, (bot_up + part.bot_up)[..., -1:, :]], axis=-2
    )
    dn = jnp.concatenate(
        [top_dn + part.top_dn, (bot_dn + part.bot_dn)[..., -1:, :]], axis=-2
    )
    return BoundaryIntensities(up, dn)
