"""Particular solutions of the discrete-ordinates RTE.

Replaces disort.f:UPBEAM (collimated-beam source) and UPISOT (thermal
source).  The reference factors one (nstr x nstr) dense system per layer
with LINPACK SGECO/SGESL inside nested loops; here the systems are solved as
one batched pivoted-GE call over (batch, mode, layer).

Conventions (see eig.py): within layer l (local coordinate t' in [0, dtau_l]):

  beam:    I_p(t', u) = Z(u) * exp(-(tau_top_l + t') / mu0)
  thermal: I_t(t', u) = Y0(u) + Y1(u) * t'            (azimuth mode 0 only)

with u ranging over the 2N quadrature directions ordered [+mu_1..+mu_N,
-mu_1..-mu_N].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sbdart_tpu.constants import slope_tau_floor
from sbdart_tpu.ops import lane
from sbdart_tpu.solver.eig import AngularTables
from sbdart_tpu.solver.legendre import legendre_assoc_norm


def full_scatter_matrix(cpp: jnp.ndarray, cpm: jnp.ndarray, w) -> jnp.ndarray:
    """Assemble the full 2N x 2N quadrature scattering operator.

    Scat = [[A, B], [B, A]] with A = C^pp W, B = C^pm W acting on
    [I(+mu), I(-mu)].
    """
    a = cpp * w
    b = cpm * w
    top = jnp.concatenate([a, b], axis=-1)
    bot = jnp.concatenate([b, a], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class BeamSource(NamedTuple):
    zp: jnp.ndarray    # [..., nmode, L, N]  Z at +mu_i
    zm: jnp.ndarray    # [..., nmode, L, N]  Z at -mu_i


def beam_particular(
    cpp: jnp.ndarray,
    cpm: jnp.ndarray,
    ssalb: jnp.ndarray,
    gl: jnp.ndarray,
    fbeam: jnp.ndarray,
    umu0: jnp.ndarray,
    tab: AngularTables,
    dtype,
) -> BeamSource:
    """Solve the beam particular solution per (batch, mode, layer).

    Args:
      cpp/cpm: scattering matrices from solve_eigen, [..., m, L, N, N].
      ssalb, gl: delta-M scaled optical properties ([..., L], [..., L, nstr]).
      fbeam: beam flux [...] (0 disables; the solve still runs batched but
        with a safe mu0 and a zero RHS).
      umu0: cosine of beam zenith [...] (> 0).
    """
    import numpy as np

    n = tab.mu.shape[0]
    nmode = tab.ylm.shape[0]
    mu = jnp.asarray(tab.mu, dtype)
    w = jnp.asarray(tab.w, dtype)
    twol1 = jnp.asarray(tab.twol1, dtype)
    ylm = jnp.asarray(tab.ylm, dtype)          # [m, nstr, N]
    parity = jnp.asarray(tab.parity, dtype)    # [m, nstr]

    has_beam = fbeam > 0.0
    mu0 = jnp.where(has_beam, jnp.abs(umu0), 0.5)

    # RHS: X0(u_i) = (w0 F0 (2 - delta_m0) / 4pi) sum_l (2l+1) g_l
    #                 Lam_l^m(u_i) Lam_l^m(-mu0)
    # Lam at -mu0 = parity * Lam at +mu0.  Lam(mu0) must be evaluated at the
    # traced mu0 value -> use a jax recurrence rather than the numpy table.
    ylm0 = _ylm_at(mu0, nmode, ylm.shape[1], dtype)      # [..., m, nstr]
    ylm0_down = ylm0 * parity                            # Lam_l^m(-mu0)
    mfac = jnp.asarray(
        np.where(np.arange(nmode) == 0, 1.0, 2.0), dtype
    )                                                    # (2 - delta_m0)
    # c_l = (w0/2)(2l+1) g_l  [..., L, nstr] ; add mode axis
    c = 0.5 * ssalb[..., None] * twol1 * gl
    x0p = jnp.einsum("...Ll,...ml,mli->...mLi", c, ylm0_down, ylm)
    x0m = jnp.einsum("...Ll,...ml,ml,mli->...mLi", c, ylm0_down, parity, ylm)
    scale = (
        jnp.where(has_beam, fbeam, 0.0)[..., None, None, None]
        * mfac[:, None, None]
        / (2.0 * jnp.pi)
    )
    x0p = x0p * scale
    x0m = x0m * scale

    # ---- reduced N x N solve via the +- symmetry --------------------------
    # With S = Z+ + Z-, D = Z+ - Z-, the 2N system splits into
    #   (alpha-beta) S + D/mu0 = M^-1 (X0+ + X0-)  == r1
    #   (alpha+beta) D + S/mu0 = M^-1 (X0+ - X0-)  == r2
    # =>  [(alpha+beta)(alpha-beta) - I/mu0^2] S = (alpha+beta) r1 - r2/mu0
    # — half the dimension of the reference's UPBEAM (SGECO/SGESL) solve and
    # reusing the matrices the eigensolve already needs.  The 1/mu0 == k_j
    # resonance is measure-zero and handled as DISORT does (dither mu0).
    # Everything runs in the lane layout of ops/lane.py (batch minor).
    cppl, batch_shape = lane.to_lane(cpp)                 # [N, N, B]
    cpml, _ = lane.to_lane(cpm)
    eye = jnp.eye(n, dtype=dtype)[..., None]
    inv_mu_i = (1.0 / mu)[:, None, None]
    w_j = w[None, :, None]
    amb = inv_mu_i * (eye - (cppl + cpml) * w_j)          # alpha - beta
    apb = inv_mu_i * (eye - (cppl - cpml) * w_j)          # alpha + beta

    nlyr = cpp.shape[-3]
    mu0_flat = jnp.broadcast_to(
        mu0[..., None, None], mu0.shape + (nmode, nlyr)
    ).reshape(-1)                                         # [B]
    inv_mu0 = 1.0 / mu0_flat
    r1 = lane.to_lane((x0p + x0m) / mu, 1)[0]             # [N, B]
    r2 = lane.to_lane((x0p - x0m) / mu, 1)[0]
    mat = lane.lmatmul(apb, amb) - eye * inv_mu0**2
    rhs = lane.lmatvec(apb, r1) - r2 * inv_mu0
    s = lane.lsolve(mat, rhs[:, None, :])[:, 0]
    d = (r1 - lane.lmatvec(amb, s)) * mu0_flat
    return BeamSource(
        lane.from_lane(0.5 * (s + d), batch_shape),
        lane.from_lane(0.5 * (s - d), batch_shape),
    )


def _ylm_at(mu0: jnp.ndarray, nmode: int, nmom: int, dtype) -> jnp.ndarray:
    """Normalized associated Legendre Lam_l^m at traced cosines.

    Same recurrence as legendre.legendre_assoc_norm but in jax so it works on
    batched, traced mu0.  Returns [..., nmode, nmom].
    """
    mu0 = jnp.asarray(mu0, dtype)
    somu2 = jnp.sqrt(jnp.clip(1.0 - mu0 * mu0, 0.0, 1.0))
    rows = []
    for m in range(nmode):
        vals = [jnp.zeros_like(mu0)] * m
        c = 1.0
        for i in range(1, m + 1):
            c *= (2 * i - 1) / (2 * i)
        lam_prev = jnp.sqrt(jnp.asarray(c, dtype)) * somu2**m
        if m < nmom:
            vals.append(lam_prev)
        if m + 1 < nmom:
            lam = jnp.sqrt(jnp.asarray(2.0 * m + 1.0, dtype)) * mu0 * lam_prev
            vals.append(lam)
            for l in range(m + 1, nmom - 1):
                nxt = (
                    (2 * l + 1) * mu0 * lam
                    - jnp.sqrt(jnp.asarray((l - m) * (l + m), dtype)) * lam_prev
                ) / jnp.sqrt(jnp.asarray((l + 1 - m) * (l + 1 + m), dtype))
                lam_prev, lam = lam, nxt
                vals.append(lam)
        rows.append(jnp.stack(vals[:nmom], axis=-1))
    return jnp.stack(rows, axis=-2)  # [..., nmode, nmom]


class ThermalSource(NamedTuple):
    y0p: jnp.ndarray   # [..., L, N]  Y0 at +mu_i   (mode 0 only)
    y0m: jnp.ndarray   # [..., L, N]
    y1p: jnp.ndarray   # [..., L, N]
    y1m: jnp.ndarray   # [..., L, N]
    b_top: jnp.ndarray  # [..., L] Planck at layer tops
    b_bot: jnp.ndarray  # [..., L] Planck at layer bottoms


def thermal_particular(
    cpp0: jnp.ndarray,
    cpm0: jnp.ndarray,
    ssalb: jnp.ndarray,
    dtau: jnp.ndarray,
    b_level: jnp.ndarray,
    tab: AngularTables,
    dtype,
) -> ThermalSource:
    """Thermal (Planck) particular solution, azimuth mode 0.

    Args:
      cpp0/cpm0: mode-0 scattering matrices [..., L, N, N].
      b_level: band-integrated Planck radiance at the L+1 levels [..., L+1].
    """
    n = tab.mu.shape[0]
    mu = jnp.asarray(tab.mu, dtype)
    w = jnp.asarray(tab.w, dtype)
    b_top = b_level[..., :-1]
    b_bot = b_level[..., 1:]
    b1 = (b_bot - b_top) / jnp.maximum(dtau, slope_tau_floor(dtype))

    # Reduced N x N solves via the +- symmetry (the emission source is
    # up/down symmetric, so the difference components collapse):
    #   Y1+ = Y1- = S1/2,        (alpha-beta) S1 = 2 (1-w0) b1 / mu
    #   Y0+- = (S0 +- D0)/2,     (alpha-beta) S0 = 2 (1-w0) Btop / mu
    #                            (alpha+beta) D0 = S1
    # — replaces UPISOT's full (2N x 2N) SGECO/SGESL solves.
    cppl, batch_shape = lane.to_lane(cpp0)       # [N, N, B], B = batch x L
    cpml, _ = lane.to_lane(cpm0)
    eye = jnp.eye(n, dtype=dtype)[..., None]
    inv_mu_i = (1.0 / mu)[:, None, None]
    w_j = w[None, :, None]
    amb = inv_mu_i * (eye - (cppl + cpml) * w_j)
    apb = inv_mu_i * (eye - (cppl - cpml) * w_j)
    emis = (1.0 - ssalb)[..., None]              # [..., L, 1]
    ones_mu = 1.0 / mu                           # [N] (the 1/mu weighting)
    rhs1 = lane.to_lane(2.0 * emis * b1[..., None] * ones_mu, 1)[0]
    rhs0 = lane.to_lane(2.0 * emis * b_top[..., None] * ones_mu, 1)[0]
    both = lane.lsolve(amb, jnp.stack([rhs1, rhs0], axis=1))   # [N, 2, B]
    s1 = both[:, 0]
    s0 = both[:, 1]
    d0 = lane.lsolve(apb, s1[:, None, :])[:, 0]
    y1p = lane.from_lane(0.5 * s1, batch_shape)
    y0p = lane.from_lane(0.5 * (s0 + d0), batch_shape)
    y0m = lane.from_lane(0.5 * (s0 - d0), batch_shape)
    return ThermalSource(y0p, y0m, y1p, y1p, b_top, b_bot)
