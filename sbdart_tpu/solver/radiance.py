"""User-angle radiances.

Replaces disort.f:USRINT/CMPINT/TERPEV/TERPSO and the Nakajima–Tanaka TMS
single-scatter correction of INTCOR/SECSCA.

Method: the DOM solution defines a closed-form source function per layer
(sums of exponentials in optical depth from the eigenmodes, the beam term,
and a linear-in-tau thermal term).  The radiance at any view cosine u is the
exact path integral of that source — per layer the integrals are analytic,
so the radiance recursion over layers is a `lax.scan` from the surface
(upward angles) or the top (downward angles), batched over
(batch, mode, user-angle).  This is DISORT's USRINT formulation, evaluated
branchlessly: beam/view-angle resonances (u*k == 1, u == mu0) use Taylor
forms selected with `where` instead of the reference's dithering.

User angles are STATIC (host numpy): they come from the config, and static
angle sets let the Legendre tables be precomputed host-side.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sbdart_tpu.constants import slope_tau_floor
from sbdart_tpu.solver.deltam import DeltaMResult
from sbdart_tpu.solver.eig import AngularTables, EigResult
from sbdart_tpu.solver.bvp import BvpSolution, BoundaryIntensities
from sbdart_tpu.solver.legendre import legendre_assoc_norm
from sbdart_tpu.solver.sources import BeamSource, ThermalSource

_RES_EPS = 1e-5   # resonance half-width for Taylor switchover


def _int_toward(k, delta, u):
    """int_0^D e^{-k t'} e^{-t'/u} dt' / u  (decay toward the path start)."""
    return (1.0 - jnp.exp(-(k + 1.0 / u) * delta)) / (u * k + 1.0)


def _int_away(k, delta, u):
    """int_0^D e^{-k (D - t')} e^{-t'/u} dt' / u with resonance-safe limit.

    Closed form (E = e^{-D/u}): (E - e^{-kD}) / (u k - 1); as u k -> 1 the
    limit is E * D / u.
    """
    e_u = jnp.exp(-delta / u)
    d = u * k - 1.0
    safe_d = jnp.where(jnp.abs(d) < _RES_EPS, 1.0, d)
    exact = (e_u - jnp.exp(-k * delta)) / safe_d
    taylor = e_u * (delta / u) * (1.0 - d * delta / (2.0 * u))
    return jnp.where(jnp.abs(d) < _RES_EPS, taylor, exact)


def compute_radiances(
    *,
    eig: EigResult,
    sol: BvpSolution,
    beam: BeamSource,
    thermal: ThermalSource | None,
    dm: DeltaMResult,
    tau_s: jnp.ndarray,          # [..., L+1] scaled boundary optical depths
    tau_u: jnp.ndarray,          # [..., L+1] UNSCALED boundary optical depths
    ssalb_unscaled: jnp.ndarray,  # [..., L] unscaled single-scatter albedo
    expbea_s: jnp.ndarray,       # [..., L+1]
    tab: AngularTables,
    fbeam: jnp.ndarray,
    mu0: jnp.ndarray,
    phi0: jnp.ndarray,
    fisot: jnp.ndarray,
    albedo: jnp.ndarray,
    top_emission: jnp.ndarray,
    surf_emission: jnp.ndarray,
    bounds: BoundaryIntensities,
    pmom_unscaled: jnp.ndarray,  # [..., L, nmom]
    umu: np.ndarray,             # [U] static user cosines (nonzero, +- mixed)
    phi: np.ndarray,             # [P] static user azimuths [deg]
    corint: bool,
    dtype,
    brdf=None,                   # non-Lambertian surface (solver/brdf.py)
) -> jnp.ndarray:
    """Radiances uu[..., L+1, U, P] at all layer boundaries."""
    umu = np.asarray(umu, np.float64)
    phi = np.asarray(phi, np.float64)
    if np.any(umu == 0.0):
        raise ValueError("user view cosines must be nonzero")
    nmode = eig.kk.shape[-3]
    nstr = tab.ylm.shape[1]
    n = tab.mu.shape[0]
    w = jnp.asarray(tab.w, dtype)
    parity = jnp.asarray(tab.parity, dtype)
    ylm_q = jnp.asarray(tab.ylm, dtype)

    # Legendre at user angles (host-side; includes sign via direct evaluation)
    ylm_u = jnp.asarray(legendre_assoc_norm(umu, nstr, nmode), dtype)  # [m,l,U]

    # scattering coefficients c_l = (w0/2)(2l+1) g_l : [..., L, l]
    twol1 = jnp.asarray(tab.twol1, dtype)
    c = 0.5 * dm.ssalb[..., None] * twol1 * dm.gl
    cm = c[..., None, :, :]   # add mode axis [..., 1, L, l]

    # --- source-projection moments ----------------------------------------
    wy = ylm_q * w[None, None, :]     # [m, l, i]
    # eigenmodes: chi[..., m, L, l, j]
    chi_dn = jnp.einsum("mli,...mLij->...mLlj", wy, eig.gp) + jnp.einsum(
        "ml,mli,...mLij->...mLlj", parity, wy, eig.gm
    )
    chi_up = jnp.einsum("mli,...mLij->...mLlj", wy, eig.gm) + jnp.einsum(
        "ml,mli,...mLij->...mLlj", parity, wy, eig.gp
    )
    # beam multiple-scatter: chi_z[..., m, L, l]
    chi_z = jnp.einsum("mli,...mLi->...mLl", wy, beam.zp) + jnp.einsum(
        "ml,mli,...mLi->...mLl", parity, wy, beam.zm
    )

    # source amplitude at user angles:  s = sum_l c_l Lam_l(u) chi_l
    sd = jnp.einsum("...mLl,mlu,...mLlj->...mLuj", cm, ylm_u, chi_dn)
    su = jnp.einsum("...mLl,mlu,...mLlj->...mLuj", cm, ylm_u, chi_up)
    sz = jnp.einsum("...mLl,mlu,...mLl->...mLu", cm, ylm_u, chi_z)

    # direct-beam pseudo source at user angles:
    # X0(u) = (F0 (2-delta_m0) / 2pi) sum_l c_l Lam_l(u) Lam_l(-mu0)
    from sbdart_tpu.solver.sources import _ylm_at

    ylm0 = _ylm_at(mu0, nmode, nstr, dtype)            # [..., m, l] at +mu0
    ylm0_down = ylm0 * parity[..., : nmode, :]         # at -mu0
    mfac = jnp.asarray(np.where(np.arange(nmode) == 0, 1.0, 2.0), dtype)
    x0u = jnp.einsum("...mLl,mlu,...ml->...mLu", cm, ylm_u, ylm0_down)
    beam_amp = jnp.where(fbeam > 0, fbeam, 0.0)[..., None, None, None] * (
        mfac[:, None, None] / (2.0 * jnp.pi)
    )
    sz_tot = sz + x0u * beam_amp                       # [..., m, L, U]

    # thermal source at user angles (mode 0 only): st0 + st1 * t'
    if thermal is not None:
        chi_y0 = jnp.einsum(
            "li,...Li->...Ll", wy[0], thermal.y0p
        ) + jnp.einsum("l,li,...Li->...Ll", parity[0], wy[0], thermal.y0m)
        chi_y1 = jnp.einsum(
            "li,...Li->...Ll", wy[0], thermal.y1p
        ) + jnp.einsum("l,li,...Li->...Ll", parity[0], wy[0], thermal.y1m)
        emis = (1.0 - dm.ssalb)
        b1 = (thermal.b_bot - thermal.b_top) / jnp.maximum(
            dm.dtau, slope_tau_floor(dtype)
        )
        st0_0 = (
            jnp.einsum("...Ll,lu,...Ll->...Lu", c, ylm_u[0], chi_y0)
            + (emis * thermal.b_top)[..., None]
        )
        st1_0 = (
            jnp.einsum("...Ll,lu,...Ll->...Lu", c, ylm_u[0], chi_y1)
            + (emis * b1)[..., None]
        )
        mode_mask = jnp.zeros((nmode, 1, 1), dtype).at[0].set(1.0)
        st0 = mode_mask * st0_0[..., None, :, :]
        st1 = mode_mask * st1_0[..., None, :, :]
    else:
        st0 = jnp.zeros(sz_tot.shape, dtype)
        st1 = jnp.zeros(sz_tot.shape, dtype)

    kk = eig.kk                                       # [..., m, L, N]
    dtau = dm.dtau                                    # [..., L]
    dtau_m = dtau[..., None, :, None]                 # [..., 1, L, 1]
    aa = sol.aa
    bb = sol.bb
    eb_top = expbea_s[..., None, :-1, None]           # [..., 1, L, 1]
    inv_mu0 = (1.0 / mu0)[..., None, None, None]

    mode0_vec = jnp.zeros((nmode,), dtype).at[0].set(1.0)

    uu_modes = []   # per-sign accumulation, combined later

    # ---------------- upward-looking angles (u > 0) -----------------------
    up_idx = np.where(umu > 0)[0]
    dn_idx = np.where(umu < 0)[0]

    def scan_up(u_vals: np.ndarray, s_sel):
        """Radiance recursion bottom->top for positive cosines u_vals."""
        sd_u, su_u, sz_u, st0_u, st1_u = s_sel
        u = jnp.asarray(u_vals, dtype)                # [Uu]
        uB = u[None, :, None]                          # [1(L), U, 1(N)] helper
        # per-layer integrals [..., m, L, U, N] / [..., m, L, U]
        int_dn = _int_toward(kk[..., None, :], dtau_m[..., None], uB)
        int_up = _int_away(kk[..., None, :], dtau_m[..., None], uB)
        e_lay = jnp.exp(-dtau_m / u[None, :])          # [..., 1, L, U] transmission
        int_beam = _int_toward(inv_mu0[..., None], dtau_m[..., None], uB)[..., 0]
        j_lay = (
            jnp.einsum("...mLj,...mLuj,...mLuj->...mLu", aa, sd_u, int_dn)
            + jnp.einsum("...mLj,...mLuj,...mLuj->...mLu", bb, su_u, int_up)
            + sz_u * eb_top * int_beam
            + st0_u * (1.0 - e_lay)
            + st1_u * (u[None, :] - (dtau_m + u[None, :]) * e_lay)
        )
        # surface start: reflection of the downwelling field + direct beam
        # + emission (Lambertian: mode 0 only; BRDF: all modes)
        wmu_j = jnp.asarray(tab.w * tab.mu, dtype)
        fdir_bot = mu0 * jnp.where(fbeam > 0, fbeam, 0.0) * expbea_s[..., -1]
        if brdf is None:
            fdn_bot = 2.0 * jnp.einsum(
                "j,...vj->...v", wmu_j, bounds.dn[..., 0, -1:, :]
            )[..., 0]
            i_surf0 = surf_emission + albedo * (fdir_bot / jnp.pi + fdn_bot)
            i_surf = (
                i_surf0[..., None, None] * mode0_vec[:, None] * jnp.ones_like(u)
            )
        else:
            from sbdart_tpu.solver.brdf import (
                fourier_refl_matrices,
                hemispherical_reflectance,
            )

            r_user = fourier_refl_matrices(
                brdf, u, jnp.asarray(tab.mu, dtype), nmode, dtype
            )                                              # [m, U, N]
            i_dn_bot = bounds.dn[..., -1, :]               # [..., m, N]
            refl_diff = jnp.einsum(
                "...muj,j,...mj->...mu", r_user, wmu_j, i_dn_bot
            )
            r_b = fourier_refl_matrices(
                brdf, u, mu0[..., None], nmode, dtype
            )[..., :, :, 0]                                # [..., m, U]
            mfac_m = jnp.asarray(
                np.where(np.arange(nmode) == 0, 1.0, 2.0), dtype
            )
            refl_beam = (
                r_b * mfac_m[:, None] / (2.0 * jnp.pi)
                * fdir_bot[..., None, None]
            )
            r_dh_u = hemispherical_reflectance(brdf, u, tab.w, tab.mu, dtype)
            bs = surf_emission / jnp.maximum(1.0 - albedo, 1e-12)
            emis = (1.0 - r_dh_u) * bs[..., None, None] * mode0_vec[:, None]
            i_surf = refl_diff + refl_beam + emis

        def step(carry, inp):
            j_l, e_l = inp
            i_next = carry * e_l + j_l
            return i_next, i_next

        # scan from bottom layer (L-1) to top: reverse the layer axis
        j_rev = jnp.moveaxis(j_lay, -2, 0)[::-1]       # [L, ..., m, U]
        e_rev = jnp.moveaxis(e_lay * jnp.ones_like(j_lay), -2, 0)[::-1]
        _, i_tops = jax.lax.scan(step, i_surf, (j_rev, e_rev))
        # i_tops[p] = radiance at boundary L-1-p ; assemble [..., m, L+1, U]
        i_bounds = jnp.concatenate([i_tops[::-1], i_surf[None]], axis=0)
        return jnp.moveaxis(i_bounds, 0, -2)

    def scan_dn(u_vals: np.ndarray, s_sel):
        """Radiance recursion top->bottom for negative cosines u_vals."""
        sd_u, su_u, sz_u, st0_u, st1_u = s_sel
        ub = jnp.asarray(np.abs(u_vals), dtype)
        uB = ub[None, :, None]
        int_dn = _int_away(kk[..., None, :], dtau_m[..., None], uB)
        int_up = _int_toward(kk[..., None, :], dtau_m[..., None], uB)
        e_lay = jnp.exp(-dtau_m / ub[None, :])
        # beam along the path: resonance-safe 'away' integral with k = 1/mu0
        int_beam = _int_away(inv_mu0[..., None], dtau_m[..., None], uB)[..., 0]
        j_lay = (
            jnp.einsum("...mLj,...mLuj,...mLuj->...mLu", aa, sd_u, int_dn)
            + jnp.einsum("...mLj,...mLuj,...mLuj->...mLu", bb, su_u, int_up)
            + sz_u * eb_top * int_beam
            + st0_u * (1.0 - e_lay)
            + st1_u * (dtau_m - ub[None, :] * (1.0 - e_lay))
        )
        i_top0 = (fisot + top_emission)[..., None, None] * mode0_vec[:, None]
        i_top = i_top0 * jnp.ones_like(ub)

        def step(carry, inp):
            j_l, e_l = inp
            i_next = carry * e_l + j_l
            return i_next, i_next

        j_s = jnp.moveaxis(j_lay, -2, 0)
        e_s = jnp.moveaxis(e_lay * jnp.ones_like(j_lay), -2, 0)
        _, i_bots = jax.lax.scan(step, i_top, (j_s, e_s))
        i_bounds = jnp.concatenate([i_top[None], i_bots], axis=0)
        return jnp.moveaxis(i_bounds, 0, -2)

    numu = len(umu)
    batchm = jnp.broadcast_shapes(
        sd.shape[:-4], sz_tot.shape[:-3]
    )
    out_parts = jnp.zeros(
        batchm + (nmode, dtau.shape[-1] + 1, numu), dtype
    )
    if len(up_idx) > 0:
        sel = (
            sd[..., up_idx, :], su[..., up_idx, :], sz_tot[..., up_idx],
            st0[..., up_idx], st1[..., up_idx],
        )
        i_up = scan_up(umu[up_idx], sel)
        out_parts = out_parts.at[..., list(up_idx)].set(
            jnp.broadcast_to(i_up, batchm + i_up.shape[-3:])
        )
    if len(dn_idx) > 0:
        sel = (
            sd[..., dn_idx, :], su[..., dn_idx, :], sz_tot[..., dn_idx],
            st0[..., dn_idx], st1[..., dn_idx],
        )
        i_dn = scan_dn(umu[dn_idx], sel)
        out_parts = out_parts.at[..., list(dn_idx)].set(
            jnp.broadcast_to(i_dn, batchm + i_dn.shape[-3:])
        )

    # ---------------- azimuth assembly ------------------------------------
    phi_r = jnp.asarray(np.deg2rad(phi), dtype)        # [P]
    marange = jnp.arange(nmode, dtype=dtype)
    # cos(m (phi0 - phi)) : [..., m, P]
    cosm = jnp.cos(
        marange[:, None] * (jnp.deg2rad(phi0)[..., None, None] - phi_r)
    )
    uu = jnp.einsum("...mvu,...mp->...vup", out_parts, cosm)

    if corint:
        uu = uu + _tms_correction(
            dm=dm, pmom_unscaled=pmom_unscaled, tau_s=tau_s,
            expbea_s=expbea_s, fbeam=fbeam, mu0=mu0, phi0=phi0,
            umu=umu, phi=phi, nstr=nstr, dtype=dtype,
        )
        if np.any(umu < 0):
            uu = uu - _ims_correction(
                dm=dm, pmom_unscaled=pmom_unscaled,
                ssalb_unscaled=ssalb_unscaled, tau_u=tau_u,
                fbeam=fbeam, mu0=mu0, phi0=phi0,
                umu=umu, phi=phi, nstr=nstr, dtype=dtype,
            )
    return uu


def _legendre_at(x: jnp.ndarray, nmom: int) -> jnp.ndarray:
    """P_l(x) for l = 0..nmom-1 stacked on a new leading axis (traced x)."""
    p0 = jnp.ones_like(x)
    if nmom == 1:
        return p0[None]
    p1 = x
    out = [p0, p1]
    for l in range(1, nmom - 1):
        p2 = ((2 * l + 1) * x * p1 - l * p0) / (l + 1)
        p0, p1 = p1, p2
        out.append(p2)
    return jnp.stack(out, axis=0)


def _tms_correction(
    *, dm: DeltaMResult, pmom_unscaled, tau_s, expbea_s, fbeam, mu0, phi0,
    umu: np.ndarray, phi: np.ndarray, nstr: int, dtype,
) -> jnp.ndarray:
    """Nakajima–Tanaka TMS: replace the truncated single-scatter radiance
    with the exact-phase single-scatter radiance (both with delta-M scaled
    attenuation).  Returns duu[..., L+1, U, P]."""
    nmom = pmom_unscaled.shape[-1]
    umu_j = jnp.asarray(umu, dtype)                      # [U]
    phi_r = jnp.asarray(np.deg2rad(phi), dtype)          # [P]
    su = jnp.sqrt(jnp.clip(1.0 - umu_j**2, 0.0, 1.0))
    s0 = jnp.sqrt(jnp.clip(1.0 - mu0**2, 0.0, 1.0))
    # cos(scattering angle) [..., U, P]
    cosang = (
        -mu0[..., None, None] * umu_j[:, None]
        + s0[..., None, None]
        * su[:, None]
        * jnp.cos(jnp.deg2rad(phi0)[..., None, None] - phi_r[None, :])
    )
    pl = _legendre_at(cosang, nmom)                      # [lmax, ..., U, P]
    twol1_full = jnp.asarray(2.0 * np.arange(nmom) + 1.0, dtype)

    # exact phase / (1-f)  minus truncated scaled phase, per layer
    # p_exact_l = pmom_unscaled ; p_trunc uses dm.gl (l < nstr)
    f = dm.f[..., None]                                   # [..., L, 1]
    coef_ex = twol1_full * pmom_unscaled / (1.0 - f)      # [..., L, lmax]
    coef_tr = jnp.zeros_like(coef_ex).at[..., :nstr].set(twol1_full[:nstr] * dm.gl)
    dcoef = coef_ex - coef_tr
    # dP[..., L, U, P] = sum_l dcoef_l P_l(cosang)
    dphase = jnp.einsum("...Ll,l...up->...Lup", dcoef, pl)

    w0s = dm.ssalb[..., None, None]                       # scaled ssalb
    amp = jnp.where(fbeam > 0, fbeam, 0.0)[..., None, None, None] / (4.0 * jnp.pi)
    src = amp * w0s * dphase                              # [..., L, U, P]

    dtau = dm.dtau
    dtau_b = dtau[..., None, None]
    eb_top = expbea_s[..., :-1, None, None]
    inv_mu0 = (1.0 / mu0)[..., None, None, None]

    up_idx = np.where(umu > 0)[0]
    dn_idx = np.where(umu < 0)[0]
    nlyr = dtau.shape[-1]
    out = jnp.zeros(src.shape[:-3] + (nlyr + 1, len(umu), len(phi)), dtype)

    def scan_generic(idx, downward: bool):
        u_abs = jnp.asarray(np.abs(umu[idx]), dtype)
        uB = u_abs[:, None]                               # [U, 1(P)]
        e_lay = jnp.exp(-dtau_b / uB)                     # [..., L, U, P]
        if downward:
            integ = _int_away(inv_mu0, dtau_b, uB)
        else:
            integ = _int_toward(inv_mu0, dtau_b, uB)
        j_lay = src[..., idx, :] * eb_top * integ
        start = jnp.zeros(j_lay.shape[:-3] + j_lay.shape[-2:], dtype)
        j_s = jnp.moveaxis(j_lay, -3, 0)
        e_s = jnp.moveaxis(e_lay * jnp.ones_like(j_lay), -3, 0)
        if not downward:
            j_s, e_s = j_s[::-1], e_s[::-1]

        def step(carry, inp):
            j_l, e_l = inp
            nxt = carry * e_l + j_l
            return nxt, nxt

        _, acc = jax.lax.scan(step, start, (j_s, e_s))
        if downward:
            bounds_i = jnp.concatenate([start[None], acc], axis=0)
        else:
            bounds_i = jnp.concatenate([acc[::-1], start[None]], axis=0)
        return jnp.moveaxis(bounds_i, 0, -3)

    if len(up_idx) > 0:
        out = out.at[..., list(up_idx), :].set(scan_generic(up_idx, downward=False))
    if len(dn_idx) > 0:
        out = out.at[..., list(dn_idx), :].set(scan_generic(dn_idx, downward=True))
    return out


def xi_function(u1, u2, u3, tau):
    """Chi function of secondary scattering (disort.f:XIFUNC, STWL eq. 72),
    specialised to the IMS use u2 == u3 (the only call site), resonance-safe.

    Xi(u1, u2, u2, tau) = ((tau - 1/x1) e^{-tau/u2} + e^{-tau/u1}/x1)
                          / (x1 u1 u2),   x1 = 1/u1 - 1/u2,
    with the u1 -> u2 limit tau^2 e^{-tau/u1} / (2 u1 u2).
    """
    x1 = 1.0 / u1 - 1.0 / u2
    near = jnp.abs(x1 * jnp.maximum(u1, u2)) < 1e-4
    safe_x1 = jnp.where(near, 1.0, x1)
    e1 = jnp.exp(-tau / u1)
    e2 = jnp.exp(-tau / u2)
    exact = ((tau - 1.0 / safe_x1) * e2 + e1 / safe_x1) / (safe_x1 * u1 * u2)
    # Taylor in x1 about 0: tau^2 e1 / (2 u1 u2) * (1 - tau x1 / 3)
    taylor = tau * tau * e1 / (2.0 * u1 * u2) * (1.0 - tau * x1 / 3.0)
    return jnp.where(near, taylor, exact)


def _ims_correction(
    *, dm: DeltaMResult, pmom_unscaled, ssalb_unscaled, tau_u, fbeam, mu0,
    phi0, umu: np.ndarray, phi: np.ndarray, nstr: int, dtype,
) -> jnp.ndarray:
    """Nakajima–Tanaka IMS secondary-scattering correction (disort.f:SECSCA,
    STWL eq. A7/A13): the delta-M spike over-counts secondary scattering of
    the forward peak for downward-viewing radiances near the aureole; this
    term (to be SUBTRACTED from uu) removes it.  Returns duu[..., L+1, U, P]
    that is zero at upward-viewing angles.

    All quantities use UNSCALED optical properties, vertically averaged from
    the top down to each output boundary, exactly as the reference does.
    """
    nmom = pmom_unscaled.shape[-1]
    nlyr = dm.f.shape[-1]
    umu_j = jnp.asarray(umu, dtype)
    phi_r = jnp.asarray(np.deg2rad(phi), dtype)
    su = jnp.sqrt(jnp.clip(1.0 - umu_j**2, 0.0, 1.0))
    s0 = jnp.sqrt(jnp.clip(1.0 - mu0**2, 0.0, 1.0))
    cosang = (
        -mu0[..., None, None] * umu_j[:, None]
        + s0[..., None, None]
        * su[:, None]
        * jnp.cos(jnp.deg2rad(phi0)[..., None, None] - phi_r[None, :])
    )
    pl = _legendre_at(cosang, nmom)                     # [lmax, ..., U, P]
    twol1_full = jnp.asarray(2.0 * np.arange(nmom) + 1.0, dtype)

    def cum0(x):
        c = jnp.cumsum(x, axis=-1)
        return jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)

    w = jnp.asarray(ssalb_unscaled, dtype)
    dt = jnp.asarray(dm.dtau_unscaled, dtype)
    wbar_c = cum0(w * dt)                                # [..., L+1]
    fbar_c = cum0(w * dm.f * dt)
    stau = tau_u                                         # [..., L+1]
    tiny = 1e-30
    fbar = fbar_c / jnp.maximum(wbar_c, tiny)
    wbar = wbar_c / jnp.maximum(stau, tiny)
    fw = jnp.clip(fbar * wbar, 0.0, 1.0 - 1e-6)

    # layer-averaged spike moments gbar_K for K >= nstr (gbar = 1 below)
    gbar_c = cum0(
        (pmom_unscaled * (w * dt)[..., None]).swapaxes(-1, -2)
    ).swapaxes(-1, -2)                                   # [..., L+1, nmom]
    denom = jnp.maximum(fbar_c, tiny)[..., None]
    gbar = jnp.clip(gbar_c / denom, 0.0, 1.0)
    kmask = jnp.asarray(np.arange(nmom) >= nstr, dtype)
    gfac = jnp.where(kmask > 0, 2.0 * gbar - gbar * gbar, 1.0)

    # pspike[..., v, U, P] = sum_K gfac_K (2K+1) P_K(cosang)
    pspike = jnp.einsum("...vl,l...up->...vup", gfac * twol1_full, pl)

    umu0p = mu0[..., None] / (1.0 - fw)                  # [..., L+1]
    dn = umu_j < 0
    u1 = jnp.where(dn, -umu_j, 1.0)                      # [U]
    xi = xi_function(
        u1[:, None], umu0p[..., None, None], umu0p[..., None, None],
        stau[..., None, None],
    )                                                    # [..., v, U, 1]

    amp = (
        jnp.where(fbeam > 1e-4, fbeam, 0.0)[..., None, None, None]
        / (4.0 * jnp.pi)
        * (fw * fw / jnp.maximum(1.0 - fw, 1e-6))[..., None, None]
    )
    ok = (
        (wbar_c > 1e-4) & (fbar_c > 1e-4) & (stau > 1e-4)
    )[..., None, None]
    duu = jnp.where(ok & dn[:, None], amp * pspike * xi, 0.0)
    return duu.astype(dtype)
