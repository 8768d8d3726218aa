"""Lane-resident RADIANCE path: all Fourier modes in one lane layout.

The generic solve_rte radiance path (solver/disort.py + radiance.py) runs
every stage batch-major and relayouts the big per-(mode, layer) tensors at
each stage boundary: scattering-matrix einsum -> to_lane for the eig
kernel -> from_lane -> _to_scan_lane for the BVP kernel -> batch-major ->
_to_scan_lane again for boundary intensities -> batch-major radiance
einsums.  At the BASELINE config-4 shape (nstr=16, 65 layers) those
relayouts + the batch-major einsum fusions cost ~25 ms of a 44 ms solve —
measured from a jax.profiler device trace (round 4), with the two Pallas
kernels accounting for only ~19 ms.

This module runs the whole radiance solve in ONE flat lane order: the
minor (lane) axis is the flattened (mode, layer, column) product for the
eigensolve+beam kernel and (mode, column) with layers leading for the BVP
kernel — the reshape between the two moves only leading axes (the lane dim
stays put), which XLA emits as a near-bandwidth copy.  The radiance
source-function projections and per-layer path integrals run as a THIRD
fused kernel (pallas/radsrc.py) whose intermediates never leave VMEM, and
the azimuth Fourier sum is folded into the per-layer source before the
path recursion (the per-layer transmission is mode-independent), so the
layer scans carry nphi azimuths instead of nstr modes.  Measured end
state (round 5): ~15.7 ms/solve device time at the bench shape —
eig+beam 6.7 ms (3 Jacobi sweeps, the measured convergence point),
block-Thomas 5.2 ms (rank-N factor history), radsrc 0.9 ms, glue
~2.9 ms spread over many small relayout fusions (largest single op
0.3 ms) — vs ~60 ms generic in round 3.

Engaged from solve_rte for: radiance runs (onlyfl=False, umu given),
Lambertian OR BRDF surface (round 5: per-mode Fourier reflection
matrices feed the same BVP kernel; the surface radiance start reflects
the all-mode surface downwelling field), f32, N = nstr/2 even and <= 8,
all nstr modes, on TPU (or interpret for tests).  Everything else falls
back to the generic path (cost table in docs/USERGUIDE.md); equivalence
is pinned by tests/test_radlane.py (interpret mode vs the generic path,
BRDF solar+thermal cases, a TPU-gated cross-path case, and TPU-gated
padding-consistency cases at unaligned batches).

Reference map: DISORT's per-mode loop (SOLEIG + UPBEAM + SETMTX + SOLVE0 +
USRINT/CMPINT per m, then the cos(m dphi) Fourier sum — disort.f, SURVEY.md
section 3.2 steps 3-6) re-expressed as two fused TPU kernels over a
modes-in-lanes batch plus lane-layout XLA glue.  TMS/IMS single-scatter
corrections (INTCOR/SECSCA) reuse solver/radiance.py unchanged — they are
single-scatter (no mode structure) and measured cheap.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sbdart_tpu.constants import slope_tau_floor
from sbdart_tpu.solver.deltam import apply_deltam
from sbdart_tpu.solver.eig import angular_tables
from sbdart_tpu.solver.planck import planck_band
from sbdart_tpu.solver.radiance import (
    _ims_correction,
    _int_away,
    _int_toward,
    _tms_correction,
)
from sbdart_tpu.solver.sources import _ylm_at, thermal_particular


def _to_scan(x, nl_axis_from_end=1):
    """[batch..., L] -> [L, B] (or [batch..., L, k] -> [L, k, B])."""
    if nl_axis_from_end == 1:
        x = jnp.moveaxis(x, -1, 0)
        return x.reshape(x.shape[0], -1)
    x = jnp.moveaxis(x, -2, 0)
    x = x.reshape(x.shape[0], -1, x.shape[-1])
    return jnp.moveaxis(x, -1, 1)


def solve_rte_radiance_lane(
    dtauc, ssalb_in, pmom, *,
    nstr, fbeam, umu0, phi0, fisot, albedo,
    planck, temper, wvnlo, wvnhi, btemp, ttemp, temis,
    deltam, umu, phi, corint, dtype, brdf=None, interpret=False,
):
    """Radiance-mode solve, lane-resident.  Inputs batch-major and already
    broadcast (as in solve_rte); returns RteOutputs with uu filled."""
    from sbdart_tpu.pallas.blocktri import block_thomas_rt
    from sbdart_tpu.pallas.eig import eig_beam_chain_lane_fused
    from sbdart_tpu.solver.disort import RteOutputs

    n = nstr // 2
    nm = nstr                       # all azimuth Fourier modes, branchless
    nlyr = dtauc.shape[-1]
    batch = dtauc.shape[:-1]
    bc = int(np.prod(batch)) if batch else 1
    tab = angular_tables(nstr, nm)
    mu = jnp.asarray(tab.mu, dtype)
    w = jnp.asarray(tab.w, dtype)
    wmu = w * mu
    umu = np.asarray(umu, np.float64)
    phi = np.asarray(phi, np.float64)
    if np.any(umu == 0.0):
        raise ValueError("user view cosines must be nonzero")
    numu = len(umu)
    nphi = len(phi)

    # ---- optical scaling (SETDIS) -- batch-major, small tensors ----------
    dm = apply_deltam(dtauc, ssalb_in, pmom, nstr, deltam)
    tau_s = jnp.cumsum(dm.dtau, axis=-1)
    tau_s = jnp.concatenate([jnp.zeros_like(tau_s[..., :1]), tau_s], axis=-1)
    tau_u = jnp.cumsum(dm.dtau_unscaled, axis=-1)
    tau_u = jnp.concatenate([jnp.zeros_like(tau_u[..., :1]), tau_u], axis=-1)

    has_beam = fbeam > 0.0
    mu0 = jnp.where(has_beam, jnp.abs(umu0), 0.5)
    expbea_s = jnp.where(
        has_beam[..., None], jnp.exp(-tau_s / mu0[..., None]), 0.0
    )
    expbea_u = jnp.where(
        has_beam[..., None], jnp.exp(-tau_u / mu0[..., None]), 0.0
    )

    # ---- scattering coefficients: one lane tensor [nstr, L, Bc] ----------
    twol1 = jnp.asarray(tab.twol1, dtype)
    c = 0.5 * dm.ssalb[..., None] * twol1 * dm.gl       # [.., L, nstr]
    c_scan = _to_scan(c, 2)                             # [L, nstr, Bc]
    c3 = jnp.moveaxis(c_scan, 1, 0)                     # [nstr, L, Bc]

    # static per-mode angular products
    ylm_np = np.asarray(tab.ylm, np.float64)            # [M, nstr, N]
    par_np = np.asarray(tab.parity, np.float64)         # [M, nstr]
    ylm_j = jnp.asarray(ylm_np, dtype)
    par_j = jnp.asarray(par_np, dtype)
    a_pp = jnp.asarray(
        ylm_np[:, :, :, None] * ylm_np[:, :, None, :], dtype
    )                                                   # [M, l, N, N]
    a_pm = a_pp * par_j[:, :, None, None]

    # all-modes folded scattering matrices DIRECTLY in (M, L, Bc) lane order
    c_flat = c3.reshape(nstr, nlyr * bc)                # [nstr, L*Bc]
    cppl = jnp.einsum("mlij,lB->ijmB", a_pp, c_flat).reshape(n, n, -1)
    cpml = jnp.einsum("mlij,lB->ijmB", a_pm, c_flat).reshape(n, n, -1)

    # ---- beam RHS in (M, L, Bc) lane order -------------------------------
    ylm0 = _ylm_at(mu0, nm, nstr, dtype)                # [batch.., m, l]
    y0d = ylm0 * par_j                                  # Lam_l^m(-mu0)
    y0d_l = jnp.moveaxis(
        y0d.reshape((bc, nm, nstr)), 0, -1
    )                                                   # [m, l, Bc]
    mfac = jnp.asarray(np.where(np.arange(nm) == 0, 1.0, 2.0), dtype)
    scale = (jnp.where(has_beam, fbeam, 0.0) / (2.0 * jnp.pi)).reshape(bc)
    x0p = jnp.einsum("mli,lSB,mlB->imSB", ylm_j, c3, y0d_l)
    x0m = jnp.einsum("ml,mli,lSB,mlB->imSB", par_j, ylm_j, c3, y0d_l)
    amp = mfac[None, :, None, None] * scale[None, None, None, :]
    x0p = x0p * amp
    x0m = x0m * amp
    inv_mu_col = (1.0 / mu)[:, None, None, None]
    r1 = ((x0p + x0m) * inv_mu_col).reshape(n, -1)      # [N, M*L*Bc]
    r2 = ((x0p - x0m) * inv_mu_col).reshape(n, -1)
    mu0_f = jnp.broadcast_to(
        mu0.reshape(bc), (nm, nlyr, bc)
    ).reshape(1, -1).astype(dtype)

    kk_l, gp_l, gm_l, zp_l, zm_l = eig_beam_chain_lane_fused(
        cppl, cpml, r1, r2, mu0_f, tab.mu, tab.w, interpret=interpret
    )

    # ---- reshape kernel outputs to scan-lane [L, *, M*Bc] ----------------
    mb = nm * bc

    def unflat(x):
        # [..., M*L*Bc] -> [L, ..., M*Bc]; the minor (lane) dim stays put
        y = x.reshape(x.shape[:-1] + (nm, nlyr, bc))
        y = jnp.moveaxis(y, -2, 0)                      # [L, ..., M, Bc]
        return y.reshape((nlyr,) + x.shape[:-1] + (mb,))

    kk = unflat(kk_l)                                   # [L, N, MB]
    gp = unflat(gp_l)                                   # [L, N, N, MB]
    gm = unflat(gm_l)
    zp = unflat(zp_l)
    zm = unflat(zm_l)

    dtau_scan = _to_scan(dm.dtau)                       # [L, Bc]
    dtau_mb = jnp.broadcast_to(
        dtau_scan[:, None, :], (nlyr, nm, bc)
    ).reshape(nlyr, mb)
    ee = jnp.exp(-kk * dtau_mb[:, None, :])             # [L, N, MB]

    # ---- particular solution at layer bounds -----------------------------
    eb = _to_scan(expbea_s)                             # [L+1, Bc]
    eb_mb = jnp.broadcast_to(
        eb[:, None, :], (nlyr + 1, nm, bc)
    ).reshape(nlyr + 1, mb)
    p_tu = zp * eb_mb[:-1, None, :]
    p_td = zm * eb_mb[:-1, None, :]
    p_bu = zp * eb_mb[1:, None, :]
    p_bd = zm * eb_mb[1:, None, :]

    alb_flat = albedo.reshape(bc).astype(dtype)
    surf_emission = jnp.zeros(batch, dtype)
    top_emission = jnp.zeros(batch, dtype)
    b_level = None
    thermal = None
    if planck:
        planck_dtype = jnp.float32
        wvnlo_b = jnp.broadcast_to(jnp.asarray(wvnlo, dtype), batch)
        wvnhi_b = jnp.broadcast_to(jnp.asarray(wvnhi, dtype), batch)
        b_level = planck_band(
            wvnlo_b[..., None], wvnhi_b[..., None], temper, planck_dtype
        ).astype(dtype)
        # thermal particular is azimuth-mode-0 only: the batch-major einsum
        # from c is the marginal cost (LW bands have no beam competition)
        ylm0_j = jnp.asarray(ylm_np[0], dtype)          # [nstr, N]
        par0_j = jnp.asarray(par_np[0], dtype)
        cpp_bm = jnp.einsum("...Ll,li,lj->...Lij", c, ylm0_j, ylm0_j)
        cpm_bm = jnp.einsum(
            "...Ll,l,li,lj->...Lij", c, par0_j, ylm0_j, ylm0_j
        )
        tab0 = angular_tables(nstr, 1)
        thermal = thermal_particular(
            cpp_bm, cpm_bm, dm.ssalb, dm.dtau, b_level, tab0, dtype
        )
        d_scan = dtau_scan[:, None, :]
        y0p_s = _to_scan(thermal.y0p, 2)                # [L, N, Bc]
        y0m_s = _to_scan(thermal.y0m, 2)
        y1p_s = _to_scan(thermal.y1p, 2)
        y1m_s = _to_scan(thermal.y1m, 2)

        def add_mode0(p, extra):
            p4 = p.reshape(nlyr, n, nm, bc)
            return p4.at[:, :, 0, :].add(extra).reshape(nlyr, n, mb)

        p_tu = add_mode0(p_tu, y0p_s)
        p_td = add_mode0(p_td, y0m_s)
        p_bu = add_mode0(p_bu, y0p_s + y1p_s * d_scan)
        p_bd = add_mode0(p_bd, y0m_s + y1m_s * d_scan)
        btemp_b = jnp.broadcast_to(jnp.asarray(btemp, dtype), batch)
        ttemp_b = jnp.broadcast_to(jnp.asarray(ttemp, dtype), batch)
        btemp_eff = jnp.where(btemp_b > 0, btemp_b, temper[..., -1])
        ttemp_eff = jnp.where(ttemp_b > 0, ttemp_b, temper[..., 0])
        surf_emission = (
            (1.0 - albedo)
            * planck_band(wvnlo_b, wvnhi_b, btemp_eff, planck_dtype
                          ).astype(dtype)
        )
        top_emission = (
            jnp.broadcast_to(jnp.asarray(temis, dtype), batch)
            * planck_band(wvnlo_b, wvnhi_b, ttemp_eff, planck_dtype
                          ).astype(dtype)
        )

    # ---- surface operators ------------------------------------------------
    # Lambertian: azimuth mode 0 only; BRDF (round 5): per-mode Fourier
    # reflection matrices feed the SAME BVP kernel (it takes a general
    # refl_op), so the lane path no longer falls back to the generic
    # solver for lamber=.false. radiance runs
    beam_flux_surf = mu0 * jnp.where(has_beam, fbeam, 0.0) * expbea_s[..., -1]
    mode0 = jnp.zeros((nm,), dtype).at[0].set(1.0)
    if brdf is None:
        refl_op = (
            2.0 * alb_flat[None, None, None, :]
            * wmu[None, :, None, None]
            * mode0[None, None, :, None]
            * jnp.ones((n, 1, 1, 1), dtype)
        ).reshape(n, n, mb)                              # [N, N, MB]
        bref = (
            ((albedo / jnp.pi) * beam_flux_surf).reshape(bc)[None, None, :]
            * mode0[None, :, None]
            * jnp.ones((n, 1, 1), dtype)
        ).reshape(n, mb)
        semis = (
            surf_emission.reshape(bc)[None, None, :]
            * mode0[None, :, None]
            * jnp.ones((n, 1, 1), dtype)
        ).reshape(n, mb)
    else:
        from sbdart_tpu.solver.brdf import (
            fourier_refl_matrices,
            hemispherical_reflectance,
        )

        r_m = fourier_refl_matrices(brdf, mu, mu, nm, dtype)   # [m, N, N]
        refl_op = jnp.broadcast_to(
            (jnp.moveaxis(r_m, 0, -1) * wmu[None, :, None])[:, :, :, None],
            (n, n, nm, bc),
        ).reshape(n, n, mb)                              # R[i,j] w_j mu_j
        r_beam = fourier_refl_matrices(
            brdf, mu, mu0.reshape(bc)[:, None], nm, dtype
        )[..., 0]                                        # [bc, m, N]
        bref = jnp.transpose(
            r_beam * mfac[None, :, None] / (2.0 * jnp.pi)
            * beam_flux_surf.reshape(bc)[:, None, None],
            (2, 1, 0),
        ).reshape(n, mb)
        if planck:
            r_dh = hemispherical_reflectance(brdf, mu, tab.w, tab.mu, dtype)
            bs_surf = surf_emission.reshape(bc) / jnp.maximum(
                1.0 - alb_flat, 1e-12
            )
            semis_vec = (1.0 - r_dh)[:, None] * bs_surf[None, :]   # [N, bc]
        else:
            semis_vec = jnp.zeros((n, bc), dtype)
        semis = (semis_vec[:, None, :] * mode0[None, :, None]).reshape(n, mb)
    iso = (
        (jnp.broadcast_to(jnp.asarray(fisot, dtype), batch) + top_emission)
        .reshape(bc)[None, :] * mode0[:, None]
    ).reshape(mb)

    # ---- BVP rhs + solve (SETMTX/SOLVE0, all modes) ----------------------
    r_top0 = iso[None, :] - p_td[0]
    r_topl = p_bd[:-1] - p_td[1:]
    r_top = jnp.concatenate([r_top0[None], r_topl], axis=0)
    r_botl = p_tu[1:] - p_bu[:-1]
    refl_part = jnp.sum(refl_op * p_bd[-1][None, :, :], axis=1)
    r_botL = semis + bref + refl_part - p_bu[-1]
    r_bot = jnp.concatenate([r_botl, r_botL[None]], axis=0)
    rhs = jnp.concatenate([r_top, r_bot], axis=1)       # [L, 2N, MB]

    xs = block_thomas_rt(gp, gm, ee, refl_op, rhs, interpret=interpret)
    a = xs[:, :n]                                       # [L, N, MB]
    b = xs[:, n:]

    # ---- boundary intensities, MODE 0 ONLY (FLUXES equivalent) -----------
    # Fluxes and the Lambertian-surface radiance start need only the
    # azimuth-mode-0 boundary field; slicing before the matvecs saves the
    # full-mode evaluation (measured ~8 ms at the bench shape — it was 11%
    # of the round-4 first-cut solve).
    def m0(x):
        return x.reshape(x.shape[:-1] + (nm, bc))[..., 0, :]

    gp0 = m0(gp)                                        # [L, N, N, Bc]
    gm0 = m0(gm)
    ee0 = m0(ee)                                        # [L, N, Bc]
    a0 = m0(a)
    b0 = m0(b)
    e_col0 = ee0[:, None, :, :]

    def mv(m_, v_):
        return jnp.sum(m_ * v_[:, None, :, :], axis=2)

    top_up = mv(gp0, a0) + mv(gm0 * e_col0, b0)
    top_dn = mv(gm0, a0) + mv(gp0 * e_col0, b0)
    bot_up = mv(gp0 * e_col0, a0) + mv(gm0, b0)
    bot_dn = mv(gm0 * e_col0, a0) + mv(gp0, b0)
    up0 = jnp.concatenate(
        [top_up + m0(p_tu), (bot_up + m0(p_bu))[-1:]], axis=0
    )                                                   # [L+1, N, Bc]
    dn0 = jnp.concatenate(
        [top_dn + m0(p_td), (bot_dn + m0(p_bd))[-1:]], axis=0
    )

    fup = 2.0 * jnp.pi * jnp.einsum("j,vjB->vB", wmu, up0)
    fdn_diff = 2.0 * jnp.pi * jnp.einsum("j,vjB->vB", wmu, dn0)

    eb_u = _to_scan(expbea_u)                           # [L+1, Bc]
    beam_f = jnp.where(has_beam, fbeam, 0.0).reshape(bc)[None, :]
    mu0_b = jnp.abs(umu0).reshape(bc)[None, :]
    fdir_scaled = mu0_b * beam_f * eb
    rfldir = mu0_b * beam_f * eb_u
    rfldn = fdn_diff + fdir_scaled - rfldir

    uavg = (
        0.5 * jnp.einsum("j,vjB->vB", w, up0 + dn0)
        + beam_f * eb / (4.0 * jnp.pi)
    )
    ssl = jnp.concatenate([ssalb_in, ssalb_in[..., -1:]], axis=-1)
    ssl_scan = _to_scan(ssl)
    if b_level is None:
        src = uavg
    else:
        src = uavg - _to_scan(b_level)
    dfdt = 4.0 * jnp.pi * (1.0 - ssl_scan) * src

    def to_bm(x):
        return jnp.moveaxis(x, 0, -1).reshape(batch + (nlyr + 1,))

    # ---- radiance source projections: ONE fused kernel -------------------
    # Per-(mode, layer, column) lane, the kernel builds the user-angle
    # source amplitudes from the static Legendre tables and immediately
    # contracts them with the analytic path integrals — the [U, N, M, L, B]
    # intermediates that cost ~28 ms as XLA fusions never leave VMEM
    # (pallas/radsrc.py).
    from sbdart_tpu.pallas.radsrc import rad_source_lane
    from sbdart_tpu.solver.legendre import legendre_assoc_norm

    ylm_u_np = legendre_assoc_norm(umu, nstr, nm)       # [m, l, U]
    wy_np = ylm_np * np.asarray(tab.w)[None, None, :]   # [m, l, i]
    t1_np = ylm_u_np[:, :, :, None] * wy_np[:, :, None, :]  # [m,l,U,i]
    t2_np = t1_np * par_np[:, :, None, None]
    t1 = jnp.asarray(np.moveaxis(t1_np, 1, 3), dtype)   # [m, U, i, l]
    t2 = jnp.asarray(np.moveaxis(t2_np, 1, 3), dtype)
    yu = jnp.asarray(np.moveaxis(ylm_u_np, 1, 2), dtype)  # [m, U, l]

    lb = nlyr * bc

    def mlead(x, d):
        """Kernel-output [d.., M*L*Bc] -> [M, d.., LB] (leading-axis move)."""
        y = x.reshape(x.shape[:-1] + (nm, lb))
        return jnp.moveaxis(y, -2, 0)

    gp_k = mlead(gp_l, 2)                               # [M, N, N, LB]
    gm_k = mlead(gm_l, 2)
    kk_k = mlead(kk_l, 1)                               # [M, N, LB]
    zp_k = mlead(zp_l, 1)
    zm_k = mlead(zm_l, 1)
    # BVP amplitudes from scan layout [L, N, (M, Bc)] -> [M, N, (L, Bc)]
    a_k = jnp.transpose(
        a.reshape(nlyr, n, nm, bc), (2, 1, 0, 3)
    ).reshape(nm, n, lb)
    b_k = jnp.transpose(
        b.reshape(nlyr, n, nm, bc), (2, 1, 0, 3)
    ).reshape(nm, n, lb)
    y0d_k = jnp.broadcast_to(
        y0d_l[:, :, None, :], (nm, nstr, nlyr, bc)
    ).reshape(nm, nstr, lb)
    c_k = c3.reshape(nstr, lb)
    dtau_k = dtau_scan.reshape(1, lb)
    ebtop_k = eb[:-1].reshape(1, lb)
    mu0_k = jnp.broadcast_to(
        mu0.reshape(bc)[None, :], (nlyr, bc)
    ).reshape(1, lb).astype(dtype)
    scale_k = jnp.broadcast_to(
        scale[None, :], (nlyr, bc)
    ).reshape(1, lb).astype(dtype)

    j_all = rad_source_lane(
        t1, t2, yu, c_k, y0d_k, gp_k, gm_k, kk_k, zp_k, zm_k, a_k, b_k,
        dtau_k, ebtop_k, mu0_k, scale_k, umu, interpret=interpret,
    )                                                   # [M, U, LB]
    j_modes_r = j_all.reshape(nm, numu, nlyr, bc)

    # thermal source at user angles (mode 0 only): st0 + st1 * t'
    if thermal is not None:
        # chi_y[l, L, Bc] = sum_i wy0[l,i] y0p[L,i,Bc] + par0 wy0 y0m
        wy0 = jnp.asarray(wy_np[0], dtype)              # [l, i]
        wy0p = wy0 * par0_j[:, None]
        chi_y0 = (jnp.einsum("li,SiB->lSB", wy0, y0p_s)
                  + jnp.einsum("li,SiB->lSB", wy0p, y0m_s))
        chi_y1 = (jnp.einsum("li,SiB->lSB", wy0, y1p_s)
                  + jnp.einsum("li,SiB->lSB", wy0p, y1m_s))
        ylm_u0 = jnp.asarray(ylm_u_np[0], dtype)        # [l, U]
        emis_s = 1.0 - _to_scan(dm.ssalb)               # [L, Bc]
        btop_s = _to_scan(thermal.b_top)
        bbot_s = _to_scan(thermal.b_bot)
        b1_s = (bbot_s - btop_s) / jnp.maximum(
            dtau_scan, slope_tau_floor(dtype)
        )
        st0_0 = (jnp.einsum("lSB,lu,lSB->SuB", c3, ylm_u0, chi_y0)
                 + (emis_s * btop_s)[:, None, :])
        st1_0 = (jnp.einsum("lSB,lu,lSB->SuB", c3, ylm_u0, chi_y1)
                 + (emis_s * b1_s)[:, None, :])
        # azimuth mode 0 only; cos(0) = 1 so these add p-broadcast below
        st0 = st0_0[:, :, None, :]                      # [L, U, 1(P), Bc]
        st1 = st1_0[:, :, None, :]
    else:
        st0 = jnp.zeros((nlyr, numu, 1, bc), dtype)
        st1 = jnp.zeros((nlyr, numu, 1, bc), dtype)

    # ---- per-angle path recursion (USRINT/CMPINT) ------------------------
    dtau_r = dtau_scan[:, None, None, None, :]          # [L, 1(U), 1, 1, Bc]

    up_idx = np.where(umu > 0)[0]
    dn_idx = np.where(umu < 0)[0]

    fdir_bot = (mu0 * jnp.where(has_beam, fbeam, 0.0)).reshape(bc) \
        * eb[-1]                                        # [Bc]
    i_top0 = (jnp.broadcast_to(jnp.asarray(fisot, dtype), batch)
              .reshape(bc) + top_emission.reshape(bc))

    # The azimuth Fourier sum uu = sum_m I_m cos(m (phi0 - phi)) commutes
    # with the layer recursion because the per-layer transmission e_lay is
    # MODE-INDEPENDENT: fold cos(m dphi) into the per-layer source BEFORE
    # the scan, shrinking the scan payload and outputs from nm (=nstr)
    # azimuth modes to nphi view azimuths.  Mode-0-only terms (thermal,
    # boundary starts) pass through with cos(0) = 1 as a p-broadcast.
    phi_r = jnp.asarray(np.deg2rad(phi), dtype)         # [P]
    marange = jnp.arange(nm, dtype=dtype)
    phi0_b = jnp.broadcast_to(jnp.asarray(phi0, dtype), batch).reshape(bc)
    cosm = jnp.cos(
        marange[:, None, None]
        * (jnp.deg2rad(phi0_b)[None, None, :] - phi_r[None, :, None])
    )                                                   # [M, P, Bc]

    # fold the azimuth sum into the kernel's per-mode source, add the
    # (mode-0-only) thermal terms, then run the layer recursions on the
    # small [L, U, P, Bc] payload
    jt = jnp.einsum("muSB,mpB->SupB", j_modes_r, cosm)  # [L, U, P, Bc]

    # ---- surface radiance start for the upward scans ---------------------
    # Lambertian: isotropic (mode 0, cos(0) = 1 broadcast).  BRDF: per-mode
    # reflection of the all-mode surface downwelling field + direct beam,
    # azimuth-folded with the same cos(m dphi) as the layer sources (the
    # fold commutes with the scan: transmission is mode-independent).
    if brdf is None:
        fdn_bot = 2.0 * jnp.einsum("j,jB->B", wmu, dn0[-1])
        i_surf0 = (surf_emission.reshape(bc)
                   + alb_flat * (fdir_bot / jnp.pi + fdn_bot))
        i_surf_up = None
    else:
        # all-mode downwelling at the surface: one layer of matvecs
        dn_surf = (
            jnp.sum((gm[-1] * ee[-1][None, :, :]) * a[-1][None, :, :], axis=1)
            + jnp.sum(gp[-1] * b[-1][None, :, :], axis=1)
            + p_bd[-1]
        )                                               # [N, MB]
        dn_surf_m = dn_surf.reshape(n, nm, bc)
        u_up_j = jnp.asarray(np.abs(umu[up_idx]), dtype) if len(up_idx) \
            else jnp.zeros((0,), dtype)
        if len(up_idx):
            r_user = fourier_refl_matrices(brdf, u_up_j, mu, nm, dtype)
            refl_diff = jnp.einsum(
                "muj,j,jmB->muB", r_user, wmu, dn_surf_m
            )                                           # [m, Uu, Bc]
            r_bu = fourier_refl_matrices(
                brdf, u_up_j, mu0.reshape(bc)[:, None], nm, dtype
            )[..., 0]                                   # [bc, m, Uu]
            refl_beam_u = (
                jnp.moveaxis(r_bu, 0, -1)
                * mfac[:, None, None] / (2.0 * jnp.pi)
                * fdir_bot[None, None, :]
            )
            i_surf_m = refl_diff + refl_beam_u
            if planck:
                r_dh_u = hemispherical_reflectance(
                    brdf, u_up_j, tab.w, tab.mu, dtype
                )
                bs_surf = surf_emission.reshape(bc) / jnp.maximum(
                    1.0 - alb_flat, 1e-12
                )
                i_surf_m = i_surf_m.at[0].add(
                    (1.0 - r_dh_u)[:, None] * bs_surf[None, :]
                )
            i_surf_up = jnp.einsum("muB,mpB->upB", i_surf_m, cosm)
        else:
            i_surf_up = jnp.zeros((0, nphi, bc), dtype)

    def scan_up(u_vals, idx):
        u = jnp.asarray(u_vals, dtype)                  # [Uu]
        e_lay = jnp.exp(-dtau_r[:, :, 0] / u[None, :, None, None])
        j_lay = (
            jt[:, idx]
            + st0[:, idx] * (1.0 - e_lay)
            + st1[:, idx] * (u[None, :, None, None]
                             - (dtau_r[:, :, 0] + u[None, :, None, None])
                             * e_lay)
        )                                               # [L, U, P, Bc]
        if i_surf_up is None:
            i_surf = jnp.broadcast_to(
                i_surf0[None, None, :], (len(u_vals), nphi, bc)
            )
        else:
            i_surf = i_surf_up

        def step(carry, inp):
            j_l, e_l = inp
            nxt = carry * e_l + j_l
            return nxt, nxt

        e_b = jnp.broadcast_to(e_lay, j_lay.shape)
        _, i_tops = jax.lax.scan(step, i_surf, (j_lay[::-1], e_b[::-1]))
        return jnp.concatenate([i_tops[::-1], i_surf[None]], axis=0)

    def scan_dn(u_vals, idx):
        ub = jnp.asarray(np.abs(u_vals), dtype)
        e_lay = jnp.exp(-dtau_r[:, :, 0] / ub[None, :, None, None])
        j_lay = (
            jt[:, idx]
            + st0[:, idx] * (1.0 - e_lay)
            + st1[:, idx] * (dtau_r[:, :, 0]
                             - ub[None, :, None, None] * (1.0 - e_lay))
        )
        i_top = jnp.broadcast_to(
            i_top0[None, None, :], (len(u_vals), nphi, bc)
        )

        def step(carry, inp):
            j_l, e_l = inp
            nxt = carry * e_l + j_l
            return nxt, nxt

        e_b = jnp.broadcast_to(e_lay, j_lay.shape)
        _, i_bots = jax.lax.scan(step, i_top, (j_lay, e_b))
        return jnp.concatenate([i_top[None], i_bots], axis=0)

    out_parts = jnp.zeros((nlyr + 1, numu, nphi, bc), dtype)
    if len(up_idx) > 0:
        out_parts = out_parts.at[:, list(up_idx)].set(
            scan_up(umu[up_idx], up_idx)
        )
    if len(dn_idx) > 0:
        out_parts = out_parts.at[:, list(dn_idx)].set(
            scan_dn(umu[dn_idx], dn_idx)
        )

    uu = jnp.moveaxis(out_parts, -1, 0).reshape(
        batch + (nlyr + 1, numu, nphi)
    )

    if corint:
        uu = uu + _tms_correction(
            dm=dm, pmom_unscaled=pmom, tau_s=tau_s,
            expbea_s=expbea_s, fbeam=fbeam, mu0=mu0, phi0=phi0,
            umu=umu, phi=phi, nstr=nstr, dtype=dtype,
        )
        if np.any(umu < 0):
            uu = uu - _ims_correction(
                dm=dm, pmom_unscaled=pmom,
                ssalb_unscaled=ssalb_in, tau_u=tau_u,
                fbeam=fbeam, mu0=mu0, phi0=phi0,
                umu=umu, phi=phi, nstr=nstr, dtype=dtype,
            )

    return RteOutputs(
        to_bm(rfldir), to_bm(rfldn), to_bm(fup), to_bm(dfdt), to_bm(uavg),
        uu,
    )
