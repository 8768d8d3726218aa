"""Lane-resident flux path: the whole solve in scan-lane layout.

The generic solve_rte path materializes every intermediate batch-major and
relayouts at each stage boundary (eig -> from_lane, bvp -> _to_scan_lane,
bounds -> _to_scan_lane again): for the big [N, N] per-layer tensors that
is three full HBM copies that do no arithmetic.  This module runs the
entire flux-only (azimuth mode 0) solve in ONE layout — the scan-lane
[L, *mat, B] layout the Pallas kernels consume.  Since round 5 the
eigensolve kernel itself runs a (layer, lane-tile) grid and emits that
layout directly (pallas/eig.py:eig_beam_chain_lane_fused_layered), so NO
transpose sits between the eig and BVP kernels; batch-major conversion
happens only for the tiny [.., L+1] outputs.

Engaged from solve_rte for: onlyfl, nmode == 1, f32, Lambertian surface,
N = nstr/2 even and <= 8, on TPU (or interpret for tests).  Everything
else falls back to the generic path; results match it to the f32
conditioning floor (tests/test_pallas_kernels.py::test_fused_eig_beam_
matches_lane and ::test_fused_eig_beam_compiled_on_tpu, which run
solve_rte with eig_method='fused*' — the dispatch that lands here).

Reference map: this is the DISORT call chain (SOLEIG+UPBEAM+UPISOT+SETMTX+
SOLVE0+FLUXES — disort.f, SURVEY.md section 3.2) re-expressed as two fused
TPU kernels plus lane-layout XLA glue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sbdart_tpu.solver.deltam import apply_deltam
from sbdart_tpu.solver.disort import RteOutputs
from sbdart_tpu.solver.eig import angular_tables
from sbdart_tpu.solver.planck import planck_band
from sbdart_tpu.solver.sources import _ylm_at, thermal_particular


def _to_scan(x, nl_axis_from_end=1):
    """[batch..., L] -> [L, B] (or [batch..., L, k] -> [L, k, B])."""
    if nl_axis_from_end == 1:
        x = jnp.moveaxis(x, -1, 0)               # [L, batch...]
        return x.reshape(x.shape[0], -1)
    x = jnp.moveaxis(x, -2, 0)                   # [L, batch..., k]
    x = x.reshape(x.shape[0], -1, x.shape[-1])   # [L, B, k]
    return jnp.moveaxis(x, -1, 1)                # [L, k, B]


def solve_rte_flux_lane(
    dtauc, ssalb_in, pmom, *,
    nstr, fbeam, umu0, fisot, albedo,
    planck, temper, wvnlo, wvnhi, btemp, ttemp, temis,
    deltam, dtype, interpret=False,
):
    """Flux-mode solve, lane-resident.  Inputs batch-major as in solve_rte
    (already broadcast); returns RteOutputs with uu=None."""
    from sbdart_tpu.pallas.blocktri import block_thomas_rt

    n = nstr // 2
    nlyr = dtauc.shape[-1]
    batch = dtauc.shape[:-1]
    bc = int(np.prod(batch)) if batch else 1
    tab = angular_tables(nstr, 1)
    mu = jnp.asarray(tab.mu, dtype)
    w = jnp.asarray(tab.w, dtype)
    wmu = w * mu

    has_beam = fbeam > 0.0
    mu0 = jnp.where(has_beam, jnp.abs(umu0), 0.5)
    mu0_row = mu0.reshape(-1)[None, :].astype(dtype)    # [1, Bc]
    scale = (jnp.where(has_beam, fbeam, 0.0) / (2.0 * jnp.pi)) \
        .reshape(-1).astype(dtype)                      # [Bc]
    has_beam_row = has_beam.reshape(-1)[None, :]        # [1, Bc]

    # ---- optics + eigensolve + beam front end ----------------------------
    # Round 5: the eig kernel runs a (layer, lane-tile) grid and emits the
    # block-Thomas layout, so no transpose sits between the two kernels.
    # n = 2 without thermal (the nstr=4 primary path) fuses the ENTIRE
    # front end — delta-M scaling, scattering-matrix build,
    # Legendre-at-mu0, beam-RHS assembly, the closed-form chain, and the
    # per-eigenmode transmissions — into one planar kernel taking the RAW
    # optical properties (pallas/eig.py:_n2_deltam_scatter_kernel); the
    # only layer math left outside is the tau cumsum.  n = 2 with planck
    # uses the scatter-fused kernel on delta-M-scaled inputs (the thermal
    # particular needs them batch-major anyway); larger n builds cpp/cpm
    # + RHS as XLA einsums and feeds the layered generic kernel.
    fused_head = (n == 2) and (not planck)
    if fused_head:
        from sbdart_tpu.pallas.eig import eig_beam_deltam_scatter_n2_layered

        dtau_raw_scan = _to_scan(dtauc)                 # [L, Bc]
        ssalb_raw_scan = _to_scan(ssalb_in)
        nmom = pmom.shape[-1]
        use_dm = bool(deltam) and nmom > nstr
        pm5 = pmom[..., :5]
        if pm5.shape[-1] < 5:
            pm5 = jnp.pad(
                pm5, [(0, 0)] * (pm5.ndim - 1) + [(0, 5 - pm5.shape[-1])]
            )
        pmom_scan = _to_scan(pm5, 2)                    # [L, 5, Bc]
        kk, gp, gm, zp, zm, dtau_scan, ee = \
            eig_beam_deltam_scatter_n2_layered(
                dtau_raw_scan, ssalb_raw_scan, pmom_scan,
                scale[None, :], mu0_row, tab,
                use_deltam=use_dm, interpret=interpret,
            )
        zrow = jnp.zeros((1, bc), dtype)
        tau_s_scan = jnp.concatenate(
            [zrow, jnp.cumsum(dtau_scan, axis=0)], axis=0
        )
        tau_u_scan = jnp.concatenate(
            [zrow, jnp.cumsum(dtau_raw_scan, axis=0)], axis=0
        )
        eb = jnp.where(has_beam_row, jnp.exp(-tau_s_scan / mu0_row), 0.0)
        eb_u = jnp.where(has_beam_row, jnp.exp(-tau_u_scan / mu0_row), 0.0)
        dm = None
        bypass_generic = True
    else:
        bypass_generic = False
        # ---- optical scaling (SETDIS) -- batch-major, small tensors ------
        dm = apply_deltam(dtauc, ssalb_in, pmom, nstr, deltam)
        tau_s = jnp.cumsum(dm.dtau, axis=-1)
        tau_s = jnp.concatenate(
            [jnp.zeros_like(tau_s[..., :1]), tau_s], axis=-1
        )
        tau_u = jnp.cumsum(dm.dtau_unscaled, axis=-1)
        tau_u = jnp.concatenate(
            [jnp.zeros_like(tau_u[..., :1]), tau_u], axis=-1
        )
        expbea_s = jnp.where(
            has_beam[..., None], jnp.exp(-tau_s / mu0[..., None]), 0.0
        )
        expbea_u = jnp.where(
            has_beam[..., None], jnp.exp(-tau_u / mu0[..., None]), 0.0
        )
        eb = _to_scan(expbea_s)                         # [L+1, Bc]
        eb_u = _to_scan(expbea_u)
        dtau_scan = _to_scan(dm.dtau)                   # [L, Bc]

        if n == 2:
            from sbdart_tpu.pallas.eig import eig_beam_scatter_n2_layered

            ssalb_scan = _to_scan(dm.ssalb)             # [L, Bc]
            gl_scan = _to_scan(dm.gl, 2)                # [L, 4, Bc]
            kk, gp, gm, zp, zm = eig_beam_scatter_n2_layered(
                ssalb_scan, gl_scan, scale[None, :], mu0_row, tab,
                interpret=interpret,
            )                                           # [L, *, Bc]
            ee = jnp.exp(-kk * dtau_scan[:, None, :])   # [L, N, Bc]
            bypass_generic = True

    if not bypass_generic:
        twol1 = jnp.asarray(tab.twol1, dtype)
        c = 0.5 * dm.ssalb[..., None] * twol1 * dm.gl   # [.., L, nstr]
        c_scan = _to_scan(c, 2)                         # [L, nstr, Bc]

        ylm0 = np.asarray(tab.ylm[0], np.float64)       # [nstr, N]
        par0 = np.asarray(tab.parity[0], np.float64)
        a_pp = jnp.asarray(
            (ylm0[:, :, None] * ylm0[:, None, :]).reshape(nstr, n * n),
            dtype,
        )
        a_pm = a_pp * jnp.asarray(par0, dtype)[:, None]
        cppl = jnp.einsum("lk,SlB->SkB", a_pp, c_scan) \
            .reshape(nlyr, n, n, bc)
        cpml = jnp.einsum("lk,SlB->SkB", a_pm, c_scan) \
            .reshape(nlyr, n, n, bc)

        y0 = _ylm_at(mu0, 1, nstr, dtype)[..., 0, :]    # [batch.., nstr]
        y0d = y0 * jnp.asarray(tab.parity[0], dtype)
        prod = c_scan * y0d.reshape(-1, nstr).T[None, :, :]  # [L, nstr, Bc]
        ylm_mat = jnp.asarray(ylm0.T, dtype)            # [N, nstr]
        x0p = jnp.einsum("il,SlB->SiB", ylm_mat, prod) \
            * scale[None, None, :]
        x0m = jnp.einsum(
            "il,SlB->SiB", ylm_mat * jnp.asarray(par0, dtype)[None, :],
            prod,
        ) * scale[None, None, :]
        inv_mu_col = jnp.asarray(1.0 / tab.mu, dtype)[None, :, None]
        r1 = (x0p + x0m) * inv_mu_col                   # [L, N, Bc]
        r2 = (x0p - x0m) * inv_mu_col

        from sbdart_tpu.pallas.eig import eig_beam_chain_lane_fused_layered

        kk, gp, gm, zp, zm = eig_beam_chain_lane_fused_layered(
            cppl, cpml, r1, r2, mu0_row, tab.mu, tab.w, interpret=interpret
        )                                               # [L, *, Bc]
        ee = jnp.exp(-kk * dtau_scan[:, None, :])       # [L, N, Bc]

    # ---- particular solution at layer bounds -----------------------------
    p_tu = zp * eb[:-1, None, :]
    p_td = zm * eb[:-1, None, :]
    p_bu = zp * eb[1:, None, :]
    p_bd = zm * eb[1:, None, :]

    alb_flat = albedo.reshape(-1).astype(dtype)         # [Bc]
    surf_emission = jnp.zeros(batch, dtype)
    top_emission = jnp.zeros(batch, dtype)
    b_level = None
    if planck:
        planck_dtype = jnp.float32
        wvnlo_b = jnp.broadcast_to(jnp.asarray(wvnlo, dtype), batch)
        wvnhi_b = jnp.broadcast_to(jnp.asarray(wvnhi, dtype), batch)
        b_level = planck_band(
            wvnlo_b[..., None], wvnhi_b[..., None], temper, planck_dtype
        ).astype(dtype)
        # thermal particular needs cpp/cpm batch-major (mode 0): recompute
        # via the einsum from c (thermal runs only on LW bands, where the
        # beam terms are off and this is the marginal cost)
        twol1_t = jnp.asarray(tab.twol1, dtype)
        c_t = 0.5 * dm.ssalb[..., None] * twol1_t * dm.gl   # [.., L, nstr]
        par0_t = jnp.asarray(tab.parity[0], dtype)
        ylm_j = jnp.asarray(tab.ylm[0], dtype)           # [nstr, N]
        cpp_bm = jnp.einsum("...Ll,li,lj->...Lij", c_t, ylm_j, ylm_j)
        cpm_bm = jnp.einsum(
            "...Ll,l,li,lj->...Lij", c_t, par0_t, ylm_j, ylm_j,
        )
        thermal = thermal_particular(
            cpp_bm, cpm_bm, dm.ssalb, dm.dtau, b_level, tab, dtype
        )
        d_scan = dtau_scan[:, None, :]
        y0p = _to_scan(thermal.y0p, 2)
        y0m = _to_scan(thermal.y0m, 2)
        y1p = _to_scan(thermal.y1p, 2)
        y1m = _to_scan(thermal.y1m, 2)
        p_tu = p_tu + y0p
        p_td = p_td + y0m
        p_bu = p_bu + y0p + y1p * d_scan
        p_bd = p_bd + y0m + y1m * d_scan
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

    # ---- surface operators (Lambertian) ----------------------------------
    beam_flux_flat = (
        mu0.reshape(-1) * jnp.where(has_beam, fbeam, 0.0).reshape(-1)
        * eb[-1]
    )                                                   # [Bc]
    refl_op = (
        2.0 * alb_flat[None, None, :]
        * wmu[None, :, None] * jnp.ones((n, 1, 1), dtype)
    )                                                   # [N, N, Bc]
    bref = jnp.broadcast_to(
        ((alb_flat / jnp.pi) * beam_flux_flat)[None, :],
        (n, bc),
    ).astype(dtype)
    iso = (
        jnp.broadcast_to(jnp.asarray(fisot, dtype), batch)
        + top_emission
    ).reshape(-1)
    semis = jnp.broadcast_to(
        surf_emission.reshape(-1)[None, :], (n, bc)
    ).astype(dtype)

    # ---- BVP rhs + solve (SETMTX/SOLVE0) ---------------------------------
    r_top0 = iso[None, :] - p_td[0]
    r_topl = p_bd[:-1] - p_td[1:]
    r_top = jnp.concatenate([r_top0[None], r_topl], axis=0)
    r_botl = p_tu[1:] - p_bu[:-1]
    refl_part = jnp.sum(refl_op * p_bd[-1][None, :, :], axis=1)
    r_botL = semis + bref + refl_part - p_bu[-1]
    r_bot = jnp.concatenate([r_botl, r_botL[None]], axis=0)
    rhs = jnp.concatenate([r_top, r_bot], axis=1)       # [L, 2N, Bc]

    xs = block_thomas_rt(gp, gm, ee, refl_op, rhs, interpret=interpret)
    a = xs[:, :n]                                       # [L, N, Bc]
    b = xs[:, n:]

    # ---- boundary intensities + fluxes (FLUXES) --------------------------
    e_col = ee[:, None, :, :]

    def mv(m_, v_):
        return jnp.sum(m_ * v_[:, None, :, :], axis=2)

    top_up = mv(gp, a) + mv(gm * e_col, b)
    top_dn = mv(gm, a) + mv(gp * e_col, b)
    bot_up = mv(gp * e_col, a) + mv(gm, b)
    bot_dn = mv(gm * e_col, a) + mv(gp, b)
    up = jnp.concatenate([top_up + p_tu, (bot_up + p_bu)[-1:]], axis=0)
    dn = jnp.concatenate([top_dn + p_td, (bot_dn + p_bd)[-1:]], axis=0)

    fup = 2.0 * jnp.pi * jnp.einsum("j,vjB->vB", wmu, up)
    fdn_diff = 2.0 * jnp.pi * jnp.einsum("j,vjB->vB", wmu, dn)

    beam_f = jnp.where(has_beam, fbeam, 0.0).reshape(-1)[None, :]
    mu0_b = jnp.abs(umu0).reshape(-1)[None, :]
    fdir_scaled = mu0_b * beam_f * eb
    rfldir = mu0_b * beam_f * eb_u
    rfldn = fdn_diff + fdir_scaled - rfldir

    uavg = (
        0.5 * jnp.einsum("j,vjB->vB", w, up + dn)
        + beam_f * eb / (4.0 * jnp.pi)
    )
    ssl = jnp.concatenate([ssalb_in, ssalb_in[..., -1:]], axis=-1)
    ssl_scan = _to_scan(ssl)                            # [L+1, Bc]
    if b_level is None:
        src = uavg
    else:
        src = uavg - _to_scan(b_level)
    dfdt = 4.0 * jnp.pi * (1.0 - ssl_scan) * src

    def to_bm(x):
        return jnp.moveaxis(x, 0, -1).reshape(batch + (nlyr + 1,))

    return RteOutputs(
        to_bm(rfldir), to_bm(rfldn), to_bm(fup), to_bm(dfdt), to_bm(uavg),
        None,
    )
