"""solve_rte — the monochromatic discrete-ordinates solve.

The TPU-native equivalent of one disort.f:DISORT call (SURVEY.md section 3.2
documents the reference signature).  Differences by design:

  * fully batched: every input may carry arbitrary leading batch dims
    (column, band, k-term, solar angle, ...) and the whole solve is one
    traced graph of batched tensor ops — no per-layer or per-mode loops on
    the host;
  * all azimuth Fourier modes are computed branchlessly (the reference's
    data-dependent `accur` early-exit is replaced by a static mode count:
    1 for flux-only runs, nstr for radiance runs — cheap on TPU, removes
    data-dependent control flow);
  * the general eigensolve (ASYMTX) is replaced by a symmetrized batched
    eigh (eig.py), the banded LU (SOLVE0) by a block-tridiagonal scan
    (bvp.py);
  * degenerate/singular regimes (conservative scattering, zero-depth layers)
    are handled by dithering, exactly as the reference does, keeping the
    computation branch-free.

Outputs at ALL layer boundaries (the pipeline interpolates user levels).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sbdart_tpu.solver import bvp as bvp_mod
from sbdart_tpu.solver import fields as fields_mod
from sbdart_tpu.solver.deltam import apply_deltam
from sbdart_tpu.solver.eig import angular_tables, solve_eigen
from sbdart_tpu.solver.planck import planck_band
from sbdart_tpu.solver.sources import beam_particular, thermal_particular


class RteOutputs(NamedTuple):
    rfldir: jnp.ndarray    # [..., L+1] direct flux (unscaled)
    rfldn: jnp.ndarray     # [..., L+1] diffuse down flux
    flup: jnp.ndarray      # [..., L+1] diffuse up flux
    dfdt: jnp.ndarray      # [..., L+1] flux divergence
    uavg: jnp.ndarray      # [..., L+1] mean intensity
    uu: jnp.ndarray | None  # [..., L+1, numu, nphi] radiances (None if onlyfl)


def solve_rte(
    dtauc: jnp.ndarray,          # [..., L]
    ssalb: jnp.ndarray,          # [..., L]
    pmom: jnp.ndarray,           # [..., L, nmom]
    *,
    nstr: int,
    fbeam: jnp.ndarray | float = 0.0,     # [...]
    umu0: jnp.ndarray | float = 1.0,
    phi0: jnp.ndarray | float = 0.0,
    fisot: jnp.ndarray | float = 0.0,
    albedo: jnp.ndarray | float = 0.0,
    planck: bool = False,
    temper: jnp.ndarray | None = None,    # [..., L+1]
    wvnlo: jnp.ndarray | float = 0.0,
    wvnhi: jnp.ndarray | float = 0.0,
    btemp: jnp.ndarray | float = 0.0,
    ttemp: jnp.ndarray | float = 0.0,
    temis: jnp.ndarray | float = 0.0,
    deltam: bool = True,
    onlyfl: bool = True,
    umu: jnp.ndarray | None = None,       # [numu] user view cosines (+-)
    phi: jnp.ndarray | None = None,       # [nphi] user azimuths [deg]
    corint: bool = True,
    brdf=None,                            # None => Lambertian `albedo`;
                                          # else a solver/brdf.py model
                                          # (the lamber=.false. BDREF path)
    dtype=None,
    eig_method: str = "auto",
    bvp_method: str = "auto",
) -> RteOutputs:
    if dtype is None:
        from sbdart_tpu.dtypes import default_dtype
        dtype = default_dtype()

    dtauc = jnp.asarray(dtauc, dtype)
    ssalb_in = jnp.asarray(ssalb, dtype)
    pmom = jnp.asarray(pmom, dtype)
    nlyr = dtauc.shape[-1]
    batch = jnp.broadcast_shapes(
        dtauc.shape[:-1],
        jnp.shape(jnp.asarray(fbeam)),
        jnp.shape(jnp.asarray(albedo)),
    )
    fbeam = jnp.broadcast_to(jnp.asarray(fbeam, dtype), batch)
    umu0 = jnp.broadcast_to(jnp.asarray(umu0, dtype), batch)
    phi0 = jnp.broadcast_to(jnp.asarray(phi0, dtype), batch)
    fisot = jnp.broadcast_to(jnp.asarray(fisot, dtype), batch)
    albedo = jnp.broadcast_to(jnp.asarray(albedo, dtype), batch)
    dtauc = jnp.broadcast_to(dtauc, batch + (nlyr,))
    ssalb_in = jnp.broadcast_to(ssalb_in, batch + (nlyr,))
    pmom = jnp.broadcast_to(pmom, batch + pmom.shape[-2:])

    nmode = 1 if onlyfl else nstr

    # ---- lane-resident flux fast path (TPU) -------------------------------
    # The whole flux solve in one layout with two fused Pallas kernels and
    # no batch-major round-trips of the per-layer matrices (solver/
    # fluxlane.py).  Same math as the generic path below; equivalence is
    # pinned by tests/test_pallas_kernels.py::test_fused_eig_beam_*.
    import jax as _jax

    from sbdart_tpu.dtypes import on_tpu as _on_tpu

    if eig_method == "fused" and not _on_tpu():
        raise ValueError(
            "eig_method='fused' dispatches a Mosaic-compiled Pallas kernel "
            "that only lowers on TPU (current backend: "
            f"{_jax.default_backend()!r}).  Use eig_method='fused_interpret' "
            "for the interpreter, or 'auto'/'lane'/'xla' off-TPU."
        )

    n_half2 = nstr // 2
    lane_ok = (
        onlyfl and brdf is None
        and n_half2 <= 8 and n_half2 % 2 == 0
        and jnp.dtype(dtype) == jnp.float32
    )
    if lane_ok and (
        (eig_method == "auto" and _on_tpu())
        or eig_method in ("fused", "fused_interpret")
    ):
        from sbdart_tpu.solver.fluxlane import solve_rte_flux_lane

        if planck:
            assert temper is not None, "planck=True requires temper"
            temper = jnp.broadcast_to(
                jnp.asarray(temper, dtype), batch + (nlyr + 1,)
            )
        return solve_rte_flux_lane(
            dtauc, ssalb_in, pmom,
            nstr=nstr, fbeam=fbeam, umu0=umu0, fisot=fisot, albedo=albedo,
            planck=planck, temper=temper, wvnlo=wvnlo, wvnhi=wvnhi,
            btemp=btemp, ttemp=ttemp, temis=temis,
            deltam=deltam, dtype=dtype,
            interpret=(eig_method == "fused_interpret"),
        )

    # ---- lane-resident radiance fast path (TPU) ---------------------------
    # All Fourier modes through the fused eig+beam and block-Thomas kernels
    # in one lane layout, lane-form USRINT source projections, TMS/IMS on
    # top (solver/radlane.py).  Same math as the generic path below;
    # equivalence pinned by tests/test_radlane.py.
    # BRDF radiance runs through the lane path too (round 5): per-mode
    # Fourier reflection matrices feed the same block-Thomas kernel and
    # the surface radiance start is azimuth-folded like the layer sources
    # (solver/radlane.py); remaining exclusions (nstr > 16, odd N, f64)
    # are documented with measured costs in docs/USERGUIDE.md.
    rad_lane_ok = (
        (not onlyfl) and umu is not None and phi is not None
        and n_half2 <= 8 and n_half2 % 2 == 0
        and jnp.dtype(dtype) == jnp.float32
    )
    if rad_lane_ok and (
        (eig_method == "auto" and _on_tpu())
        or eig_method in ("fused", "fused_interpret")
    ):
        from sbdart_tpu.solver.radlane import solve_rte_radiance_lane

        if planck:
            assert temper is not None, "planck=True requires temper"
            temper = jnp.broadcast_to(
                jnp.asarray(temper, dtype), batch + (nlyr + 1,)
            )
        return solve_rte_radiance_lane(
            dtauc, ssalb_in, pmom,
            nstr=nstr, fbeam=fbeam, umu0=umu0, phi0=phi0, fisot=fisot,
            albedo=albedo,
            planck=planck, temper=temper, wvnlo=wvnlo, wvnhi=wvnhi,
            btemp=btemp, ttemp=ttemp, temis=temis,
            deltam=deltam, umu=umu, phi=phi, corint=corint, dtype=dtype,
            brdf=brdf,
            interpret=(eig_method == "fused_interpret"),
        )

    tab = angular_tables(nstr, nmode)

    # --- optical property scaling (SETDIS equivalent) ----------------------
    dm = apply_deltam(dtauc, ssalb_in, pmom, nstr, deltam)
    tau_s = jnp.cumsum(dm.dtau, axis=-1)
    tau_s = jnp.concatenate([jnp.zeros_like(tau_s[..., :1]), tau_s], axis=-1)
    tau_u = jnp.cumsum(dm.dtau_unscaled, axis=-1)
    tau_u = jnp.concatenate([jnp.zeros_like(tau_u[..., :1]), tau_u], axis=-1)

    has_beam = fbeam > 0.0
    mu0 = jnp.where(has_beam, jnp.abs(umu0), 0.5)
    expbea_s = jnp.where(has_beam[..., None], jnp.exp(-tau_s / mu0[..., None]), 0.0)
    expbea_u = jnp.where(has_beam[..., None], jnp.exp(-tau_u / mu0[..., None]), 0.0)

    # --- homogeneous + particular solutions --------------------------------
    # Flux path on TPU: ONE fused Pallas kernel does the eig chain AND the
    # beam particular solve, with the scattering matrices built directly in
    # lane layout on the MXU (solver/eig.py:solve_eigen_beam_fused) — the
    # dominant cost of the round-2 implementation was exactly these stages
    # round-tripping HBM.
    n_half = nstr // 2
    fused_shape_ok = (
        nmode == 1 and n_half <= 8 and n_half % 2 == 0
        and jnp.dtype(dtype) == jnp.float32
    )
    use_fused = fused_shape_ok and (
        (eig_method == "auto" and _on_tpu())
        or eig_method in ("fused", "fused_interpret")
    )
    if use_fused:
        from sbdart_tpu.solver.eig import solve_eigen_beam_fused

        eig, beam = solve_eigen_beam_fused(
            dm.ssalb, dm.gl, fbeam, mu0, tab, dtype, need_cppcpm=planck,
            interpret=(eig_method == "fused_interpret"),
        )
    else:
        eig = solve_eigen(dm.ssalb, dm.gl, tab, dtype, eig_method=eig_method)
        beam = beam_particular(
            eig.cpp, eig.cpm, dm.ssalb, dm.gl, fbeam, mu0, tab, dtype
        )

    thermal = None
    b_level = None
    top_emission = jnp.zeros(batch, dtype)
    surf_emission = jnp.zeros(batch, dtype)
    if planck:
        assert temper is not None, "planck=True requires temper"
        temper = jnp.broadcast_to(jnp.asarray(temper, dtype), batch + (nlyr + 1,))
        wvnlo_b = jnp.broadcast_to(jnp.asarray(wvnlo, dtype), batch)
        wvnhi_b = jnp.broadcast_to(jnp.asarray(wvnhi, dtype), batch)
        planck_dtype = (
            jnp.float64 if jnp.dtype(dtype) == jnp.float64 else jnp.float32
        )
        b_level = planck_band(
            wvnlo_b[..., None], wvnhi_b[..., None], temper, planck_dtype
        ).astype(dtype)
        thermal = thermal_particular(
            eig.cpp[..., 0, :, :, :], eig.cpm[..., 0, :, :, :],
            dm.ssalb, dm.dtau, b_level, tab, dtype,
        )
        btemp_b = jnp.broadcast_to(jnp.asarray(btemp, dtype), batch)
        ttemp_b = jnp.broadcast_to(jnp.asarray(ttemp, dtype), batch)
        btemp_eff = jnp.where(btemp_b > 0, btemp_b, temper[..., -1])
        ttemp_eff = jnp.where(ttemp_b > 0, ttemp_b, temper[..., 0])
        surf_emission = (
            (1.0 - albedo)
            * planck_band(wvnlo_b, wvnhi_b, btemp_eff, planck_dtype).astype(dtype)
        )
        top_emission = (
            jnp.broadcast_to(jnp.asarray(temis, dtype), batch)
            * planck_band(wvnlo_b, wvnhi_b, ttemp_eff, planck_dtype).astype(dtype)
        )

    part = bvp_mod.particular_at_bounds(beam, thermal, expbea_s, dm.dtau, nmode)

    # ---- surface operators (SURFAC/BDREF equivalent) ----------------------
    n = nstr // 2
    mode0_vec = jnp.zeros((nmode,), dtype).at[0].set(1.0)
    beam_flux_surf = mu0 * jnp.where(has_beam, fbeam, 0.0) * expbea_s[..., -1]
    if brdf is None:
        ones_nn = jnp.ones((n, n), dtype)
        surf_refl = (
            2.0 * albedo[..., None, None, None]
            * mode0_vec[:, None, None] * ones_nn
        )                                                  # [..., m, N, N]
        beam_refl_src = (
            (albedo / jnp.pi) * beam_flux_surf
        )[..., None, None] * mode0_vec[:, None]            # [..., m, N]
        surf_emis_vec = surf_emission[..., None] * jnp.ones((n,), dtype)
    else:
        from sbdart_tpu.solver.brdf import (
            fourier_refl_matrices,
            hemispherical_reflectance,
        )

        mu_q = jnp.asarray(tab.mu, dtype)
        surf_refl = jnp.broadcast_to(
            fourier_refl_matrices(brdf, mu_q, mu_q, nmode, dtype),
            batch + (nmode, n, n),
        )
        r_beam = fourier_refl_matrices(
            brdf, mu_q, mu0[..., None], nmode, dtype
        )[..., :, :, 0]                                    # [..., m, N]
        import numpy as _np

        mfac = jnp.asarray(
            _np.where(_np.arange(nmode) == 0, 1.0, 2.0), dtype
        )
        beam_refl_src = (
            r_beam * mfac[:, None] / (2.0 * jnp.pi)
            * beam_flux_surf[..., None, None]
        )
        if planck:
            r_dh = hemispherical_reflectance(brdf, mu_q, tab.w, tab.mu, dtype)
            bs = surf_emission / jnp.maximum(1.0 - albedo, 1e-12)  # raw B_s
            surf_emis_vec = (1.0 - r_dh) * bs[..., None]
        else:
            surf_emis_vec = jnp.zeros(batch + (n,), dtype)

    sol = bvp_mod.solve_bvp(
        eig, part, dm.dtau, surf_refl, fisot, top_emission, surf_emis_vec,
        beam_refl_src, tab, dtype, method=bvp_method,
    )
    bounds = bvp_mod.intensity_at_boundaries(eig, sol, part, dm.dtau)

    fx = fields_mod.fluxes(
        bounds, tab, fbeam, mu0, expbea_s, expbea_u, ssalb_in,
        b_level, dtype,
    )

    uu = None
    if not onlyfl and umu is not None:
        import numpy as np

        from sbdart_tpu.solver.radiance import compute_radiances

        uu = compute_radiances(
            eig=eig, sol=sol, beam=beam, thermal=thermal, dm=dm,
            tau_s=tau_s, tau_u=tau_u, ssalb_unscaled=ssalb_in,
            expbea_s=expbea_s, tab=tab,
            fbeam=fbeam, mu0=mu0, phi0=phi0, fisot=fisot, albedo=albedo,
            top_emission=top_emission, surf_emission=surf_emission,
            bounds=bounds, pmom_unscaled=pmom,
            umu=np.asarray(umu, np.float64), phi=np.asarray(phi, np.float64),
            corint=corint, dtype=dtype, brdf=brdf,
        )

    return RteOutputs(fx.rfldir, fx.rfldn, fx.flup, fx.dfdt, fx.uavg, uu)
