"""Tests of the user-angle radiance path (USRINT/INTCOR equivalents).

Checks radiances against: isotropic analytic fields, pure-absorption
analytics, the single-scattering closed form, consistency with the flux
outputs (angular integration), and symmetry/invariance properties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.solver.disort import solve_rte
from sbdart_tpu.solver.quadrature import double_gauss
from sbdart_tpu.solver.planck import planck_band


def hg_moments(g, nmom):
    return np.array([g**l for l in range(nmom)])


def run_rad(taus, w0, mom, nstr, umu, phi, corint=False, **kw):
    nl = len(taus)
    return solve_rte(
        dtauc=jnp.array(taus),
        ssalb=jnp.full(nl, w0) if np.isscalar(w0) else jnp.array(w0),
        pmom=jnp.array(np.tile(mom, (nl, 1))),
        nstr=nstr,
        onlyfl=False,
        umu=np.array(umu, float),
        phi=np.array(phi, float),
        corint=corint,
        dtype=jnp.float64,
        **kw,
    )


class TestRadianceAnalytic:
    @pytest.mark.slow
    def test_blackbody_cavity_radiance(self):
        t = 270.0
        wlo, whi = 400.0, 600.0
        b = float(planck_band(wlo, whi, t))
        out = run_rad(
            [0.4, 1.5], [0.3, 0.8], hg_moments(0.6, 20), 8,
            umu=[-0.9, -0.4, 0.4, 0.9], phi=[0.0, 90.0],
            planck=True, temper=jnp.full(3, t), wvnlo=wlo, wvnhi=whi,
            albedo=0.0, fisot=b,
        )
        np.testing.assert_allclose(np.asarray(out.uu), b, rtol=1e-8)

    @pytest.mark.slow
    def test_pure_absorption_reflected_beam(self):
        """w0=0, Lambertian albedo: up radiance = (alb/pi) Fdir_bot * exp."""
        tau, alb, mu0 = 0.6, 0.5, 0.7
        umu = [0.3, 0.8]
        out = run_rad(
            [tau], 0.0, hg_moments(0.0, 5), 8, umu=umu, phi=[0.0],
            fbeam=1.0, umu0=mu0, albedo=alb,
        )
        fdir_bot = mu0 * np.exp(-tau / mu0)
        i_surf = alb / np.pi * fdir_bot
        uu = np.asarray(out.uu)  # [L+1, U, P]
        np.testing.assert_allclose(uu[1, :, 0], i_surf, rtol=1e-10)
        for i, u in enumerate(umu):
            np.testing.assert_allclose(
                uu[0, i, 0], i_surf * np.exp(-tau / u), rtol=1e-10
            )

    @pytest.mark.slow
    def test_single_scatter_limit(self):
        """Thin layer: radiance matches the exact SS closed form."""
        tau, w0, g, mu0 = 1e-4, 0.5, 0.3, 0.6
        nstr = 16
        mom = hg_moments(g, nstr)  # fully representable: no delta-M truncation
        umu = [0.35, 0.75]
        phi = [0.0, 60.0, 180.0]
        out = run_rad(
            [tau], w0, mom, nstr, umu=umu, phi=phi,
            fbeam=1.0, umu0=mu0, albedo=0.0, corint=False,
        )
        uu = np.asarray(out.uu)
        s0 = np.sqrt(1 - mu0**2)
        for i, u in enumerate(umu):
            su = np.sqrt(1 - u**2)
            for j, p in enumerate(phi):
                cosang = -mu0 * u + s0 * su * np.cos(np.deg2rad(0.0 - p))
                pfn = sum(
                    (2 * l + 1) * g**l * np.polynomial.legendre.Legendre.basis(l)(cosang)
                    for l in range(nstr)
                )
                iss = (
                    w0 / (4 * np.pi) * pfn * mu0 / (u + mu0)
                    * (1 - np.exp(-tau * (1 / u + 1 / mu0)))
                )
                np.testing.assert_allclose(uu[0, i, j], iss, rtol=2e-3)

    @pytest.mark.slow
    def test_flux_consistency(self):
        """Angular integration of uu at quadrature angles reproduces fluxes."""
        nstr = 8
        mu, w = double_gauss(nstr)
        nphi = nstr + 3
        phis = np.linspace(0, 360, nphi, endpoint=False)
        out = run_rad(
            [0.3, 1.2], 0.85, hg_moments(0.7, 2 * nstr + 2), nstr,
            umu=np.concatenate([-mu[::-1], mu]), phi=phis,
            fbeam=1.0, umu0=0.55, albedo=0.25, corint=False,
        )
        uu = np.asarray(out.uu)            # [L+1, 2N, P]
        azi_mean = uu.mean(axis=-1)        # kills modes m>0 exactly
        dn = azi_mean[:, : nstr // 2][:, ::-1]   # back to ascending mu order
        up = azi_mean[:, nstr // 2:]
        flup_q = 2 * np.pi * (w * mu * up).sum(axis=1)
        fdn_q = 2 * np.pi * (w * mu * dn).sum(axis=1)
        np.testing.assert_allclose(flup_q, np.asarray(out.flup), rtol=1e-8, atol=1e-12)
        # rfldn is diffuse-total minus true direct; fdn_q is scaled-diffuse,
        # so add back the delta-M SCALED direct beam (f = g^nstr here)
        f = 0.7**nstr
        taus_s = (1 - 0.85 * f) * np.array([0, 0.3, 1.5])
        fdir_s = 0.55 * np.exp(-taus_s / 0.55)
        np.testing.assert_allclose(
            fdn_q + fdir_s, np.asarray(out.rfldn) + np.asarray(out.rfldir),
            rtol=1e-8, atol=1e-12,
        )

    def test_azimuthal_symmetry(self):
        """I(phi0 + d) == I(phi0 - d)."""
        out = run_rad(
            [1.0], 0.9, hg_moments(0.8, 34), 16,
            umu=[0.5], phi=[30.0, 90.0, 150.0, 210.0, 270.0, 330.0],
            fbeam=1.0, umu0=0.6, phi0=180.0, albedo=0.1, corint=False,
        )
        uu = np.asarray(out.uu)[0, 0]
        np.testing.assert_allclose(uu[0], uu[5], rtol=1e-10)  # 30 vs 330
        np.testing.assert_allclose(uu[1], uu[4], rtol=1e-10)  # 90 vs 270
        np.testing.assert_allclose(uu[2], uu[3], rtol=1e-10)  # 150 vs 210

    @pytest.mark.slow
    def test_rotation_invariance(self):
        a = run_rad(
            [0.8], 0.8, hg_moments(0.5, 18), 8, umu=[0.4], phi=[10.0, 100.0],
            fbeam=1.0, umu0=0.5, phi0=0.0, corint=False,
        )
        b = run_rad(
            [0.8], 0.8, hg_moments(0.5, 18), 8, umu=[0.4], phi=[55.0, 145.0],
            fbeam=1.0, umu0=0.5, phi0=45.0, corint=False,
        )
        np.testing.assert_allclose(np.asarray(a.uu), np.asarray(b.uu), rtol=1e-10)


class TestTmsCorrection:
    @pytest.mark.slow
    def test_no_truncation_no_correction(self):
        """Phase fully representable: corint must not change radiances."""
        kw = dict(fbeam=1.0, umu0=0.6, albedo=0.2)
        a = run_rad([0.5], 0.9, hg_moments(0.4, 8), 8,
                    umu=[0.5, -0.5], phi=[0.0, 120.0], corint=False, **kw)
        b = run_rad([0.5], 0.9, hg_moments(0.4, 8), 8,
                    umu=[0.5, -0.5], phi=[0.0, 120.0], corint=True, **kw)
        np.testing.assert_allclose(
            np.asarray(a.uu), np.asarray(b.uu), rtol=1e-7, atol=1e-10
        )

    @pytest.mark.slow
    def test_tms_improves_truncated_phase(self):
        """Strongly peaked phase at low nstr: TMS radiances should approach a
        high-nstr reference better than uncorrected ones (aureole region)."""
        g = 0.85
        mom = hg_moments(g, 130)
        kw = dict(fbeam=1.0, umu0=0.5, albedo=0.0)
        umu = [-0.45]   # near-forward viewing (downward, close to beam)
        phi = [0.0]
        ref = run_rad([1.0], 0.9, mom, 64, umu=umu, phi=phi, corint=False, **kw)
        lo = run_rad([1.0], 0.9, mom, 8, umu=umu, phi=phi, corint=False, **kw)
        tms = run_rad([1.0], 0.9, mom, 8, umu=umu, phi=phi, corint=True, **kw)
        r = float(np.asarray(ref.uu)[1, 0, 0])
        e_lo = abs(float(np.asarray(lo.uu)[1, 0, 0]) - r)
        e_tms = abs(float(np.asarray(tms.uu)[1, 0, 0]) - r)
        assert e_tms < e_lo, (e_tms, e_lo, r)


class TestImsCorrection:
    def test_xi_function_resonance_continuity(self):
        """Closed form and Taylor limit agree across the switchover."""
        from sbdart_tpu.solver.radiance import xi_function
        u2, tau = 0.6, 1.3
        exact_far = float(xi_function(
            jnp.float64(u2 * 1.01), jnp.float64(u2), jnp.float64(u2),
            jnp.float64(tau)))
        near = float(xi_function(
            jnp.float64(u2 * (1 + 1e-5)), jnp.float64(u2), jnp.float64(u2),
            jnp.float64(tau)))
        limit = tau**2 * np.exp(-tau / u2) / (2 * u2 * u2)
        assert abs(near - limit) < 1e-4 * limit
        assert abs(exact_far - limit) < 2e-2 * limit
        assert near > 0 and exact_far > 0

    def test_ims_term_structure(self):
        """IMS term: zero at upward angles and at the top boundary, positive
        in the downward aureole for a truncated forward-peaked phase."""
        from sbdart_tpu.solver.deltam import apply_deltam
        from sbdart_tpu.solver.radiance import _ims_correction
        g, nstr, nmom = 0.9, 8, 64
        mom = jnp.asarray(hg_moments(g, nmom))
        nl = 3
        dtau = jnp.full((nl,), 1.0, jnp.float64)
        w0 = jnp.full((nl,), 0.95, jnp.float64)
        pm = jnp.tile(mom, (nl, 1))
        dm = apply_deltam(dtau, w0, pm, nstr)
        tau_u = jnp.concatenate([
            jnp.zeros(1), jnp.cumsum(dm.dtau_unscaled)])
        umu = np.array([-0.45, -0.9, 0.5])
        phi = np.array([0.0, 180.0])
        duu = np.asarray(_ims_correction(
            dm=dm, pmom_unscaled=pm, ssalb_unscaled=w0, tau_u=tau_u,
            fbeam=jnp.float64(1.0), mu0=jnp.float64(0.5),
            phi0=jnp.float64(0.0), umu=umu, phi=phi, nstr=nstr,
            dtype=jnp.float64,
        ))
        assert duu.shape == (nl + 1, 3, 2)
        np.testing.assert_allclose(duu[:, 2], 0.0)      # upward angle: zero
        np.testing.assert_allclose(duu[0], 0.0)         # top boundary: zero
        # forward-aureole angle (-0.45, phi=0) below the first layer
        assert duu[1:, 0, 0].min() > 0.0
        # away from the aureole (phi=180) the correction is tiny compared
        # to the near-forward peak value
        assert np.abs(duu[1:, 0, 1]).max() < 1e-2 * duu[1:, 0, 0].max()
        assert np.isfinite(duu).all()

    @pytest.mark.slow
    def test_corint_improves_downward_aureole(self):
        """TMS+IMS at low nstr: downward near-forward radiance approaches a
        high-nstr reference better than the uncorrected value."""
        g = 0.9
        mom = hg_moments(g, 130)
        kw = dict(fbeam=1.0, umu0=0.5, albedo=0.0)
        umu = [-0.45]
        phi = [0.0]
        ref = run_rad([2.0], 0.95, mom, 64, umu=umu, phi=phi,
                      corint=False, **kw)
        lo = run_rad([2.0], 0.95, mom, 8, umu=umu, phi=phi,
                     corint=False, **kw)
        cor = run_rad([2.0], 0.95, mom, 8, umu=umu, phi=phi,
                      corint=True, **kw)
        r = float(np.asarray(ref.uu)[1, 0, 0])
        e_lo = abs(float(np.asarray(lo.uu)[1, 0, 0]) - r)
        e_cor = abs(float(np.asarray(cor.uu)[1, 0, 0]) - r)
        assert e_cor < e_lo, (e_cor, e_lo, r)


class TestSelfConvergence:
    @pytest.mark.slow
    def test_nstr_convergence(self):
        """Fluxes converge as nstr grows (Richardson-style sanity)."""
        mom = hg_moments(0.75, 130)
        vals = []
        for nstr in [8, 16, 32]:
            out = solve_rte(
                dtauc=jnp.array([2.0]),
                ssalb=jnp.array([0.95]),
                pmom=jnp.array(np.tile(mom, (1, 1))),
                nstr=nstr,
                fbeam=1.0,
                umu0=0.6,
                albedo=0.1,
                dtype=jnp.float64,
            )
            vals.append(float(out.flup[0]))
        assert abs(vals[2] - vals[1]) < abs(vals[1] - vals[0])
        assert abs(vals[2] - vals[1]) < 2e-4 * abs(vals[2])


@pytest.mark.slow
def test_batched_radiances_match_loop():
    """Radiance path with a leading BATCH axis == per-column solves.

    Regression: _ims_correction dropped the batch axis of mu0 (broadcast
    error for any batched radiance run — BASELINE config 4 shape); the
    batchless tests never caught it.
    """
    import jax.numpy as jnp

    from sbdart_tpu.solver.disort import solve_rte

    nstr, nlyr, nb = 8, 5, 3
    rng = np.random.default_rng(4)
    dtau = rng.uniform(0.05, 0.5, (nb, nlyr))
    ssalb = rng.uniform(0.3, 0.95, (nb, nlyr))
    g = rng.uniform(0.2, 0.8, (nb, nlyr))
    pmom = g[..., None] ** np.arange(25)
    umu0 = rng.uniform(0.3, 0.9, nb)
    alb = rng.uniform(0.0, 0.5, nb)
    umu = np.array([0.4, -0.6])
    phi = np.array([0.0, 120.0])

    kw = dict(nstr=nstr, onlyfl=False, umu=umu, phi=phi, dtype=jnp.float64)
    batched = solve_rte(
        jnp.asarray(dtau), jnp.asarray(ssalb), jnp.asarray(pmom),
        fbeam=jnp.ones(nb), umu0=jnp.asarray(umu0), albedo=jnp.asarray(alb),
        **kw,
    )
    for i in range(nb):
        single = solve_rte(
            jnp.asarray(dtau[i]), jnp.asarray(ssalb[i]),
            jnp.asarray(pmom[i]), fbeam=1.0, umu0=float(umu0[i]),
            albedo=float(alb[i]), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(batched.uu[i]), np.asarray(single.uu),
            rtol=1e-10, atol=1e-12,
        )
