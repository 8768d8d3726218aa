"""Analytic and structural tests of the monochromatic DOM solver (flux path).

The reference validates its solver with an embedded self-test
(disort.f:SLFTST) and the published DISORT test battery; with the reference
mount empty (SURVEY.md section 0) the equivalents here are *analytic* limits
(Beer–Lambert, blackbody cavity, energy conservation) plus structural
invariances (layer-split) that jointly pin down the eig/sources/BVP chain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.solver.disort import solve_rte
from sbdart_tpu.solver.quadrature import double_gauss
from sbdart_tpu.solver.planck import planck_band


def hg_moments(g, nmom):
    return np.array([g**l for l in range(nmom)])


class TestBeerLambert:
    """Pure absorption (w0 = 0): only the direct beam survives."""

    @pytest.mark.parametrize("nstr", [4, 16])
    def test_direct_only(self, nstr):
        tau = np.array([0.1, 0.4, 0.8])
        out = solve_rte(
            dtauc=jnp.array(tau),
            ssalb=jnp.zeros(3),
            pmom=jnp.array(np.tile(hg_moments(0.0, nstr + 1), (3, 1))),
            nstr=nstr,
            fbeam=1.0,
            umu0=0.6,
            dtype=jnp.float64,
        )
        tot = np.concatenate([[0.0], np.cumsum(tau)])
        np.testing.assert_allclose(
            np.asarray(out.rfldir), 0.6 * np.exp(-tot / 0.6), rtol=1e-12
        )
        np.testing.assert_allclose(np.asarray(out.rfldn), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.flup), 0.0, atol=1e-12)

    def test_lambertian_reflection_of_beam(self):
        tau = np.array([0.3])
        alb = 0.4
        mu0 = 0.5
        out = solve_rte(
            dtauc=jnp.array(tau),
            ssalb=jnp.zeros(1),
            pmom=jnp.array(np.tile(hg_moments(0.0, 5), (1, 1))),
            nstr=16,
            fbeam=1.0,
            umu0=mu0,
            albedo=alb,
            dtype=jnp.float64,
        )
        fdir_bot = mu0 * np.exp(-tau[0] / mu0)
        np.testing.assert_allclose(
            float(out.flup[-1]), alb * fdir_bot, rtol=1e-10
        )
        # upward flux at top: reflected flux attenuated through quadrature
        mu, w = double_gauss(16)
        expect_top = alb * fdir_bot * 2.0 * np.sum(w * mu * np.exp(-tau[0] / mu))
        np.testing.assert_allclose(float(out.flup[0]), expect_top, rtol=1e-10)

    def test_isotropic_top_source_transmission(self):
        # downward isotropic intensity fisot at top, pure absorber
        tau = np.array([0.5])
        fi = 2.0
        out = solve_rte(
            dtauc=jnp.array(tau),
            ssalb=jnp.zeros(1),
            pmom=jnp.array(np.tile(hg_moments(0.0, 5), (1, 1))),
            nstr=16,
            fisot=fi,
            dtype=jnp.float64,
        )
        np.testing.assert_allclose(float(out.rfldn[0]), np.pi * fi, rtol=1e-12)
        mu, w = double_gauss(16)
        expect_bot = 2 * np.pi * fi * np.sum(w * mu * np.exp(-tau[0] / mu))
        np.testing.assert_allclose(float(out.rfldn[-1]), expect_bot, rtol=1e-10)


class TestEnergyConservation:
    @pytest.mark.parametrize("g,nstr", [(0.0, 4), (0.75, 16), (0.85, 16)])
    def test_conservative_scattering(self, g, nstr):
        """w0 = 1: net flux is constant through the column."""
        tau = np.array([0.2, 1.0, 3.0, 0.5])
        out = solve_rte(
            dtauc=jnp.array(tau),
            ssalb=jnp.ones(4),
            pmom=jnp.array(np.tile(hg_moments(g, 2 * nstr + 1), (4, 1))),
            nstr=nstr,
            fbeam=1.0,
            umu0=0.7,
            albedo=0.0,
            dtype=jnp.float64,
        )
        fnet = np.asarray(out.rfldir) + np.asarray(out.rfldn) - np.asarray(out.flup)
        np.testing.assert_allclose(fnet, fnet[0], rtol=2e-6)
        # global budget: incident = reflected + transmitted
        inc = 0.7 * 1.0
        np.testing.assert_allclose(
            inc,
            float(out.flup[0]) + float(out.rfldir[-1] + out.rfldn[-1]),
            rtol=2e-6,
        )

    @pytest.mark.parametrize("w0", [0.3, 0.9, 0.999])
    def test_absorbing_budget_closes(self, w0):
        """Absorbed = divergence of net flux; check global budget > 0, < inc."""
        tau = np.array([0.5, 1.5])
        out = solve_rte(
            dtauc=jnp.array(tau),
            ssalb=jnp.full(2, w0),
            pmom=jnp.array(np.tile(hg_moments(0.6, 34), (2, 1))),
            nstr=16,
            fbeam=1.0,
            umu0=0.5,
            dtype=jnp.float64,
        )
        inc = 0.5
        refl = float(out.flup[0])
        trans = float(out.rfldir[-1] + out.rfldn[-1])
        absorbed = inc - refl - trans
        assert 0.0 < absorbed < inc
        assert refl > 0 and trans > 0


class TestLayerSplitInvariance:
    """A homogeneous slab must give identical results however it is split —
    exercises interface continuity, exponent scaling, and the BVP jointly."""

    @pytest.mark.parametrize("nstr", [4, 8, 16])
    def test_split(self, nstr):
        w0, g, tau_tot = 0.9, 0.7, 2.0
        mom = hg_moments(g, 2 * nstr + 2)

        def run(taus):
            nl = len(taus)
            return solve_rte(
                dtauc=jnp.array(taus),
                ssalb=jnp.full(nl, w0),
                pmom=jnp.array(np.tile(mom, (nl, 1))),
                nstr=nstr,
                fbeam=1.0,
                umu0=0.6,
                albedo=0.2,
                dtype=jnp.float64,
            )

        one = run([tau_tot])
        many = run([0.25, 0.75, 0.6, 0.4])
        for a, b, name in [
            (one.rfldn, many.rfldn, "rfldn"),
            (one.flup, many.flup, "flup"),
            (one.rfldir, many.rfldir, "rfldir"),
        ]:
            np.testing.assert_allclose(
                [float(a[0]), float(a[-1])],
                [float(b[0]), float(b[-1])],
                rtol=1e-9,
                atol=1e-12,
                err_msg=name,
            )


class TestThermal:
    def test_blackbody_cavity(self):
        """Isothermal atmosphere + black surface at same T + fisot = B:
        the field is exactly I = B everywhere (any w0, any phase)."""
        t = 260.0
        wlo, whi = 400.0, 600.0
        b = float(planck_band(wlo, whi, t))
        tau = np.array([0.3, 1.0, 2.0])
        out = solve_rte(
            dtauc=jnp.array(tau),
            ssalb=jnp.array([0.0, 0.5, 0.9]),
            pmom=jnp.array(np.tile(hg_moments(0.5, 34), (3, 1))),
            nstr=16,
            planck=True,
            temper=jnp.full(4, t),
            wvnlo=wlo,
            wvnhi=whi,
            albedo=0.0,
            fisot=b,
            dtype=jnp.float64,
        )
        np.testing.assert_allclose(np.asarray(out.rfldn), np.pi * b, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(out.flup), np.pi * b, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(out.dfdt), 0.0, atol=1e-8 * b)

    def test_opaque_isothermal_emits_planck(self):
        t = 288.0
        wlo, whi = 800.0, 1000.0
        b = float(planck_band(wlo, whi, t))
        out = solve_rte(
            dtauc=jnp.array([50.0, 50.0]),
            ssalb=jnp.zeros(2),
            pmom=jnp.array(np.tile(hg_moments(0.0, 5), (2, 1))),
            nstr=8,
            planck=True,
            temper=jnp.full(3, t),
            wvnlo=wlo,
            wvnhi=whi,
            albedo=0.0,
            dtype=jnp.float64,
        )
        np.testing.assert_allclose(float(out.flup[0]), np.pi * b, rtol=1e-6)
        np.testing.assert_allclose(float(out.rfldn[-1]), np.pi * b, rtol=1e-6)
        # top of atmosphere: no downwelling
        np.testing.assert_allclose(float(out.rfldn[0]), 0.0, atol=1e-10)

    def test_cold_atmosphere_warm_surface(self):
        """Thin cold atmosphere over warm black surface: OLR between the
        surface Planck flux (transparent limit) and atmosphere's own."""
        ts, ta = 300.0, 250.0
        wlo, whi = 500.0, 700.0
        bs = float(planck_band(wlo, whi, ts))
        out = solve_rte(
            dtauc=jnp.array([0.5]),
            ssalb=jnp.zeros(1),
            pmom=jnp.array(np.tile(hg_moments(0.0, 5), (1, 1))),
            nstr=16,
            planck=True,
            temper=jnp.full(2, ta),
            wvnlo=wlo,
            wvnhi=whi,
            btemp=ts,
            albedo=0.0,
            dtype=jnp.float64,
        )
        ba = float(planck_band(wlo, whi, ta))
        olr = float(out.flup[0])
        assert np.pi * ba < olr < np.pi * bs


class TestBatching:
    @pytest.mark.slow
    def test_batched_matches_loop(self):
        """Leading batch dims must reproduce individual solves exactly."""
        taus = np.array([[0.2, 0.8], [1.0, 0.1], [3.0, 2.0]])
        w0s = np.array([[0.3, 0.9], [0.99, 0.5], [0.7, 0.7]])
        mom = np.tile(hg_moments(0.6, 10), (3, 2, 1))
        mu0s = np.array([0.3, 0.6, 0.9])
        out_b = solve_rte(
            dtauc=jnp.array(taus),
            ssalb=jnp.array(w0s),
            pmom=jnp.array(mom),
            nstr=8,
            fbeam=jnp.ones(3),
            umu0=jnp.array(mu0s),
            albedo=jnp.array([0.0, 0.3, 0.8]),
            dtype=jnp.float64,
        )
        for i in range(3):
            out_i = solve_rte(
                dtauc=jnp.array(taus[i]),
                ssalb=jnp.array(w0s[i]),
                pmom=jnp.array(mom[i]),
                nstr=8,
                fbeam=1.0,
                umu0=mu0s[i],
                albedo=[0.0, 0.3, 0.8][i],
                dtype=jnp.float64,
            )
            np.testing.assert_allclose(
                np.asarray(out_b.rfldn)[i], np.asarray(out_i.rfldn),
                rtol=1e-12, atol=1e-15,
            )
            np.testing.assert_allclose(
                np.asarray(out_b.flup)[i], np.asarray(out_i.flup),
                rtol=1e-12, atol=1e-15,
            )
