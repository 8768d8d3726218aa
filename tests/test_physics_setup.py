"""Tests of the physics setup layers: model atmospheres, profile scalings,
Rayleigh, solar geometry/spectrum, surface albedo, and the gas k-distribution
machinery (internal consistency of the Malkmus quantiles)."""

import numpy as np
import pytest

from sbdart_tpu.config import Config
from sbdart_tpu.atmosphere import build_profile, Profile, regrid
from sbdart_tpu.data.atmospheres import model_atmosphere
from sbdart_tpu.rayleigh import rayleigh_tau_column, rayleigh_layer_tau
from sbdart_tpu.solar import zensun, solar_geometry, spectral_grid
from sbdart_tpu.data.solar import solar_table, solar_irradiance
from sbdart_tpu.surface import surface_albedo
from sbdart_tpu.gas import (
    malkmus_transmission,
    malkmus_k_quantiles,
    gas_optical_depth,
    _GL3_W,
)


class TestAtmospheres:
    @pytest.mark.parametrize("idatm", [1, 2, 3, 4, 5, 6])
    def test_profiles_physical(self, idatm):
        m = model_atmosphere(idatm)
        # TOA-first: z decreasing, p increasing
        assert np.all(np.diff(m["z"]) < 0)
        assert np.all(np.diff(m["p"]) > 0)
        assert 1000.0 < m["p"][-1] < 1025.0
        assert np.all((150.0 < m["t"]) & (m["t"] < 320.0))
        assert np.all(m["wh"] >= 0) and np.all(m["wo"] >= 0)

    def test_us76_transcribed_table(self):
        """idatm=6 is the TRANSCRIBED USSA-1976 table (round 4): spot-pin
        published digits and the internal hydrostatic consistency that
        validates the transcription — in the standard's own geopotential-
        height formulation the 0-20 km residual is < 3e-4 per layer."""
        from sbdart_tpu.data.atmospheres import US76_TABLE

        tab = {row[0]: (row[1], row[2]) for row in US76_TABLE}
        assert tab[0.0] == (288.15, 1013.25)
        assert tab[11.0] == (216.77, 226.99)
        assert tab[20.0] == (216.65, 55.293)
        assert tab[50.0] == (270.65, 0.79779)
        z, t, p = US76_TABLE[:, 0], US76_TABLE[:, 1], US76_TABLE[:, 2]
        g, molm, rgas, rearth = 9.80665, 28.9644e-3, 8.31446, 6356.766
        # USSA-1976 is defined on GEOPOTENTIAL height with constant g0
        h = z * rearth / (rearth + z)
        sel = z <= 20.0
        hi, ti, pi = h[sel], t[sel], p[sel]
        for i in range(len(hi) - 1):
            tbar = 0.5 * (ti[i] + ti[i + 1])
            pred = pi[i] * np.exp(
                -g * molm * (hi[i + 1] - hi[i]) * 1e3 / (rgas * tbar)
            )
            assert abs(pred - pi[i + 1]) / pi[i + 1] < 3e-4, i
        # and the model atmosphere uses it verbatim
        m = model_atmosphere(6)
        assert m["p"][-1] == 1013.25 and m["t"][-1] == 288.15

    def test_mcclatchey_transcribed_tables(self):
        """idatm=1..5 are TRANSCRIBED McClatchey et al. (1972) tables
        (round 5).  Two transcription self-checks:

        1. hydrostatic closure of every layer below 50 km on geometric
           altitude with g(z) — the 3-significant-digit pressures close to
           < 0.8% per layer (a fabricated or misremembered p/T pair would
           not);
        2. spot-pins of the published surface / tropopause digits.
        """
        from sbdart_tpu.data.atmospheres import MCCLATCHEY_TABLES, Z33

        g0, molm, rgas, rearth = 9.80665, 28.9644e-3, 8.31446, 6356.766
        for idatm, tab in MCCLATCHEY_TABLES.items():
            p, t = tab[:, 0], tab[:, 1]
            for i in range(len(Z33) - 1):
                if Z33[i + 1] > 50.0:
                    break
                zf = np.linspace(Z33[i], Z33[i + 1], 201)
                tf = np.interp(zf, [Z33[i], Z33[i + 1]], [t[i], t[i + 1]])
                gf = g0 * (1.0 + zf / rearth) ** -2
                integ = np.trapezoid(gf * molm / (rgas * tf), zf * 1e3)
                pred = p[i] * np.exp(-integ)
                rel = abs(pred - p[i + 1]) / p[i + 1]
                assert rel < 8e-3, (idatm, Z33[i + 1], rel)
        # published surface digits (p [mb], T [K], wv [g/m^3])
        surf = {1: (1013.0, 300.0, 19.0), 2: (1013.0, 294.0, 14.0),
                3: (1018.0, 272.2, 3.5), 4: (1010.0, 287.0, 9.1),
                5: (1013.0, 257.1, 1.2)}
        for idatm, (ps, ts, ws) in surf.items():
            tab = MCCLATCHEY_TABLES[idatm]
            assert tab[0, 0] == ps and tab[0, 1] == ts and tab[0, 2] == ws
        # tropical tropopause: T minimum 195 K at 17 km
        trop = MCCLATCHEY_TABLES[1]
        assert trop[17, 1] == 195.0 and trop[:, 1].min() == 195.0

    def test_columns_match_published(self):
        # published precipitable water / ozone columns.  Water closes to
        # < 3%; ozone to < 8% (2-significant-digit transcribed densities +
        # coarse-grid trapezoid bias — see data/atmospheres.py provenance)
        expect_w = {1: 4.12, 2: 2.92, 3: 0.85, 4: 2.09, 5: 0.42, 6: 1.42}
        expect_o3 = {1: 0.247, 2: 0.331, 3: 0.376, 4: 0.344, 5: 0.480, 6: 0.349}
        for idatm in range(1, 7):
            p = build_profile(Config(idatm=idatm))
            np.testing.assert_allclose(p.column_h2o(), expect_w[idatm], rtol=0.03)
            np.testing.assert_allclose(p.column_o3(), expect_o3[idatm], rtol=0.08)

    def test_user_profile_ozone_amount(self):
        """A user atms.dat profile's ozone amount in atm-cm uses the true
        ozone STP density (48 g/mol / 22414 cm^3/mol = 2.1415e-3 g/cm^3).
        Through round 4 the constant was 10x too large — harmless for the
        built-in models (normalized through the same constant) but it made
        user-profile ozone columns 10x too small."""
        from sbdart_tpu.atmosphere import user_profile_from_array

        # two-level column: 1 km thick, constant 5e-4 g/m^3 ozone
        # -> 5e-4 g/m^3 * 1000 m = 0.5 g/m^2 = 5e-5 g/cm^2
        # -> / 2.1415e-3 g/cm^3 = 2.335e-2 atm-cm
        data = np.array([
            [0.0, 1013.0, 288.0, 1.0, 5e-4],
            [1.0, 900.0, 281.0, 0.8, 5e-4],
        ])
        prof = user_profile_from_array(data)
        np.testing.assert_allclose(prof.column_o3(), 5e-5 / 2.1415e-3,
                                   rtol=1e-10)

    def test_uw_uo3_scaling(self):
        p = build_profile(Config(idatm=2, uw=1.0, uo3=0.25))
        np.testing.assert_allclose(p.column_h2o(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(p.column_o3(), 0.25, rtol=1e-6)

    def test_pbar_scaling(self):
        p = build_profile(Config(idatm=2, pbar=800.0))
        np.testing.assert_allclose(p.p[-1], 800.0, rtol=1e-9)

    def test_regrid_preserves_columns(self):
        p = build_profile(Config(idatm=2))
        q = regrid(p, 50, 0.5, 10.0)
        assert q.nlev >= 30
        np.testing.assert_allclose(q.column_h2o(), p.column_h2o(), rtol=0.05)

    def test_air_column(self):
        p = build_profile(Config(idatm=6))
        # whole-column air mass ~ 1013 mb -> 2.15e25 molecules/cm^2
        np.testing.assert_allclose(p.layer_air().sum(), 2.15e25, rtol=0.03)


class TestRayleigh:
    def test_column_at_055(self):
        # canonical value ~0.097 at 0.55 um, 1013.25 mb
        np.testing.assert_allclose(rayleigh_tau_column(0.55), 0.0973, rtol=0.02)

    def test_wavelength_dependence(self):
        t = rayleigh_tau_column(np.array([0.35, 0.55, 1.0]))
        assert t[0] > t[1] > t[2]
        # close to lambda^-4
        np.testing.assert_allclose(t[1] / t[2], (1.0 / 0.55) ** 4, rtol=0.05)

    def test_layer_sum(self):
        p = build_profile(Config(idatm=2))
        tl = rayleigh_layer_tau(np.array([0.55]), p.p)
        np.testing.assert_allclose(
            tl.sum(), rayleigh_tau_column(0.55) * p.p[-1] / 1013.25, rtol=1e-6
        )


class TestSolar:
    def test_zensun_equinox_noon_equator(self):
        zen, _azi, sf = zensun(80, 12.0, 0.0, 0.0)  # ~Mar 21 noon UTC at 0,0
        assert zen < 4.0
        assert 0.96 < sf < 1.04

    def test_zensun_polar_night(self):
        zen, _, _ = zensun(355, 12.0, 80.0, 0.0)  # late Dec, 80N
        assert zen > 90.0

    def test_solar_constant(self):
        # the default database (nf=2, LOWTRAN7) integrates to its documented
        # solar constant (full per-database checks: tests/test_solar_db.py)
        wl, e = solar_table()
        np.testing.assert_allclose(np.trapezoid(e, wl), 1368.0, rtol=1e-6)

    def test_solar_peak_region(self):
        e = solar_irradiance(np.array([0.50, 0.55]))
        assert 1600 < e[0] < 2200 and 1600 < e[1] < 2100

    def test_geometry_priority(self):
        c, _ = solar_geometry(Config(sza=60.0))
        np.testing.assert_allclose(c, 0.5, atol=1e-12)
        c2, _ = solar_geometry(Config(sza=60.0, csza=0.9))
        np.testing.assert_allclose(c2, 0.9)

    def test_spectral_grid_modes(self):
        g1 = spectral_grid(Config(wlinf=0.4, wlsup=0.5, wlinc=0.01))
        np.testing.assert_allclose(g1[1] - g1[0], 0.01)
        g2 = spectral_grid(Config(wlinf=4.0, wlsup=20.0, wlinc=-20.0 - 1e-9))
        assert len(g2) > 50
        g3 = spectral_grid(Config(wlinf=0.55, wlsup=0.55))
        assert len(g3) == 1


class TestSurface:
    def test_constant(self):
        a = surface_albedo(Config(isalb=0, albcon=0.3), np.array([0.4, 1.0]))
        np.testing.assert_allclose(a, 0.3)

    def test_snow_bright_vis_dark_nir(self):
        a = surface_albedo(Config(isalb=1), np.array([0.5, 1.6]))
        assert a[0] > 0.9 and a[1] < 0.3

    def test_vegetation_red_edge(self):
        a = surface_albedo(Config(isalb=6), np.array([0.66, 0.85]))
        assert a[1] > 4 * a[0]

    def test_mixture(self):
        cfg = Config(isalb=7, sc=[0.5, 0.5, 0.0, 0.0])
        a = surface_albedo(cfg, np.array([0.55]))
        s = surface_albedo(Config(isalb=5), np.array([0.55]))
        v = surface_albedo(Config(isalb=6), np.array([0.55]))
        np.testing.assert_allclose(a, 0.5 * s + 0.5 * v, rtol=1e-12)


class TestGasKDistribution:
    def test_malkmus_quantiles_reconstruct_transmission(self):
        """sum_i w_i exp(-k_i u) must approximate the Malkmus T(u) over a
        wide amount range — validates the analytic k-distribution + GL3."""
        s = np.array([0.5, 5.0, 50.0])
        beta = np.array([0.1, 0.2, 0.5])
        kq = malkmus_k_quantiles(s, beta)          # [3 bands, 3 terms]
        for i in range(3):
            for u in [0.01 / s[i], 0.3 / s[i], 1.0 / s[i], 3.0 / s[i]]:
                t_exact = malkmus_transmission(s[i], beta[i], u)
                t_k = np.sum(_GL3_W * np.exp(-kq[i] * u))
                np.testing.assert_allclose(t_k, t_exact, atol=0.04)

    def test_quantile_ratio_table_matches_direct(self):
        """The log-beta ratio-table path (used per (band, layer) for the
        Curtis-Godson beta_l) matches the direct cumulative inversion."""
        from sbdart_tpu.gas import malkmus_k_quantiles_beta

        rng = np.random.default_rng(3)
        s = rng.uniform(0.1, 100.0, 40)
        beta = 10.0 ** rng.uniform(-5, 2, 40)
        kq_direct = malkmus_k_quantiles(s, beta)
        kq_table = malkmus_k_quantiles_beta(s, beta)
        np.testing.assert_allclose(kq_table, kq_direct, rtol=2e-3)
        # arbitrary-shape broadcast: [nb, nlyr]
        s2 = np.broadcast_to(s[:, None], (40, 7))
        b2 = np.broadcast_to(beta[:, None], (40, 7))
        kq2 = malkmus_k_quantiles_beta(s2, b2)
        assert kq2.shape == (40, 7, 3)
        np.testing.assert_allclose(kq2[:, 0, :], kq_table, rtol=1e-12)

    def test_cg_weak_limit_pressure_free_analytic(self):
        """Two-parameter Curtis-Godson, ANALYTIC path (the gray/minor-gas
        treatment): in the weak (linear) limit the column absorption
        equals S*u with NO pressure factor — the round-4 one-parameter
        scaling u (p/p0)^a suppressed weak-line absorption aloft by the
        full pressure ratio.  (The 3-term quantile path approaches this
        only at quadrature fidelity: 3 Gauss points under-resolve the
        extreme skew of small-beta k-distributions — a documented
        limitation shared with the reference's 3-term fit, see gas.py.)"""
        s = 1.0
        u = 1e-6
        for pfac in (1.0, 0.3, 0.05):
            t = malkmus_transmission(s, 0.1 * pfac, u)
            np.testing.assert_allclose(1.0 - t, s * u, rtol=1e-3)

    def test_malkmus_quantiles_structure(self):
        """Quantiles are positive, ordered, and bracket the band strength."""
        s = np.array([2.0, 20.0])
        beta = np.array([0.3, 0.1])
        kq = malkmus_k_quantiles(s, beta)
        assert np.all(kq > 0)
        assert np.all(np.diff(kq, axis=1) > 0)
        assert np.all(kq[:, 0] < s) and np.all(kq[:, 2] < 50 * s[:, None].squeeze())

    def test_gas_tau_spectral_structure(self):
        p = build_profile(Config(idatm=1))
        cfg = Config(idatm=1)
        wl = np.array([0.55, 0.94, 1.38, 4.3, 10.0, 15.0])
        tau, wk = gas_optical_depth(p, cfg, wl)
        np.testing.assert_allclose(wk.sum(axis=1), 1.0, rtol=1e-12)
        tmean = np.einsum("wk,wkl->w", wk, tau)    # weighted column tau
        col = {w: t for w, t in zip(wl, tmean)}
        assert col[0.55] < 0.1                      # visible: nearly clean
        assert col[0.94] > 0.1                      # H2O band absorbs
        assert col[1.38] > col[0.94]                # stronger H2O band
        assert col[4.3] > 3.0                       # CO2 4.3um saturated
        assert col[15.0] > 1.0                      # CO2 15um strong
        assert col[10.0] < 1.0                      # window semi-transparent

    def test_transmission_nonincreasing_in_amount(self):
        p = build_profile(Config(idatm=1))
        wl = np.array([0.94])
        t1, w1 = gas_optical_depth(p, Config(idatm=1), wl)
        cfg2 = Config(idatm=1, uw=2 * p.column_h2o())
        p2 = build_profile(cfg2)
        t2, w2 = gas_optical_depth(p2, cfg2, wl)
        tr1 = np.sum(w1[0] * np.exp(-t1[0].sum(axis=-1)))
        tr2 = np.sum(w2[0] * np.exp(-t2[0].sum(axis=-1)))
        assert tr2 < tr1
