"""Work-or-raise semantics for accepted namelist parameters.

Every parameter the namelist loader accepts must either do what the
reference does (sbdart.f &INPUT semantics) or raise loudly — silent no-ops
are drop-in-compatibility landmines (VERDICT round 1, missing #5).
"""

import numpy as np
import pytest

from sbdart_tpu.atmosphere import build_profile
from sbdart_tpu.config import Config
from sbdart_tpu.optics import component_moments
from sbdart_tpu.pipeline import run_albtrn, run_pipeline


class TestIbcnd:
    def test_run_pipeline_refuses_ibcnd1(self):
        cfg = Config(ibcnd=1, nzen=1, uzen=[60.0] + [-1.0] * 19)
        with pytest.raises(ValueError, match="run_albtrn"):
            run_pipeline(cfg)

    def test_run_albtrn_dispatch(self):
        """ibcnd=1 produces physical slab albedo/transmission per angle."""
        cfg = Config(
            ibcnd=1, idatm=2, wlinf=0.45, wlsup=0.45, nstr=8,
            nzen=3, uzen=[10.0, 50.0, 75.0] + [-1.0] * 17,
        )
        res = run_albtrn(cfg)
        assert res.albmed.shape == (1, 3)
        assert np.all(res.albmed >= 0) and np.all(res.albmed <= 1)
        assert np.all(res.trnmed >= 0) and np.all(res.trnmed <= 1)
        # Rayleigh atmosphere at 0.45 um: oblique incidence reflects more
        assert res.albmed[0, 2] > res.albmed[0, 0]
        # near-conservative: closure within the gas-absorption budget
        assert np.all(res.albmed + res.trnmed > 0.9)

    def test_run_albtrn_needs_angles(self):
        with pytest.raises(ValueError, match="nzen"):
            run_albtrn(Config(ibcnd=1))


class TestZout:
    def test_zout_levels_inserted(self):
        cfg = Config(idatm=2, zout=[0.37, 41.3])
        prof = build_profile(cfg)
        assert np.abs(prof.z - 0.37).min() < 1e-9
        assert np.abs(prof.z - 41.3).min() < 1e-9
        # monotone TOA-first grid preserved
        assert np.all(np.diff(prof.z) < 0)

    def test_zout_outside_column_clamped(self):
        cfg = Config(idatm=2, zout=[0.0, 100.0])
        prof = build_profile(cfg)     # defaults coincide with grid levels
        assert len(prof.z) == 33

    def test_at_altitude_interpolates(self):
        from sbdart_tpu.outputs import at_altitude

        class FakeProfile:
            z = np.array([10.0, 5.0, 0.0])

        class FakeRes:
            profile = FakeProfile()
            cfg = Config()

        field = np.array([[0.0, 1.0, 2.0]])      # linear in level index
        assert at_altitude(FakeRes(), field, 7.5)[0] == pytest.approx(0.5)
        assert at_altitude(FakeRes(), field, 5.0)[0] == pytest.approx(1.0)
        assert at_altitude(FakeRes(), field, 12.0)[0] == pytest.approx(0.0)
        assert at_altitude(FakeRes(), field, -1.0)[0] == pytest.approx(2.0)


class TestPhaseSelectors:
    def test_imom_isotropic_rayleigh_hg(self):
        g = np.full((2, 3), 0.6)
        iso = component_moments(g, 1, 5)
        assert np.allclose(iso[..., 0], 1.0) and np.allclose(iso[..., 1:], 0.0)
        ray = component_moments(g, 2, 5)
        assert np.allclose(ray[..., 2], 0.1)
        hg = component_moments(g, 3, 5)
        assert np.allclose(hg[..., 2], 0.36)

    def test_imom_unsupported_raises(self):
        with pytest.raises(NotImplementedError, match="imomc/imoma"):
            component_moments(np.zeros((1, 1)), 7, 5)

    def test_pmaer_overrides(self):
        um = np.array([0.5, 0.2])
        m = component_moments(np.full((1, 1), 0.9), 3, 5, user_moments=um)
        assert np.allclose(m[0, 0], [1.0, 0.5, 0.2, 0.0, 0.0])

    def test_pmaer_through_pipeline(self):
        """pmaer actually changes the answer (was a silent no-op)."""
        base = Config(
            idatm=2, wlinf=0.55, wlsup=0.55, nstr=8, sza=40.0,
            iaer=5, tbaer=0.4, wbaer=[0.9] * 5, gbaer=[0.7] * 5,
        )
        r_hg = run_pipeline(base)
        r_pm = run_pipeline(base.replace(pmaer=[0.0, 0.0]))  # ~isotropic
        # forward-peaked HG transmits more beam-direction flux to the surface
        assert r_hg.fdn[0, -1] != pytest.approx(r_pm.fdn[0, -1], rel=1e-3)


class TestSpowder:
    """spowder: sub-surface snow-powder slab (sbdart.f namelist, SURVEY A1).

    Provisional semantics (mount empty): a semi-infinite coarse-ice-grain
    scattering layer below the surface — bright in the visible, strongly
    absorbing in the NIR (ice optics), hiding the underlying surface."""

    def _refl(self, wl, **kw):
        cfg = Config(idatm=2, wlinf=wl, wlsup=wl, sza=30.0, nstr=4,
                     spowder=True, **kw)
        r = run_pipeline(cfg)
        dn = r.fdir[0, -1] + r.fdn[0, -1]
        return float(r.fup[0, -1] / max(dn, 1e-12))

    def test_visible_bright_nir_dark(self):
        r_vis = self._refl(0.55, albcon=0.2)
        r_nir = self._refl(1.6, albcon=0.2)
        assert r_vis > 0.7, r_vis         # fresh-powder visible brightness
        assert r_nir < 0.3, r_nir         # ice absorption darkens the NIR
        assert r_nir < r_vis - 0.4        # spectrally correct darkening

    def test_powder_hides_surface(self):
        """Semi-infinite slab: the underlying albedo is invisible."""
        a = self._refl(0.55, albcon=0.0)
        b = self._refl(0.55, albcon=0.9)
        assert a == pytest.approx(b, abs=0.02)

    def test_darker_than_snow_albedo_at_nir(self):
        """At 1.6 um the 100 um-grain powder (Mie ice, w0 ~ 0.87,
        semi-infinite albedo ~ 0.12) is darker than the isalb=1 snow
        ALBEDO curve (0.14) — coarse-grain absorption that the Lambertian
        curve's fixed grain size misses."""
        from sbdart_tpu.surface import surface_albedo

        snow_alb = float(
            surface_albedo(Config(isalb=1), np.array([1.6]))[0]
        )
        r = self._refl(1.6, albcon=0.2)
        assert r < snow_alb


class TestRefusals:
    def test_krhclr_invalid_raises(self):
        from sbdart_tpu.atmosphere import build_profile
        from sbdart_tpu.clouds import apply_cloud_humidity

        cfg = Config(krhclr=2, rhcld=90.0,
                     zcloud=[2.0, 0, 0, 0, 0], tcloud=[5.0, 0, 0, 0, 0])
        with pytest.raises(ValueError, match="krhclr"):
            apply_cloud_humidity(build_profile(cfg), cfg)


class TestKrhclr:
    """rhcld + krhclr semantics (clouds.py:apply_cloud_humidity)."""

    def _profiles(self, krhclr):
        from sbdart_tpu.atmosphere import build_profile
        from sbdart_tpu.clouds import apply_cloud_humidity

        cfg = Config(idatm=2, rhcld=95.0, krhclr=krhclr,
                     zcloud=[2.0, 0, 0, 0, 0], tcloud=[8.0, 0, 0, 0, 0])
        p0 = build_profile(cfg)
        return p0, apply_cloud_humidity(p0, cfg)

    @staticmethod
    def _col(profile):
        lay = 0.5 * (profile.wh[:-1] + profile.wh[1:])
        return float(np.sum(lay * -np.diff(profile.z)))

    def test_krhclr0_preserves_column_vapor(self):
        p0, p1 = self._profiles(0)
        assert self._col(p1) == pytest.approx(self._col(p0), rel=1e-10)
        # and the in-cloud humidity actually changed
        assert not np.allclose(p0.wh, p1.wh)

    def test_krhclr1_keeps_clear_layers(self):
        p0, p1 = self._profiles(1)
        clear = p0.z > 4.0     # above the 2 km cloud (+0.5 km margin)
        np.testing.assert_allclose(p1.wh[clear], p0.wh[clear])
        # in-cloud levels humidified
        incld = np.abs(p0.z - 2.0) <= 0.5
        assert not np.allclose(p1.wh[incld], p0.wh[incld])
        # column vapor differs from original (no compensation)
        assert self._col(p1) != pytest.approx(self._col(p0), rel=1e-6)
