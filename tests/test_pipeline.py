"""End-to-end spectral pipeline tests — the four single-column BASELINE
configs (clear SW, thermal IR, cloud SW+LW, aerosol radiances) at reduced
spectral resolution, checked for physical consistency."""

import numpy as np
import pytest

from sbdart_tpu.config import Config
from sbdart_tpu.pipeline import run_pipeline
from sbdart_tpu.outputs import (
    format_iout,
    heating_rates,
    integrate_spectral,
    summary_fluxes,
)


@pytest.fixture(scope="module")
def clear_sw():
    # BASELINE config 1 shape: clear-sky SW, midlat summer, 4 streams
    cfg = Config(idatm=2, wlinf=0.30, wlsup=2.0, wlinc=0.02, nstr=4,
                 sza=30.0, isalb=0, albcon=0.2)
    return run_pipeline(cfg)


class TestClearSky(object):
    def test_energy_sanity(self, clear_sw):
        s = summary_fluxes(clear_sw)
        topdn = integrate_spectral(clear_sw, s["topdn"])
        topup = integrate_spectral(clear_sw, s["topup"])
        botdn = integrate_spectral(clear_sw, s["botdn"])
        botup = integrate_spectral(clear_sw, s["botup"])
        inc = integrate_spectral(clear_sw, clear_sw.fbeam_toa) * clear_sw.csza
        # TOA down equals incident beam flux
        np.testing.assert_allclose(topdn, inc, rtol=1e-6)
        # sensible magnitudes for sza=30, 0.3-2.0 um window
        assert 700 < inc < 1100
        assert 0 < topup < inc
        assert 0.5 * inc < botdn < inc          # clear sky transmits most
        np.testing.assert_allclose(botup, 0.2 * botdn, rtol=1e-6)  # Lambertian
        # absorbed by atmosphere+surface = in - out
        assert 0 < inc - topup

    def test_uv_cutoff_by_ozone(self, clear_sw):
        # below 0.31 um the surface flux must be strongly depleted
        i_uv = np.argmin(np.abs(clear_sw.wl - 0.30))
        i_vis = np.argmin(np.abs(clear_sw.wl - 0.55))
        surf = clear_sw.fdir + clear_sw.fdn
        t_uv = surf[i_uv, -1] / max(clear_sw.fbeam_toa[i_uv] * clear_sw.csza, 1e-30)
        t_vis = surf[i_vis, -1] / max(clear_sw.fbeam_toa[i_vis] * clear_sw.csza, 1e-30)
        assert t_uv < 0.5 * t_vis

    def test_water_vapor_bands_visible(self, clear_sw):
        surf = clear_sw.fdir + clear_sw.fdn
        trans = surf[:, -1] / np.maximum(clear_sw.fbeam_toa * clear_sw.csza, 1e-30)
        i_140 = np.argmin(np.abs(clear_sw.wl - 1.38))
        i_124 = np.argmin(np.abs(clear_sw.wl - 1.24))
        assert trans[i_140] < 0.5 * trans[i_124]   # 1.38 um band absorbs

    def test_iout_formats_render(self, clear_sw):
        for iout in (1, 7, 10, 11):
            txt = format_iout(
                type(clear_sw)(**{**clear_sw.__dict__,
                                  "cfg": clear_sw.cfg.replace(iout=iout)})
            )
            assert len(txt.splitlines()) >= 1


class TestThermalIR(object):
    @pytest.fixture(scope="class")
    def lw(self):
        # BASELINE config 2 shape: thermal IR, tropical, 4-40 um
        cfg = Config(idatm=1, wlinf=4.0, wlsup=40.0, wlinc=-40.0, nstr=4,
                     isalb=0, albcon=0.0)
        return run_pipeline(cfg)

    def test_olr_magnitude(self, lw):
        olr = integrate_spectral(lw, lw.fup[:, 0])
        # tropical OLR over 4-40 um: roughly 200-320 W/m^2
        assert 160 < olr < 340, olr

    def test_surface_down_less_than_blackbody(self, lw):
        from sbdart_tpu.constants import STEFAN_BOLTZMANN
        dn_sfc = integrate_spectral(lw, (lw.fdir + lw.fdn)[:, -1])
        ts = lw.profile.t[-1]
        assert 0.4 * STEFAN_BOLTZMANN * ts**4 < dn_sfc < STEFAN_BOLTZMANN * ts**4

    def test_window_vs_co2_band(self, lw):
        i_win = np.argmin(np.abs(lw.wl - 11.0))
        i_co2 = np.argmin(np.abs(lw.wl - 15.0))
        ts = lw.profile.t[-1]
        from sbdart_tpu.solver.planck import planck_band
        # window: OLR close to surface Planck; CO2 band: much colder
        b_win = np.pi * float(planck_band(1e4 / 11.5, 1e4 / 10.5, ts)) / (
            1e4 / 10.5 - 1e4 / 11.5
        ) * (1e4 / 10.5 - 1e4 / 11.5)
        assert lw.fup[i_co2, 0] < lw.fup[i_win, 0]

    def test_stratospheric_cooling_sign(self, lw):
        _, heat = heating_rates(lw)
        # LW cooling in the troposphere (negative heating)
        trop = (lw.profile.z[:-1] < 10.0)
        assert heat[trop].mean() < 0


class TestCloud(object):
    def test_cloud_brightens_albedo(self):
        # BASELINE config 3 shape (reduced): water cloud SW
        base = Config(idatm=2, wlinf=0.4, wlsup=1.0, wlinc=0.05, nstr=16,
                      sza=30.0, albcon=0.05)
        clear = run_pipeline(base)
        cloudy = run_pipeline(base.replace(
            zcloud=[2.0, 0, 0, 0, 0], tcloud=[20.0, 0, 0, 0, 0],
            nre=[8.0, 8, 8, 8, 8],
        ))
        r_clear = integrate_spectral(clear, clear.fup[:, 0]) / max(
            integrate_spectral(clear, (clear.fdir + clear.fdn)[:, 0]), 1e-30)
        r_cloud = integrate_spectral(cloudy, cloudy.fup[:, 0]) / max(
            integrate_spectral(cloudy, (cloudy.fdir + cloudy.fdn)[:, 0]), 1e-30)
        assert r_cloud > 3 * r_clear
        assert 0.3 < r_cloud < 0.9
        # direct beam extinguished below cloud
        assert cloudy.fdir[:, -1].max() < 1e-3 * clear.fdir[:, -1].max()

    def test_cloud_lw_greenhouse(self):
        base = Config(idatm=1, wlinf=8.0, wlsup=13.0, wlinc=-20.0, nstr=8)
        clear = run_pipeline(base)
        cloudy = run_pipeline(base.replace(
            zcloud=[8.0, 0, 0, 0, 0], lwp=[100.0, 0, 0, 0, 0],
            nre=[10.0, 8, 8, 8, 8],
        ))
        olr_clear = integrate_spectral(clear, clear.fup[:, 0])
        olr_cloud = integrate_spectral(cloudy, cloudy.fup[:, 0])
        assert olr_cloud < 0.8 * olr_clear   # high cloud lowers window OLR


class TestAerosolRadiance(object):
    @pytest.mark.slow
    def test_aerosol_radiances(self):
        # BASELINE config 4 shape (reduced): rural BL aerosol, radiances
        cfg = Config(
            idatm=2, wlinf=0.55, wlsup=0.55, nstr=16, sza=40.0,
            iaer=1, vis=10.0, albcon=0.1, iout=20,
            nzen=4, uzen=[0.0, 30.0, 60.0, 75.0] + [-1.0] * 16,
            nphi=3, phi=[0.0, 90.0, 180.0] + [-1.0] * 17,
        )
        res = run_pipeline(cfg)
        assert res.uu is not None
        assert res.uu.shape == (1, res.nlev, 4, 3)
        assert np.all(res.uu >= -1e-9)
        # aerosol loading increases TOA radiance over dark surface
        res_clean = run_pipeline(cfg.replace(iaer=0))
        assert res.uu[0, 0].mean() > res_clean.uu[0, 0].mean()
        # output renders
        txt = format_iout(res)
        assert "0.55" in txt or "0.550" in txt

    def test_aerosol_reduces_direct(self):
        base = Config(idatm=2, wlinf=0.55, wlsup=0.55, nstr=8, sza=40.0)
        hazy = base.replace(iaer=1, vis=5.0)
        r0 = run_pipeline(base)
        r1 = run_pipeline(hazy)
        assert r1.fdir[0, -1] < r0.fdir[0, -1]
        # total down changes much less than direct (scattering, not removal)
        assert (r0.fdir[0, -1] - r1.fdir[0, -1]) > 2 * abs(
            (r0.fdir + r0.fdn)[0, -1] - (r1.fdir + r1.fdn)[0, -1]
        )
