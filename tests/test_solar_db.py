"""Solar-database and filter-library semantics (spectra.f equivalents)."""

import numpy as np
import pytest

from sbdart_tpu.config import Config
from sbdart_tpu.data.solar import solar_irradiance, solar_table
from sbdart_tpu.solar import filter_function, filter_list


class TestSolarDatabases:
    def test_databases_are_distinct(self):
        wl = np.arange(0.30, 1.0, 0.001)
        e1 = solar_irradiance(wl, 1)
        e2 = solar_irradiance(wl, 2)
        e3 = solar_irradiance(wl, 3)
        assert np.abs(e1 - e2).max() > 1.0
        assert np.abs(e2 - e3).max() > 1.0
        assert np.abs(e1 - e3).max() > 1.0

    @pytest.mark.parametrize("nf,tsi", [(1, 1358.0), (2, 1368.0), (3, 1362.0)])
    def test_solar_constants(self, nf, tsi):
        wl, e = solar_table(nf)
        assert np.trapezoid(e, wl) == pytest.approx(tsi, rel=1e-6)

    def test_fraunhofer_structure_only_in_2_and_3(self):
        """H-alpha dip present in LOWTRAN7/MODTRAN3 tables, absent in 5S."""
        wl_line = np.array([0.6563])
        wl_cont = np.array([0.6520])
        for nf, has_line in ((1, False), (2, True), (3, True)):
            ratio = (solar_irradiance(wl_line, nf)[0]
                     / solar_irradiance(wl_cont, nf)[0])
            if has_line:
                assert ratio < 0.95, (nf, ratio)
            else:
                assert ratio > 0.97, (nf, ratio)

    def test_modtran_lines_deeper_than_lowtran(self):
        wl = np.array([0.6563])
        assert solar_irradiance(wl, 3)[0] < solar_irradiance(wl, 2)[0]

    def test_unknown_db_raises(self):
        with pytest.raises(ValueError, match="nf"):
            solar_irradiance(np.array([0.5]), 7)


class TestFilters:
    def test_avhrr_ch1_band_limits(self):
        cfg = Config(isat=4)
        wl = np.array([0.50, 0.58, 0.63, 0.68, 0.75])
        r = filter_function(cfg, wl)
        assert r[0] < 0.05 and r[4] < 0.05        # out of band
        assert r[2] == pytest.approx(1.0)          # center
        assert 0.3 < r[1] <= 1.0 and 0.3 < r[3] <= 1.0   # 50% edges

    def test_ir_channels_exist(self):
        cfg = Config(isat=7)   # AVHRR ch4: 10.3-11.3 um
        wl = np.array([10.8])
        assert filter_function(cfg, wl)[0] == pytest.approx(1.0)

    def test_catalog_and_unknown_raises(self):
        assert 1 in filter_list() and len(filter_list()) >= 10
        with pytest.raises(ValueError, match="isat"):
            filter_function(Config(isat=99), np.array([0.5]))
