"""True Mie phase-function moments (imomc=4, disort.f:GETMOM-class).

The moment table (data/mie_moments.npz) is gamma-distribution-averaged
angular-integration output; its l=1 moment must agree with the asymmetry
parameter computed INDEPENDENTLY from the Mie coefficient series (the
existing efficiency tables) — two different formulas through different
code paths.
"""

import numpy as np
import pytest

from sbdart_tpu.config import Config
from sbdart_tpu.data.mie import cloud_moments, cloud_properties
from sbdart_tpu.pipeline import run_pipeline


class TestMomentTable:
    def test_g1_matches_series_asymmetry(self):
        wl = np.array([0.55, 0.86, 1.6, 2.2, 3.7])
        for re in (2.0, 8.0, 32.0):
            mom = cloud_moments(re, wl, 65)
            _, _, g = cloud_properties(re, wl)
            assert np.abs(mom[:, 1] / g - 1).max() < 0.05, re
            assert np.allclose(mom[:, 0], 1.0)
            assert np.all(np.abs(mom) <= 1.0001)

    def test_moments_decay(self):
        mom = cloud_moments(8.0, np.array([0.55]), 65)[0]
        # high-order moments must be much smaller than low orders
        assert np.abs(mom[50:]).max() < 0.5 * np.abs(mom[1])

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError, match="re"):
            cloud_moments(100.0, np.array([0.55]), 17)
        with pytest.raises(ValueError, match="wl"):
            cloud_moments(8.0, np.array([10.0]), 17)


class TestImomc4Pipeline:
    def test_imomc4_changes_radiances(self):
        """Real Mie moments vs HG must differ in the radiance field (the
        cloudbow/glory structure HG cannot represent) while keeping fluxes
        close (delta-M handles the truncated forward peak either way)."""
        base = Config(
            idatm=2, wlinf=0.55, wlsup=0.55, nstr=16, sza=40.0,
            zcloud=[2.0, 0, 0, 0, 0], tcloud=[5.0, 0, 0, 0, 0],
            nre=[8.0, 8.0, 8.0, 8.0, 8.0],
            iout=20, nzen=3, uzen=[20.0, 40.0, 70.0] + [-1.0] * 17,
            nphi=2, phi=[0.0, 120.0] + [-1.0] * 18,
        )
        r_hg = run_pipeline(base)
        r_mie = run_pipeline(base.replace(imomc=4))
        f_hg = r_hg.fdn[0, -1] + r_hg.fdir[0, -1]
        f_mie = r_mie.fdn[0, -1] + r_mie.fdir[0, -1]
        assert f_mie == pytest.approx(f_hg, rel=0.05)       # fluxes close
        du = np.abs(r_mie.uu - r_hg.uu).max()
        assert du > 1e-3 * np.abs(r_hg.uu).max()            # radiances differ

    def test_imomc4_out_of_table_raises(self):
        cfg = Config(
            idatm=2, wlinf=0.55, wlsup=0.55, imomc=4,
            zcloud=[2.0, 0, 0, 0, 0], tcloud=[5.0, 0, 0, 0, 0],
            nre=[64.0, 8.0, 8.0, 8.0, 8.0],    # outside the moment table
        )
        with pytest.raises(ValueError, match="re"):
            run_pipeline(cfg)
