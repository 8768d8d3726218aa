"""NaN guards (aux subsystem 6.2): the solver must be NaN-free under
jax_debug_nans across the degenerate corners that tempt divisions by zero
— conservative scattering, zero-depth layers, zero beam, grazing beam.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sbdart_tpu.solver.disort import solve_rte


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def hg(g, nmom):
    return g ** np.arange(nmom, dtype=np.float64)


class TestNanGuards:
    def test_degenerate_corners(self, debug_nans):
        """Conservative w0=1, a zero-depth layer, and a grazing beam."""
        dtau = jnp.asarray([1e-30, 0.5, 2.0])
        ssalb = jnp.asarray([1.0, 1.0, 0.3])
        pmom = jnp.asarray(np.tile(hg(0.7, 9), (3, 1)))
        out = solve_rte(dtau, ssalb, pmom, nstr=8, fbeam=1.0, umu0=0.02,
                        albedo=1.0, dtype=jnp.float64)
        assert np.isfinite(np.asarray(out.flup)).all()

    def test_no_beam_thermal(self, debug_nans):
        dtau = jnp.asarray([0.5, 1.0])
        ssalb = jnp.asarray([0.0, 0.4])
        pmom = jnp.asarray(np.tile(hg(0.0, 5), (2, 1)))
        out = solve_rte(
            dtau, ssalb, pmom, nstr=4, fbeam=0.0, planck=True,
            temper=jnp.asarray([250.0, 270.0, 290.0]),
            wvnlo=800.0, wvnhi=850.0, btemp=295.0, dtype=jnp.float64,
        )
        assert np.isfinite(np.asarray(out.uavg)).all()

    def test_radiances_resonant_angles(self, debug_nans):
        """User angle equal to the beam cosine (the u == mu0 resonance)."""
        dtau = jnp.asarray([1.0])
        ssalb = jnp.asarray([0.9])
        pmom = jnp.asarray(np.tile(hg(0.6, 17), (1, 1)))
        out = solve_rte(
            dtau, ssalb, pmom, nstr=16, fbeam=1.0, umu0=0.5, albedo=0.2,
            onlyfl=False, umu=(-0.5, 0.5), phi=(0.0,), corint=True,
            dtype=jnp.float64,
        )
        assert np.isfinite(np.asarray(out.uu)).all()
