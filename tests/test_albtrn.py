"""Tests of the slab albedo/transmission mode (ALBTRN / ibcnd=1 equiv)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sbdart_tpu.solver.albtrn import slab_albedo_transmission


def hg_moments(g, nmom):
    return np.array([g**l for l in range(nmom)])


class TestAlbTrn:
    @pytest.mark.slow
    def test_conservative_closure(self):
        """w0=1, black surface: albedo + transmission == 1 per angle."""
        umu = jnp.array([0.2, 0.5, 0.9])
        a, t = slab_albedo_transmission(
            jnp.array([1.0, 2.0]),
            jnp.ones(2),
            jnp.array(np.tile(hg_moments(0.6, 34), (2, 1))),
            nstr=16,
            umu=umu,
            dtype=jnp.float64,
        )
        np.testing.assert_allclose(np.asarray(a + t), 1.0, rtol=3e-6)
        # oblique incidence reflects more
        assert float(a[0]) > float(a[2])

    def test_absorbing_bounds(self):
        umu = jnp.array([0.4, 0.8])
        a, t = slab_albedo_transmission(
            jnp.array([3.0]),
            jnp.array([0.9]),
            jnp.array(np.tile(hg_moments(0.7, 34), (1, 1))),
            nstr=16,
            umu=umu,
            dtype=jnp.float64,
        )
        a, t = np.asarray(a), np.asarray(t)
        assert np.all(a > 0) and np.all(t > 0)
        assert np.all(a + t < 1.0)

    def test_thin_limit(self):
        """tau -> 0: transmission -> 1, albedo -> 0."""
        umu = jnp.array([0.5])
        a, t = slab_albedo_transmission(
            jnp.array([1e-5]),
            jnp.array([0.9]),
            jnp.array(np.tile(hg_moments(0.5, 10), (1, 1))),
            nstr=8,
            umu=umu,
            dtype=jnp.float64,
        )
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-4)
        assert float(a[0]) < 1e-4
