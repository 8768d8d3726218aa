"""Non-Lambertian surface (BDREF equivalent) tests."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sbdart_tpu.solver.disort import solve_rte
from sbdart_tpu.solver.brdf import (
    HapkeBrdf,
    RpvBrdf,
    fourier_refl_matrices,
    hemispherical_reflectance,
)


def hg_moments(g, nmom):
    return np.array([g**l for l in range(nmom)])


@dataclasses.dataclass(frozen=True)
class LambertBrdf:
    """rho = alb/pi: must reproduce the Lambertian code path exactly."""
    alb: float = 0.3

    def rho(self, mu_out, mu_in, cos_dphi):
        return (
            jnp.zeros_like(
                jnp.asarray(mu_out) + jnp.asarray(mu_in) + jnp.asarray(cos_dphi)
            )
            + self.alb / jnp.pi
        )


COMMON = dict(
    dtauc=jnp.array([0.4, 1.0]),
    ssalb=jnp.array([0.6, 0.9]),
    pmom=jnp.array(np.tile(hg_moments(0.6, 18), (2, 1))),
    nstr=8,
    fbeam=1.0,
    umu0=0.6,
)


class TestBrdfMachinery:
    def test_lambert_brdf_matches_albedo_fluxes(self):
        a = solve_rte(albedo=0.3, dtype=jnp.float64, **COMMON)
        b = solve_rte(albedo=0.0, brdf=LambertBrdf(0.3), dtype=jnp.float64,
                      **COMMON)
        np.testing.assert_allclose(
            np.asarray(a.flup), np.asarray(b.flup), rtol=1e-10, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(a.rfldn), np.asarray(b.rfldn), rtol=1e-10, atol=1e-13
        )

    @pytest.mark.slow
    def test_lambert_brdf_matches_albedo_radiances(self):
        kw = dict(COMMON, onlyfl=False,
                  umu=np.array([-0.7, -0.3, 0.3, 0.7]),
                  phi=np.array([0.0, 90.0]), corint=False)
        a = solve_rte(albedo=0.3, dtype=jnp.float64, **kw)
        b = solve_rte(albedo=0.0, brdf=LambertBrdf(0.3), dtype=jnp.float64, **kw)
        np.testing.assert_allclose(
            np.asarray(a.uu), np.asarray(b.uu), rtol=1e-8, atol=1e-12
        )

    def test_fourier_matrices_lambertian_structure(self):
        mu = jnp.array([0.2, 0.6, 0.9])
        r = fourier_refl_matrices(LambertBrdf(0.4), mu, mu, 4, jnp.float64)
        np.testing.assert_allclose(np.asarray(r[0]), 0.8, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(r[1:]), 0.0, atol=1e-12)

    def test_hapke_reciprocity(self):
        b = HapkeBrdf()
        mu1, mu2, c = 0.3, 0.8, 0.5
        r12 = float(b.rho(jnp.asarray(mu1), jnp.asarray(mu2), jnp.asarray(c)))
        r21 = float(b.rho(jnp.asarray(mu2), jnp.asarray(mu1), jnp.asarray(c)))
        np.testing.assert_allclose(r12, r21, rtol=1e-12)

    def test_hapke_energy_sane(self):
        b = HapkeBrdf()
        mu = jnp.array([0.2, 0.5, 0.9])
        from sbdart_tpu.solver.quadrature import double_gauss
        mq, wq = double_gauss(16)
        rdh = hemispherical_reflectance(b, mu, wq, mq, jnp.float64)
        rdh = np.asarray(rdh)
        assert np.all(rdh > 0) and np.all(rdh < 1)

    def test_hapke_hotspot_backscatter_radiance(self):
        """Hapke surface: backscatter radiance exceeds forward-scatter."""
        kw = dict(COMMON, onlyfl=False, umu=np.array([0.6]),
                  phi=np.array([0.0, 180.0]), phi0=0.0, corint=False)
        out = solve_rte(albedo=0.0, brdf=HapkeBrdf(), dtype=jnp.float64, **kw)
        uu = np.asarray(out.uu)[-1, 0]   # at the surface
        # backscatter (anti-solar) viewing is phi - phi0 = 180 for upward
        # radiance: outgoing propagation opposes the incident beam there
        assert uu[1] > uu[0]

    def test_rpv_runs_and_reflects(self):
        out = solve_rte(albedo=0.0, brdf=RpvBrdf(), dtype=jnp.float64, **COMMON)
        assert float(out.flup[0]) > 0
        assert np.all(np.isfinite(np.asarray(out.flup)))
