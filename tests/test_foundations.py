"""Unit tests for quadrature, Legendre tables, Planck integrals, and the
batched small linear algebra (the L1 numerics the solver core builds on)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.solver.quadrature import double_gauss, gauss_half_range
from sbdart_tpu.solver.legendre import legendre_assoc_norm, legendre_poly
from sbdart_tpu.solver.planck import planck_band, planck_total
from sbdart_tpu.constants import STEFAN_BOLTZMANN
from sbdart_tpu.ops import jacobi_eigh, gauss_solve, cholesky_small


class TestQuadrature:
    @pytest.mark.parametrize("n", [1, 2, 4, 8, 16, 24])
    def test_weights_and_moments(self, n):
        mu, w = gauss_half_range(n)
        assert np.all(mu > 0) and np.all(mu < 1)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-14)
        np.testing.assert_allclose((w * mu).sum(), 0.5, rtol=1e-13)
        # Gauss rule of order n integrates polynomials up to degree 2n-1
        for p in range(2 * n):
            np.testing.assert_allclose(
                (w * mu**p).sum(), 1.0 / (p + 1), rtol=1e-12, atol=1e-14
            )

    def test_nstr_validation(self):
        with pytest.raises(ValueError):
            double_gauss(3)
        with pytest.raises(ValueError):
            double_gauss(0)


class TestLegendre:
    def test_m0_matches_legendre(self):
        mu = np.linspace(-1, 1, 21)
        tab = legendre_poly(mu, 6)
        np.testing.assert_allclose(tab[0], np.ones_like(mu), atol=1e-14)
        np.testing.assert_allclose(tab[1], mu, atol=1e-14)
        np.testing.assert_allclose(tab[2], 0.5 * (3 * mu**2 - 1), atol=1e-13)
        np.testing.assert_allclose(
            tab[5],
            (63 * mu**5 - 70 * mu**3 + 15 * mu) / 8.0,
            atol=1e-12,
        )

    def test_orthonormality(self):
        # int_{-1}^{1} Lam_l^m Lam_l'^m dmu = 2/(2l+1) delta_ll'
        x, w = np.polynomial.legendre.leggauss(64)
        nmom, nmode = 10, 6
        tab = legendre_assoc_norm(x, nmom, nmode)
        for m in range(nmode):
            for l in range(m, nmom):
                for lp in range(m, nmom):
                    val = np.sum(w * tab[m, l] * tab[m, lp])
                    expect = 2.0 / (2 * l + 1) if l == lp else 0.0
                    np.testing.assert_allclose(val, expect, atol=1e-12)

    def test_zero_below_mode(self):
        tab = legendre_assoc_norm(np.array([0.3, -0.7]), 8, 8)
        for m in range(8):
            assert np.all(tab[m, :m] == 0.0)

    def test_parity(self):
        # Lam_l^m(-mu) = (-1)^(l-m) Lam_l^m(mu)
        mu = np.array([0.1, 0.5, 0.9])
        tp = legendre_assoc_norm(mu, 8, 4)
        tm = legendre_assoc_norm(-mu, 8, 4)
        for m in range(4):
            for l in range(m, 8):
                np.testing.assert_allclose(
                    tm[m, l], (-1.0) ** (l - m) * tp[m, l], atol=1e-13
                )


class TestPlanck:
    def test_total_integral(self):
        # Broad band covers essentially the whole Planck curve
        t = 288.0
        b = planck_band(1.0e-3, 1.0e7, t)
        np.testing.assert_allclose(
            float(b), STEFAN_BOLTZMANN / np.pi * t**4, rtol=3e-9
        )

    def test_additivity(self):
        t = 255.0
        whole = planck_band(100.0, 3000.0, t)
        parts = planck_band(100.0, 700.0, t) + planck_band(700.0, 3000.0, t)
        np.testing.assert_allclose(float(whole), float(parts), rtol=1e-12)

    def test_narrow_band_matches_planck_function(self):
        # For a very narrow band, integral ~ B_nu * dnu
        from sbdart_tpu.constants import C1_RADIATION, C2_RADIATION
        t, nu = 300.0, 1000.0
        dnu = 0.01
        b = planck_band(nu - dnu / 2, nu + dnu / 2, t)
        bnu = C1_RADIATION * nu**3 / (np.exp(C2_RADIATION * nu / t) - 1.0)
        np.testing.assert_allclose(float(b), bnu * dnu, rtol=1e-6)

    def test_monotone_in_t(self):
        b = planck_band(400.0, 600.0, jnp.array([200.0, 250.0, 300.0]))
        assert float(b[0]) < float(b[1]) < float(b[2])

    def test_series_switch_continuity(self):
        # Scan temperatures so x = c2*nu/T crosses the series switch point
        t = jnp.linspace(100.0, 3000.0, 400)
        b = planck_band(500.0, 520.0, t)
        db = jnp.diff(b)
        assert bool(jnp.all(db > 0))  # smooth & monotone across the switch


class TestBatchedLinalg:
    def test_jacobi_eigh_matches_numpy(self):
        rng = np.random.default_rng(0)
        for n in [2, 3, 4, 8, 12]:
            a = rng.standard_normal((5, n, n))
            a = (a + np.swapaxes(a, -1, -2)) / 2
            w, v = jacobi_eigh(jnp.asarray(a))
            w_np = np.linalg.eigvalsh(a)
            np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-10, atol=1e-10)
            # eigenvector property A v = w v
            av = np.einsum("bij,bjk->bik", a, np.asarray(v))
            wv = np.asarray(v) * np.asarray(w)[:, None, :]
            np.testing.assert_allclose(av, wv, atol=1e-9)

    def test_leigh_convergence_n16(self):
        """lane.leigh default sweep count covers the LARGEST lane-path size
        n=16 (nstr=32), not just the n=8 it was tuned on (round-3 advisor):
        f32 eigenvalue relerr and eigenpair residual stay at the f32 floor."""
        import jax.numpy as jnp

        from sbdart_tpu.ops import lane

        rng = np.random.default_rng(7)
        n, b = 16, 32
        a = rng.standard_normal((n, n, b)).astype(np.float32)
        a = (a + a.transpose(1, 0, 2)) / 2
        w, v = lane.leigh(jnp.asarray(a))          # default sweeps
        w = np.asarray(w)
        v = np.asarray(v)
        w_np = np.linalg.eigvalsh(a.transpose(2, 0, 1))   # [b, n] ascending
        relerr = np.abs(w.T - w_np).max() / np.abs(w_np).max()
        assert relerr < 1e-5, relerr
        av = np.einsum("ijB,jkB->ikB", a, v)
        vw = v * w[None, :, :]
        resid = np.abs(av - vw).max() / np.abs(w).max()
        assert resid < 3e-5, resid

    def test_gauss_solve_matches_numpy(self):
        rng = np.random.default_rng(1)
        for n in [1, 2, 4, 8, 16]:
            a = rng.standard_normal((6, n, n)) + 3 * np.eye(n)
            b = rng.standard_normal((6, n, 3))
            x = gauss_solve(jnp.asarray(a), jnp.asarray(b), method="unrolled")
            x_np = np.linalg.solve(a, b)
            np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-9, atol=1e-9)

    def test_gauss_solve_needs_pivoting(self):
        # Leading zero pivot: fails without partial pivoting
        a = np.array([[[0.0, 1.0], [1.0, 0.0]]])
        b = np.array([[[2.0], [3.0]]])
        x = gauss_solve(jnp.asarray(a), jnp.asarray(b), method="unrolled")
        np.testing.assert_allclose(np.asarray(x), [[[3.0], [2.0]]], atol=1e-12)

    def test_cholesky_matches_numpy(self):
        rng = np.random.default_rng(2)
        for n in [1, 2, 4, 8]:
            m = rng.standard_normal((4, n, n))
            a = np.einsum("bij,bkj->bik", m, m) + n * np.eye(n)
            l = cholesky_small(jnp.asarray(a), method="unrolled")
            np.testing.assert_allclose(np.asarray(l), np.linalg.cholesky(a), rtol=1e-9, atol=1e-9)
