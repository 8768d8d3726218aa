"""Hard-coded PUBLISHED numeric fixtures (external anchors).

Every other anchor in this suite is computed in-repo (the adding-doubling
solver, the H-function iteration, scipy's expn).  A transcription error in
those conventions could bias both sides of a comparison.  This module pins
a handful of values to their PUBLISHED digits, hard-coded with sources, so
at least these numbers cannot drift with the repo:

  1. Exponential integrals E1 at 0.5 and 1.0 — Abramowitz & Stegun,
     "Handbook of Mathematical Functions", Table 5.1 (E1(1) = 0.2193839 is
     among the most-reproduced constants in transport theory).  E3 follows
     by the EXACT recurrence E_{n+1}(x) = (e^-x - x E_n(x)) / n (A&S
     5.1.14), giving the isothermal-slab emissivity 1 - 2 E3(tau)
     (Schwarzschild; reference path: disort.f:PLKAVG + SOLVE0 thermal).
  2. Diffusion exponents k(w0) of the characteristic equation
     1 = (w0/2k) ln((1+k)/(1-k)) for isotropic scattering — Case & Zweifel
     (1967) / van de Hulst, "Multiple Light Scattering" (1980) Table 1:
     k(0.9) = 0.52543, k(0.5) = 0.95750.  The discrete-ordinates minimum
     eigenvalue (disort.f:SOLEIG/ASYMTX equivalent, solver/eig.py) must
     converge to these as nstr grows.
  3. Chandrasekhar (1960, "Radiative Transfer", Ch. V) EXACT moments of the
     conservative isotropic H-function: alpha0 = int H dmu = 2 (exact),
     alpha1 = int H mu dmu = 2/sqrt(3) = 1.1547005.  This validates the
     H-function iteration that anchors the disort battery — breaking the
     last self-referential loop flagged in round 2.
  4. The closed-form FIRST-ORDER scattering reflection law (Hansen &
     Travis 1974, Space Sci. Rev. 16, eq. 3.46):
     I1 = (w0 F P(Theta) / (4 (mu + mu0))) (1 - exp(-tau (1/mu + 1/mu0)))
     — the omega -> 0 limit of the full radiance path (USRINT + TMS).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.solver.disort import solve_rte
from sbdart_tpu.solver.eig import angular_tables, solve_eigen
from sbdart_tpu.solver.planck import planck_band

# --- published digits (DO NOT derive these from repo code) -----------------
E1_AS = {0.5: 0.5597736, 1.0: 0.2193839}    # A&S Table 5.1 (7 digits)
K_DIFFUSION = {0.9: 0.52543, 0.5: 0.95750}  # van de Hulst 1980 Table 1
ALPHA1_CONSERVATIVE = 1.1547005             # 2/sqrt(3), Chandrasekhar 1960


def _e3_from_published_e1(x: float) -> float:
    """E3 via the exact recurrence E_{n+1} = (e^-x - x E_n)/n (A&S 5.1.14)."""
    e1 = E1_AS[x]
    e2 = np.exp(-x) - x * e1
    return 0.5 * (np.exp(-x) - x * e2)


def test_published_e1_recurrence_vs_scipy():
    """The hard-coded A&S digits agree with scipy to their precision."""
    from scipy.special import expn

    for x, e1 in E1_AS.items():
        assert e1 == pytest.approx(float(expn(1, x)), abs=1e-7)
        assert _e3_from_published_e1(x) == pytest.approx(
            float(expn(3, x)), abs=2e-7
        )


@pytest.mark.parametrize("tau", [0.5, 1.0])
@pytest.mark.slow
def test_isothermal_slab_emissivity_published(tau):
    """flup(TOA) / (pi B) == 1 - 2 E3(tau) with E3 from A&S digits.

    Isothermal purely absorbing slab, negligible surface emission
    (btemp = 1e-6 K), black surface.  nstr=16 double-Gauss quadrature of
    the smooth integrand (1 - e^(-tau/mu)) mu is accurate well below the
    asserted 5e-4.
    """
    nlyr, t_iso = 4, 260.0
    wvnlo, wvnhi = 900.0, 1000.0
    dtau = jnp.full((nlyr,), tau / nlyr, jnp.float64)
    ssalb = jnp.zeros((nlyr,), jnp.float64)
    pmom = jnp.zeros((nlyr, 17), jnp.float64).at[:, 0].set(1.0)
    temper = jnp.full((nlyr + 1,), t_iso, jnp.float64)
    out = solve_rte(
        dtau, ssalb, pmom, nstr=16, fbeam=0.0, albedo=0.0,
        planck=True, temper=temper, wvnlo=wvnlo, wvnhi=wvnhi,
        btemp=1e-6, ttemp=1e-6, temis=0.0, dtype=jnp.float64,
    )
    b = float(planck_band(
        jnp.asarray(wvnlo), jnp.asarray(wvnhi), jnp.asarray(t_iso),
        jnp.float64,
    ))
    emis_published = 1.0 - 2.0 * _e3_from_published_e1(tau)
    got = float(out.flup[0]) / (np.pi * b)
    assert got == pytest.approx(emis_published, rel=5e-4), (got, emis_published)
    # downward emission at the surface mirrors it (no surface source)
    got_dn = float(out.rfldn[-1]) / (np.pi * b)
    assert got_dn == pytest.approx(emis_published, rel=5e-4)


@pytest.mark.parametrize("w0", [0.9, 0.5])
def test_diffusion_exponent_published(w0):
    """Minimum DO eigenvalue -> published diffusion exponent k(w0).

    First confirm the hard-coded root satisfies the published
    characteristic equation 1 = (w0/2k) ln((1+k)/(1-k)) (Case & Zweifel
    1967), then require the nstr=32 discrete eigenvalue to match it.
    """
    k_pub = K_DIFFUSION[w0]
    # the published digits ARE a root of the published equation; tolerance
    # reflects the 5-digit rounding of the published k amplified by the
    # residual sensitivity d(lhs)/dk ~ 5 near k -> 1
    lhs = (w0 / (2 * k_pub)) * np.log((1 + k_pub) / (1 - k_pub))
    assert lhs == pytest.approx(1.0, abs=5e-5)

    nstr = 32
    tab = angular_tables(nstr, 1)
    ssalb = jnp.asarray([[w0]], jnp.float64)                  # [1 batch, 1 lyr]
    gl = jnp.zeros((1, 1, nstr), jnp.float64).at[..., 0].set(1.0)
    eig = solve_eigen(ssalb, gl, tab, jnp.float64, eig_method="xla")
    k_min = float(jnp.min(eig.kk))
    assert k_min == pytest.approx(k_pub, abs=5e-5), (k_min, k_pub)


def test_conservative_h_moments_published():
    """The in-repo H-function iteration reproduces Chandrasekhar's EXACT
    conservative-isotropic moments: alpha0 = 2, alpha1 = 2/sqrt(3).

    This is the external validation of the iteration used to anchor the
    disort battery (test_disort_battery.test_hfunction_semi_infinite).
    Conservative scattering converges slowly; use the alpha0-substituted
    form 1/H = sqrt(1-w0) + (w0/2) int mu' H/(mu+mu') dmu' with
    sqrt(1-w0) -> 0 and enough iterations.
    """
    xg, wg = np.polynomial.legendre.leggauss(96)
    mq = 0.5 * (xg + 1)
    wq = 0.5 * wg
    h = np.ones_like(mq)
    # Busbridge form with sqrt(1-w0) = 0; geometric-mean damping makes the
    # conservative fixed point attracting (measured: alpha0/alpha1 settle to
    # 13 digits within ~20k iterations)
    for _ in range(30000):
        integ = 0.5 * np.array([np.sum(wq * mq * h / (m + mq)) for m in mq])
        h_new = 1.0 / integ
        if np.abs(h_new - h).max() < 1e-13:
            h = h_new
            break
        h = np.sqrt(h * h_new)
    alpha0 = np.sum(wq * h)
    alpha1 = np.sum(wq * mq * h)
    assert alpha0 == pytest.approx(2.0, abs=1e-6)
    assert alpha1 == pytest.approx(ALPHA1_CONSERVATIVE, abs=1e-6)


@pytest.mark.slow
def test_single_scatter_reflection_published():
    """DOM radiance -> Hansen & Travis (1974) first-order closed form as
    w0 -> 0 (isotropic phase function, so P(Theta) = 1 and the delta-M /
    TMS machinery is exercised trivially but harmlessly)."""
    w0, tau, mu0, fbeam = 1e-3, 0.4, 0.6, 1.0
    umu = np.array([0.35, 0.8])
    nlyr = 2
    dtau = jnp.full((nlyr,), tau / nlyr, jnp.float64)
    ssalb = jnp.full((nlyr,), w0, jnp.float64)
    pmom = jnp.zeros((nlyr, 17), jnp.float64).at[:, 0].set(1.0)
    out = solve_rte(
        dtau, ssalb, pmom, nstr=16, fbeam=fbeam, umu0=mu0, albedo=0.0,
        onlyfl=False, umu=jnp.asarray(umu), phi=jnp.asarray([0.0]),
        dtype=jnp.float64,
    )
    for i, mu in enumerate(umu):
        # Hansen & Travis eq. 3.46 in flux-normalized form:
        #   I(mu) = (w0 mu0 F)/(4 pi (mu+mu0)) [1 - exp(-tau(1/mu + 1/mu0))]
        exact = (
            w0 * mu0 * fbeam / (4.0 * np.pi * (mu + mu0))
            * (1.0 - np.exp(-tau * (1.0 / mu + 1.0 / mu0)))
        )
        got = float(out.uu[0, i, 0])   # TOA (level 0), up direction
        assert got == pytest.approx(exact, rel=2e-3), (mu, got, exact)
