"""Band-averaged Planck function.

Replaces disort.f:PLKAVG.  Computes the Planck radiance integrated over a
wavenumber band,

    B(T; nu1, nu2) = integral_{nu1}^{nu2} B_nu(T) d nu    [W m^-2 sr^-1]

using the same split the reference uses: a power series of
int_0^x t^3/(e^t - 1) dt for small x = c2*nu/T and an exponential series of
the complementary integral for large x — but evaluated branchlessly
(both series computed, `where`-selected) so it vectorizes over
(level, band) tensors under jit.  Always evaluated in float64; the result is
cast to the solver dtype by the caller.
"""

from __future__ import annotations

import jax.numpy as jnp

from sbdart_tpu.constants import C2_RADIATION, STEFAN_BOLTZMANN

_PI4_15 = 15.0 / jnp.pi**4
# Series int_0^x t^3/(e^t-1) dt = x^3 * sum_k a_k x^k  (Bernoulli expansion)
_POW_COEF = (1.0 / 3.0, -1.0 / 8.0, 1.0 / 60.0, 0.0, -1.0 / 5040.0, 0.0,
             1.0 / 272160.0, 0.0, -1.0 / 13305600.0)
_XCUT = 1.0          # series switch point (both accurate to ~1e-9 there)
_NEXP_TERMS = 16     # exp-series terms; tail at x=1 ~ e^-17, negligible


def _cum_fraction(x: jnp.ndarray, dtype=jnp.float64) -> jnp.ndarray:
    """F(0->x) = (15/pi^4) * int_0^x t^3/(e^t-1) dt, in [0, 1]."""
    x = jnp.asarray(x, dtype)
    xs = jnp.minimum(x, _XCUT)  # keep the power series in its domain
    # power-series branch (x <= XCUT)
    p = jnp.zeros_like(xs)
    for k in reversed(range(len(_POW_COEF))):
        p = p * xs + _POW_COEF[k]
    lo = _PI4_15 * xs**3 * p
    # exponential-series branch (x > XCUT): 1 - (15/pi^4) sum_n e^{-nx}(...)
    xl = jnp.maximum(x, _XCUT)
    s = jnp.zeros_like(xl)
    for n in range(1, _NEXP_TERMS + 1):
        s = s + jnp.exp(-n * xl) * (
            xl**3 / n + 3.0 * xl**2 / n**2 + 6.0 * xl / n**3 + 6.0 / n**4
        )
    hi = 1.0 - _PI4_15 * s
    return jnp.where(x <= _XCUT, lo, hi)


def planck_band(wvnlo, wvnhi, temp, dtype=jnp.float64) -> jnp.ndarray:
    """Planck radiance integrated over [wvnlo, wvnhi] cm^-1 at temp K.

    All args broadcast together.  Returns W m^-2 sr^-1.  `dtype` defaults to
    float64 for accuracy; pass float32 on TPU (no native f64) — the band
    fraction loses ~1e-6 relative there, well inside the f32 solve noise.
    """
    wvnlo = jnp.asarray(wvnlo, dtype)
    wvnhi = jnp.asarray(wvnhi, dtype)
    t = jnp.maximum(jnp.asarray(temp, dtype), 1e-6)
    x1 = C2_RADIATION * wvnlo / t
    x2 = C2_RADIATION * wvnhi / t
    frac = _cum_fraction(x2, dtype) - _cum_fraction(x1, dtype)
    return (STEFAN_BOLTZMANN / jnp.pi) * t**4 * frac


def planck_total(temp) -> jnp.ndarray:
    """sigma T^4 / pi — the full-spectrum Planck radiance."""
    t = jnp.asarray(temp, jnp.float64)
    return (STEFAN_BOLTZMANN / jnp.pi) * t**4
