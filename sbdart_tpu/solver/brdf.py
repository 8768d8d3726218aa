"""Bidirectional surface reflectance (non-Lambertian lower boundary).

Replaces disort.f:SURFAC/BDREF/DREF (the `lamber = .false.` path).  The
DOM needs the azimuth Fourier components of the BRDF on the quadrature
grid,

    R_m(mu_i, mu_j) = int_0^{2pi} rho(mu_i, mu_j, psi) cos(m psi) dpsi

(with this normalization the Lambertian rho = alb/pi gives R_0 = 2 alb,
R_{m>0} = 0, reducing exactly to the Lambertian boundary rows in bvp.py).
The psi integral is a fixed trapezoid quadrature evaluated inside jit, so
BRDFs may depend on traced per-column parameters and on the traced beam
cosine mu0.

Provided models:
  * HapkeBrdf — the Hapke (1981) photometric function, DISORT 2.0's BDREF
    example model;
  * RpvBrdf — Rahman–Pinty–Verstraete, widely used for land surfaces.

Any object with `.rho(mu_out, mu_in, cos_dphi)` (broadcasting, jax ops)
works.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

N_PSI = 64   # azimuth quadrature points for the Fourier projection


@dataclasses.dataclass(frozen=True)
class HapkeBrdf:
    """Hapke (1981) BRDF: h-function multiple scattering + hotspot.

    b0: hotspot amplitude, hh: hotspot angular width, w: single-scatter
    albedo of the surface particles.  (DISORT's BDREF defaults: b0=1,
    hh=0.06, w=0.6.)
    """
    b0: float = 1.0
    hh: float = 0.06
    w: float = 0.6

    def rho(self, mu_out, mu_in, cos_dphi):
        mu = jnp.abs(mu_out)
        mup = jnp.abs(mu_in)
        s = jnp.sqrt(jnp.clip(1 - mu**2, 0, 1))
        sp = jnp.sqrt(jnp.clip(1 - mup**2, 0, 1))
        # cos of the phase (scattering) angle between incident and reflected
        calpha = -(-mu * mup + s * sp * cos_dphi)  # supplement: backscatter=1
        calpha = jnp.clip(calpha, -1.0, 1.0)
        alpha = jnp.arccos(calpha)
        p = 1.0 + 0.5 * calpha                     # particle phase function
        b = self.b0 * self.hh / (self.hh + jnp.tan(alpha / 2.0))
        gamma = jnp.sqrt(1.0 - self.w)
        h = lambda x: (1.0 + 2.0 * x) / (1.0 + 2.0 * x * gamma)
        return (
            self.w / (4.0 * jnp.pi) / (mu + mup)
            * ((1.0 + b) * p + h(mu) * h(mup) - 1.0)
        )


@dataclasses.dataclass(frozen=True)
class RpvBrdf:
    """Rahman–Pinty–Verstraete (1993) BRDF."""
    rho0: float = 0.1
    k: float = 0.75
    theta: float = -0.1   # HG asymmetry of the surface phase function

    def rho(self, mu_out, mu_in, cos_dphi):
        mu = jnp.abs(mu_out)
        mup = jnp.abs(mu_in)
        s = jnp.sqrt(jnp.clip(1 - mu**2, 0, 1))
        sp = jnp.sqrt(jnp.clip(1 - mup**2, 0, 1))
        cg = -mu * mup + s * sp * cos_dphi         # cos(scatter angle)
        g = self.theta
        fhg = (1 - g**2) / jnp.maximum(
            (1 + g**2 + 2 * g * cg) ** 1.5, 1e-9
        )
        tanth = s / jnp.maximum(mu, 1e-6)
        tanthp = sp / jnp.maximum(mup, 1e-6)
        bigg = jnp.sqrt(
            jnp.maximum(tanth**2 + tanthp**2 - 2 * tanth * tanthp * cos_dphi, 0.0)
        )
        hot = 1.0 + (1.0 - self.rho0) / (1.0 + bigg)
        m = (mu * mup * (mu + mup)) ** (self.k - 1.0)
        return self.rho0 * m * fhg * hot / jnp.pi


def fourier_refl_matrices(brdf, mu_out, mu_in, nmode: int, dtype):
    """R_m(mu_out_i, mu_in_j): [nmode, I, J] via psi trapezoid quadrature.

    mu_out/mu_in may be traced jnp arrays (e.g. the beam cosine).
    """
    psi = np.linspace(0.0, 2.0 * np.pi, N_PSI, endpoint=False)
    cpsi = jnp.asarray(np.cos(psi), dtype)
    cosm = jnp.asarray(
        np.cos(np.arange(nmode)[:, None] * psi[None, :]), dtype
    )                                              # [m, P]
    mu_out = jnp.asarray(mu_out, dtype)
    mu_in = jnp.asarray(mu_in, dtype)
    rho = brdf.rho(
        mu_out[..., :, None, None], mu_in[..., None, :, None], cpsi
    )                                              # [..., I, J, P]
    dpsi = 2.0 * np.pi / N_PSI
    return jnp.einsum("...ijp,mp->...mij", rho, cosm) * dpsi


def hemispherical_reflectance(brdf, mu_in, w, mu, dtype):
    """Directional-hemispherical albedo r_dh(mu_in_j) (DREF equivalent):
    1 - r_dh is the directional emissivity of the surface."""
    r0 = fourier_refl_matrices(brdf, jnp.asarray(mu, dtype), mu_in, 1, dtype)
    wmu = jnp.asarray(w * mu, dtype)
    return jnp.einsum("i,...ij->...j", wmu, r0[..., 0, :, :])
