"""Output fields: fluxes, mean intensity, flux divergence.

Replaces disort.f:FLUXES.  Radiances (USRINT/CMPINT + the Nakajima–Tanaka
TMS correction of INTCOR/SECSCA) live in radiance.py.

Flux conventions follow DISORT 2.0's documented outputs:
  rfldir — direct-beam flux WITHOUT delta-M scaling (the true attenuated sun),
  rfldn  — diffuse down-flux = total down minus rfldir (so the delta-M
           forward-scattered peak is counted as diffuse),
  flup   — diffuse up-flux,
  uavg   — mean intensity (includes the direct beam, delta-M scaled),
  dfdt   — d(net flux)/d(unscaled tau) = 4 pi (1 - w0)(uavg - planck).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sbdart_tpu.solver.bvp import BoundaryIntensities
from sbdart_tpu.solver.eig import AngularTables


class FluxFields(NamedTuple):
    rfldir: jnp.ndarray   # [..., L+1]
    rfldn: jnp.ndarray    # [..., L+1]
    flup: jnp.ndarray     # [..., L+1]
    dfdt: jnp.ndarray     # [..., L+1]
    uavg: jnp.ndarray     # [..., L+1]


def fluxes(
    bounds: BoundaryIntensities,
    tab: AngularTables,
    fbeam: jnp.ndarray,
    umu0: jnp.ndarray,
    expbea_scaled: jnp.ndarray,    # [..., L+1] exp(-tau*_v/mu0)
    expbea_true: jnp.ndarray,      # [..., L+1] exp(-tau_v/mu0), unscaled
    ssalb_unscaled: jnp.ndarray,   # [..., L]
    b_level: jnp.ndarray | None,   # [..., L+1] Planck radiance (None: no thermal)
    dtype,
) -> FluxFields:
    w = jnp.asarray(tab.w, dtype)
    mu = jnp.asarray(tab.mu, dtype)
    wmu = w * mu

    iu = bounds.up[..., 0, :, :]    # azimuth mode 0: [..., L+1, N]
    idn = bounds.dn[..., 0, :, :]

    fup = 2.0 * jnp.pi * jnp.einsum("j,...vj->...v", wmu, iu)
    fdn_diff = 2.0 * jnp.pi * jnp.einsum("j,...vj->...v", wmu, idn)

    beam = jnp.where(fbeam > 0.0, fbeam, 0.0)[..., None]
    mu0 = jnp.abs(umu0)[..., None]
    fdir_scaled = mu0 * beam * expbea_scaled
    rfldir = mu0 * beam * expbea_true
    rfldn = fdn_diff + fdir_scaled - rfldir

    uavg = (
        0.5 * jnp.einsum("j,...vj->...v", w, iu + idn)
        + beam * expbea_scaled / (4.0 * jnp.pi)
    )

    # flux divergence: use the layer below each boundary (last level: layer L-1)
    ssl = jnp.concatenate([ssalb_unscaled, ssalb_unscaled[..., -1:]], axis=-1)
    src = uavg if b_level is None else uavg - b_level
    dfdt = 4.0 * jnp.pi * (1.0 - ssl) * src
    return FluxFields(rfldir, rfldn, fup, dfdt, uavg)
