"""Delta-M scaling of optical properties.

Replaces the delta-M logic in disort.f:SETDIS (Wiscombe 1977).  The forward
diffraction peak of strongly anisotropic phase functions (clouds) cannot be
represented with nstr Legendre moments; delta-M truncates a fraction
f = g_nstr of the scattering into the unscattered beam and rescales:

    tau* = (1 - w f) tau
    w*   = w (1 - f) / (1 - w f)
    g_l* = (g_l - f) / (1 - f),   l < nstr

Everything is per-(batch, layer) elementwise — trivially batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sbdart_tpu.constants import SSALB_DITHER


class DeltaMResult(NamedTuple):
    dtau: jnp.ndarray    # [..., L]      scaled layer optical depth
    ssalb: jnp.ndarray   # [..., L]      scaled single-scatter albedo (dithered)
    gl: jnp.ndarray      # [..., L, nstr] scaled moments g_l*, l = 0..nstr-1
    f: jnp.ndarray       # [..., L]      truncated fraction
    dtau_unscaled: jnp.ndarray  # [..., L] original optical depth


def apply_deltam(
    dtau: jnp.ndarray,
    ssalb: jnp.ndarray,
    pmom: jnp.ndarray,
    nstr: int,
    deltam: bool = True,
) -> DeltaMResult:
    """Apply delta-M scaling.

    Args:
      dtau: [..., L] layer optical depths.
      ssalb: [..., L] single-scatter albedos in [0, 1].
      pmom: [..., L, nmom] phase moments g_l with pmom[..., 0] == 1.
      nstr: stream count (static).
      deltam: disable to pass through (reference `deltam` namelist flag).
    """
    nmom = pmom.shape[-1]
    # Conservative-scattering dither, scaled to precision: the eigenproblem is
    # singular at w0 == 1 (disort.f:SETDIS dithers the same way).
    dither = max(SSALB_DITHER, 100.0 * float(jnp.finfo(jnp.result_type(ssalb)).eps))
    ssalb = jnp.clip(ssalb, 0.0, 1.0 - dither)
    if not deltam or nmom <= nstr:
        gl = pmom[..., :nstr]
        if gl.shape[-1] < nstr:
            pad = [(0, 0)] * (gl.ndim - 1) + [(0, nstr - gl.shape[-1])]
            gl = jnp.pad(gl, pad)
        f = jnp.zeros_like(dtau)
        return DeltaMResult(dtau, ssalb, gl, f, dtau)

    f = jnp.clip(pmom[..., nstr], 0.0, 1.0 - 1e-6)
    wf = ssalb * f
    dtau_s = (1.0 - wf) * dtau
    ssalb_s = ssalb * (1.0 - f) / (1.0 - wf)
    ssalb_s = jnp.clip(ssalb_s, 0.0, 1.0 - dither)
    gl = (pmom[..., :nstr] - f[..., None]) / (1.0 - f[..., None])
    return DeltaMResult(dtau_s, ssalb_s, gl, f, dtau)
