"""Slab albedo / transmissivity mode.

Replaces disort.f:ALBTRN/ALTRIN/SPALTR (the IBCND=1 special mode): the
plane albedo and total transmissivity of the whole inhomogeneous slab as a
function of incident beam angle, with no thermal emission and a black
lower boundary.

The reference computes this with a specialized solve (SOLVE1) exploiting
symmetries; here it is simply the batched beam problem vmapped over the
incidence angles — the batched solver makes the special-purpose code path
unnecessary (and it runs all angles in parallel on the chip).
"""

from __future__ import annotations

import jax.numpy as jnp

from sbdart_tpu.solver.disort import solve_rte


def slab_albedo_transmission(
    dtauc: jnp.ndarray,      # [..., L]
    ssalb: jnp.ndarray,      # [..., L]
    pmom: jnp.ndarray,       # [..., L, nmom]
    *,
    nstr: int,
    umu: jnp.ndarray,        # [U] incidence cosines (> 0)
    albedo: jnp.ndarray | float = 0.0,
    deltam: bool = True,
    dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(albmed, trnmed), each [..., U].

    albmed: plane albedo for a unit beam at incidence cosine umu[j];
    trnmed: total (direct + diffuse) transmissivity.
    """
    umu = jnp.abs(jnp.asarray(umu))
    nu = umu.shape[0]
    dtauc_b = jnp.asarray(dtauc)[..., None, :]        # add angle axis
    ssalb_b = jnp.asarray(ssalb)[..., None, :]
    pmom_b = jnp.asarray(pmom)[..., None, :, :]
    out = solve_rte(
        jnp.broadcast_to(dtauc_b, dtauc_b.shape[:-2] + (nu,) + dtauc_b.shape[-1:]),
        jnp.broadcast_to(ssalb_b, ssalb_b.shape[:-2] + (nu,) + ssalb_b.shape[-1:]),
        jnp.broadcast_to(
            pmom_b, pmom_b.shape[:-3] + (nu,) + pmom_b.shape[-2:]
        ),
        nstr=nstr,
        fbeam=jnp.ones_like(umu),
        umu0=umu,
        albedo=albedo,
        deltam=deltam,
        onlyfl=True,
        dtype=dtype,
    )
    inc = umu  # mu0 * fbeam
    albmed = out.flup[..., 0] / inc
    trnmed = (out.rfldir[..., -1] + out.rfldn[..., -1]) / inc
    return albmed, trnmed
