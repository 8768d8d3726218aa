"""Per-layer homogeneous solutions of the discrete-ordinates RTE.

Replaces disort.f:SOLEIG + ASYMTX.  For azimuth mode m the homogeneous
solutions I = G(+-mu_i) exp(-+ k tau) are found from the reduced (N x N,
N = nstr/2) eigenproblem (Stamnes & Swanson 1981):

    k^2 X = (alpha + beta)(alpha - beta) X
    alpha - beta = M^-1 (I - C_odd  W)        (even-parity scattering sum)
    alpha + beta = M^-1 (I - C_even W)

with M = diag(mu), W = diag(w) and C the hemispherically folded scattering
matrices.  The reference solves this with ASYMTX, a general balanced-QR
eigensolver (EISPACK lineage) — a sequential, pivoting algorithm that maps
terribly to TPUs.  Here we exploit that the congruence P = diag(sqrt(mu w))
makes both factors symmetric:

    S_minus = P (alpha - beta) P^-1   (SPD for w0 < 1)
    S_plus  = P (alpha + beta) P^-1

so with the Cholesky factor S_minus = L L^T the matrix L^T S_plus L is
symmetric with the same eigenvalues k^2, and a *batched symmetric* eigensolve
(ops.eigh_small — Jacobi sweeps on TPU) does the work of ASYMTX with
guaranteed-real results and full batching over (batch, mode, layer).

All arrays carry leading batch dims [..., nmode, L]; matrices are [..., N, N].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sbdart_tpu.ops import cholesky_small, eigh_small, gauss_solve, lane
from sbdart_tpu.solver.legendre import legendre_assoc_norm
from sbdart_tpu.solver.quadrature import double_gauss


class AngularTables(NamedTuple):
    """Static (trace-time) angular discretization tables."""
    mu: np.ndarray        # [N] quadrature cosines (> 0)
    w: np.ndarray         # [N] quadrature weights
    ylm: np.ndarray       # [nmode, nstr, N]  Lam_l^m(mu_i), 0 for l < m
    parity: np.ndarray    # [nmode, nstr]     (-1)^(l-m)
    twol1: np.ndarray     # [nstr]            (2l+1)


def angular_tables(nstr: int, nmode: int) -> AngularTables:
    mu, w = double_gauss(nstr)
    ylm = legendre_assoc_norm(mu, nstr, nmode)
    l = np.arange(nstr)
    m = np.arange(nmode)[:, None]
    parity = np.where(l[None, :] >= m, (-1.0) ** (l[None, :] - m), 0.0)
    return AngularTables(mu, w, ylm, parity, 2.0 * l + 1.0)


class EigResult(NamedTuple):
    kk: jnp.ndarray   # [..., nmode, L, N]    eigenvalues k_j > 0
    gp: jnp.ndarray   # [..., nmode, L, N, N] G at +mu_i (row i) for mode j (col)
    gm: jnp.ndarray   # [..., nmode, L, N, N] G at -mu_i
    cpp: jnp.ndarray  # [..., nmode, L, N, N] same-hemisphere scatter matrix C^pp
    cpm: jnp.ndarray  # [..., nmode, L, N, N] cross-hemisphere C^pm


def scattering_matrices(ssalb, gl, tab: AngularTables, dtype):
    """C^pp, C^pm: hemispherically folded scattering matrices per mode.

    ssalb: [..., L]; gl: [..., L, nstr] delta-M scaled moments.
    Returns arrays [..., nmode, L, N, N].
    """
    ylm = jnp.asarray(tab.ylm, dtype)          # [M, nstr, N]
    parity = jnp.asarray(tab.parity, dtype)    # [M, nstr]
    twol1 = jnp.asarray(tab.twol1, dtype)      # [nstr]
    # coefficient c_l = (w0/2) (2l+1) g_l  -> [..., 1, L, nstr]
    c = 0.5 * ssalb[..., None] * twol1 * gl
    c = c[..., None, :, :]                     # add mode axis
    # C^pp_ij = sum_l c_l Y_l(mu_i) Y_l(mu_j)
    cpp = jnp.einsum("...mLl,mli,mlj->...mLij", c, ylm, ylm)
    cpm = jnp.einsum("...mLl,ml,mli,mlj->...mLij", c, parity, ylm, ylm)
    return cpp, cpm


def solve_eigen(
    ssalb: jnp.ndarray,
    gl: jnp.ndarray,
    tab: AngularTables,
    dtype,
    eig_method: str = "auto",
) -> EigResult:
    """Solve the per-layer homogeneous problem for all azimuth modes.

    Args:
      ssalb: [..., L] delta-M scaled single-scatter albedo (dithered < 1).
      gl: [..., L, nstr] delta-M scaled phase moments.
      tab: angular tables for (nstr, nmode).
    """
    n = tab.mu.shape[0]
    mu = jnp.asarray(tab.mu, dtype)
    w = jnp.asarray(tab.w, dtype)
    cpp, cpm = scattering_matrices(ssalb, gl, tab, dtype)

    if eig_method == "auto":
        from sbdart_tpu.dtypes import on_tpu as _on_tpu

        on_tpu = _on_tpu()
        # fused Pallas kernel: even reduced dimension (parallel Jacobi
        # schedule), n <= 8 (constants are unrolled as scalar code —
        # n=8 covers every BASELINE config; bigger n falls back to lane)
        # and f32 ONLY (Mosaic kernels trace with x64 disabled; an f64
        # request — the accuracy-island path — dispatches the pure-jnp
        # lane chain, which the TPU f64 emulation compiles)
        if on_tpu and n <= 8 and n % 2 == 0 and jnp.dtype(dtype) == jnp.float32:
            eig_method = "pallas"
        elif on_tpu and n <= 16:
            eig_method = "lane"
        else:
            eig_method = "xla"
    if eig_method in ("pallas", "pallas_interpret"):
        from sbdart_tpu.pallas.eig import eig_chain_lane_fused

        cppl, batch_shape = lane.to_lane(cpp)
        cpml, _ = lane.to_lane(cpm)
        kk_l, gp_l, gm_l = eig_chain_lane_fused(
            cppl, cpml, tab.mu, tab.w,
            interpret=(eig_method == "pallas_interpret"),
        )
        kk = lane.from_lane(kk_l, batch_shape)
        gp = lane.from_lane(gp_l, batch_shape)
        gm = lane.from_lane(gm_l, batch_shape)
        return EigResult(kk, gp, gm, cpp, cpm)
    if eig_method in ("lane", "jacobi"):
        kk, gp, gm = _eigen_chain_lane(cpp, cpm, mu, w, dtype)
        return EigResult(kk, gp, gm, cpp, cpm)

    eye = jnp.eye(n, dtype=dtype)
    inv_mu = (1.0 / mu)[:, None]               # column scaling M^-1
    # alpha - beta = M^-1 (I - (C^pp + C^pm) W)
    amb = inv_mu * (eye - (cpp + cpm) * w)     # [..., m, L, N, N]
    apb = inv_mu * (eye - (cpp - cpm) * w)
    # congruence to symmetric form
    p = jnp.sqrt(mu * w)
    s_minus = p[:, None] * amb / p[None, :]
    s_plus = p[:, None] * apb / p[None, :]
    # symmetrize explicitly against roundoff
    s_minus = 0.5 * (s_minus + jnp.swapaxes(s_minus, -1, -2))
    s_plus = 0.5 * (s_plus + jnp.swapaxes(s_plus, -1, -2))

    # Precision-scaled diagonal jitter: near-conservative layers make
    # S_minus ill-conditioned (cond ~ 1/(1-w0)); a few-eps ridge keeps the
    # f32 Cholesky full-rank while perturbing k^2 well below solve accuracy.
    eps = jnp.finfo(dtype).eps
    trace = jnp.trace(s_minus, axis1=-2, axis2=-1)[..., None, None]
    s_minus = s_minus + (8.0 * eps / n) * trace * jnp.eye(n, dtype=dtype)
    l = cholesky_small(s_minus, method="xla")        # S_minus = L L^T
    lt_sp_l = jnp.swapaxes(l, -1, -2) @ s_plus @ l   # symmetric, eigvals k^2
    lt_sp_l = 0.5 * (lt_sp_l + jnp.swapaxes(lt_sp_l, -1, -2))
    k2, v = eigh_small(lt_sp_l, method="xla")
    kk = jnp.sqrt(jnp.maximum(k2, 1e-30))            # [..., m, L, N]

    # X = P^-1 L^-T V ;  Y = -(1/k) (alpha - beta) X
    lt = jnp.swapaxes(l, -1, -2)
    z = gauss_solve(lt, v, method="xla")             # L^-T V
    x = z / p[:, None]
    y = -(amb @ x) / kk[..., None, :]
    gp = 0.5 * (x + y)                               # value at +mu_i, e^{-k tau}
    gm = 0.5 * (x - y)                               # value at -mu_i
    return EigResult(kk, gp, gm, cpp, cpm)


def scattering_matrices_lane_mode0(ssalb, gl, tab: AngularTables, dtype):
    """cppl/cpml [N, N, B] + c_lane [nstr, B] DIRECTLY in lane layout.

    For the flux path (azimuth mode 0 only) the folded scattering matrices
    are a contraction over the moment index l:
        C^pp_ij = sum_l c_l Y_l(mu_i) Y_l(mu_j)
    which in lane layout is ONE [N^2, nstr] @ [nstr, B] matmul on the MXU —
    replacing the batch-major einsum + the [N, N, B] relayout that together
    cost ~55 ms at the (nstr=16, 65-layer, 6144-column) bench shape.  Only
    the [nstr, B] coefficient array is relayouted (16x smaller).
    """
    n = tab.mu.shape[0]
    nstr = tab.ylm.shape[1]
    twol1 = jnp.asarray(tab.twol1, dtype)
    c = 0.5 * ssalb[..., None] * twol1 * gl        # [..., L, nstr]
    c_lane, batch_shape = lane.to_lane(c, 1)       # [nstr, B]
    ylm0 = np.asarray(tab.ylm[0], np.float64)      # [nstr, N]
    par0 = np.asarray(tab.parity[0], np.float64)   # [nstr]
    a_pp = (ylm0[:, :, None] * ylm0[:, None, :]).reshape(nstr, n * n)
    a_pm = a_pp * par0[:, None]
    cppl = jnp.einsum(
        "lk,lB->kB", jnp.asarray(a_pp, dtype), c_lane
    ).reshape(n, n, c_lane.shape[-1])
    cpml = jnp.einsum(
        "lk,lB->kB", jnp.asarray(a_pm, dtype), c_lane
    ).reshape(n, n, c_lane.shape[-1])
    return cppl, cpml, c_lane, batch_shape


def solve_eigen_beam_fused(
    ssalb: jnp.ndarray,      # [..., L] delta-M scaled
    gl: jnp.ndarray,         # [..., L, nstr]
    fbeam: jnp.ndarray,      # [...]
    umu0: jnp.ndarray,       # [...]
    tab: AngularTables,
    dtype,
    *,
    need_cppcpm: bool = False,
    interpret: bool = False,
):
    """Fused flux-path front end: scattering (MXU, lane) -> one Pallas
    kernel for the eig chain + UPBEAM-equivalent beam solve.

    Returns (EigResult, BeamSource); EigResult.cpp/.cpm are materialized
    (extra relayout) only when need_cppcpm (the thermal path wants them).
    Requires nmode == 1 (tab built for flux mode) and even N <= 8.
    """
    from sbdart_tpu.pallas.eig import eig_beam_chain_lane_fused
    from sbdart_tpu.solver.sources import BeamSource, _ylm_at

    n = tab.mu.shape[0]
    nmode = tab.ylm.shape[0]
    assert nmode == 1, "fused path is flux-mode (nmode=1) only"
    nlyr = gl.shape[-2]
    cppl, cpml, c_lane, batch_shape = scattering_matrices_lane_mode0(
        ssalb, gl, tab, dtype
    )

    # ---- beam RHS in lane space ------------------------------------------
    has_beam = fbeam > 0.0
    mu0 = jnp.where(has_beam, jnp.abs(umu0), 0.5)
    bshape = mu0.shape
    mu0_l = jnp.broadcast_to(
        mu0[..., None], bshape + (nlyr,)
    ).reshape(1, -1).astype(dtype)                        # [1, B]
    scale = (
        jnp.where(has_beam, fbeam, 0.0) / (2.0 * jnp.pi)  # mfac(m=0) = 1
    )
    scale_l = jnp.broadcast_to(
        scale[..., None], bshape + (nlyr,)
    ).reshape(-1).astype(dtype)                           # [B]

    ylm0 = _ylm_at(mu0, 1, tab.ylm.shape[1], dtype)       # [..., 1, nstr]
    par0 = jnp.asarray(tab.parity[0], dtype)
    y0d = (ylm0[..., 0, :] * par0)                        # Lam_l(-mu0) [..., nstr]
    y0d_l = jnp.broadcast_to(
        y0d[..., None, :], bshape + (nlyr, tab.ylm.shape[1])
    )
    y0d_lane = lane.to_lane(y0d_l, 1)[0]                  # [nstr, B]
    prod = c_lane * y0d_lane
    ylm_mat = jnp.asarray(tab.ylm[0].T, dtype)            # [N, nstr]
    x0p = (ylm_mat @ prod) * scale_l[None, :]             # [N, B]
    x0m = ((ylm_mat * par0[None, :]) @ prod) * scale_l[None, :]
    inv_mu_col = jnp.asarray(1.0 / tab.mu, dtype)[:, None]
    r1 = (x0p + x0m) * inv_mu_col
    r2 = (x0p - x0m) * inv_mu_col

    kk_l, gp_l, gm_l, zp_l, zm_l = eig_beam_chain_lane_fused(
        cppl, cpml, r1, r2, mu0_l, tab.mu, tab.w, interpret=interpret
    )
    # unflatten with the (size-1) mode axis the solver convention carries
    batch_shape = ssalb.shape[:-1] + (1, nlyr)
    kk = lane.from_lane(kk_l, batch_shape)
    gp = lane.from_lane(gp_l, batch_shape)
    gm = lane.from_lane(gm_l, batch_shape)
    zp = lane.from_lane(zp_l, batch_shape)
    zm = lane.from_lane(zm_l, batch_shape)
    cpp = cpm = None
    if need_cppcpm:
        cpp = lane.from_lane(cppl, batch_shape)
        cpm = lane.from_lane(cpml, batch_shape)
    return (
        EigResult(kk, gp, gm, cpp, cpm),
        BeamSource(zp, zm),
    )


def _eigen_chain_lane(cpp, cpm, mu, w, dtype):
    """The SOLEIG chain in lane layout (matrix dims leading, batch minor).

    One relayout in, three out; everything between is full-lane-occupancy
    vector code (see ops/lane.py for why this matters on TPU tiles).
    """
    n = mu.shape[0]
    cppl, batch_shape = lane.to_lane(cpp)      # [N, N, B]
    cpml, _ = lane.to_lane(cpm)

    eye = jnp.eye(n, dtype=dtype)[..., None]   # [N, N, 1]
    inv_mu_i = (1.0 / mu)[:, None, None]
    w_j = w[None, :, None]
    amb = inv_mu_i * (eye - (cppl + cpml) * w_j)
    apb = inv_mu_i * (eye - (cppl - cpml) * w_j)

    p = jnp.sqrt(mu * w)
    p_i = p[:, None, None]
    p_j = p[None, :, None]
    s_minus = p_i * amb / p_j
    s_plus = p_i * apb / p_j
    s_minus = 0.5 * (s_minus + lane.ltranspose(s_minus))
    s_plus = 0.5 * (s_plus + lane.ltranspose(s_plus))

    eps = jnp.finfo(dtype).eps
    trace = jnp.sum(s_minus * eye, axis=(0, 1))          # [B]
    s_minus = s_minus + (8.0 * eps / n) * trace * eye
    l = lane.lcholesky(s_minus)
    lt = lane.ltranspose(l)
    lt_sp_l = lane.lmatmul(lane.lmatmul(lt, s_plus), l)
    lt_sp_l = 0.5 * (lt_sp_l + lane.ltranspose(lt_sp_l))
    k2, v = lane.leigh(lt_sp_l)                          # [N, B], [N, N, B]
    kk = jnp.sqrt(jnp.maximum(k2, 1e-30))

    z = lane.lsolve_upper_tri(lt, v)
    x = z / p[:, None, None]
    y = -lane.lmatmul(amb, x) / kk[None, :, :]
    gp = 0.5 * (x + y)
    gm = 0.5 * (x - y)
    return (
        lane.from_lane(kk, batch_shape),
        lane.from_lane(gp, batch_shape),
        lane.from_lane(gm, batch_shape),
    )
