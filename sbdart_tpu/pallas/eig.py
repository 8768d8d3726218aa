"""Fused lane-eigensolve chain as a Pallas TPU kernel.

Replaces the XLA op-by-op chain of solver/eig.py:_eigen_chain_lane (the
SOLEIG/ASYMTX equivalent — SURVEY.md section 3.2 step 3) on TPU.  The XLA
path is correct but each of the ~70 Jacobi rotation rounds (plus the
Cholesky / matmul / triangular-solve steps around them) round-trips the
[N, N, B] operands through HBM: measured 300 ms for (nstr=16, 65 layers,
6144 columns) — 84% of the whole flux solve.  Here ONE kernel program holds
a batch tile of matrices in VMEM and runs the entire chain on-chip:

    HBM traffic = read cpp/cpm once + write kk/gp/gm once
    (~0.45 GB at the shape above -> sub-ms at HBM speed; the kernel is
    then VPU-compute-bound on the rotation arithmetic).

Math is IDENTICAL to ops/lane.py (same rotation schedule, same sort
network, same Cholesky ridge is applied by the caller): the kernel must
match the lane fallback to f32 roundoff, which tests/test_pallas_kernels.py
pins in interpret mode and the TPU-gated tests pin compiled.

Constant gathers (the static Jacobi permutations) are expressed as unrolled
static slices + stack so Mosaic never sees a general gather.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sbdart_tpu.ops.lane import _round_robin_pairs


def _static_gather_rows(a, idx):
    """a[idx] for a static permutation idx — unrolled slices (no gather)."""
    return jnp.stack([a[int(i)] for i in idx], axis=0)


def _static_gather_cols(a, idx):
    """a[:, idx] for static idx."""
    return jnp.stack([a[:, int(i)] for i in idx], axis=1)


# Mosaic kernels may not capture constant ARRAYS (pallas requires they be
# passed as inputs); every static [n]-vector (mu, w, sqrt(mu w), signs, the
# identity) is therefore folded in as PYTHON floats through unrolled
# per-row/per-column stacks — n is tiny and static, so this is just code.

def _scale_rows(x, facs):
    """diag(facs) @ x with facs python floats; x [n, ..., TB]."""
    return jnp.stack([float(f) * x[i] for i, f in enumerate(facs)], axis=0)


def _scale_cols(x, facs):
    """x @ diag(facs); x [n, n, TB]."""
    return jnp.stack([float(f) * x[:, j] for j, f in enumerate(facs)], axis=1)


def _identity_like(a):
    """eye(n)[..., None] built without a captured constant; a [n, n, TB]."""
    n = a.shape[0]
    one = jnp.ones_like(a[0, 0])
    zero = jnp.zeros_like(a[0, 0])
    return jnp.stack(
        [jnp.stack([one if i == j else zero for j in range(n)], axis=0)
         for i in range(n)], axis=0,
    )


def _jacobi_rounds(n: int):
    """Static per-round (pairs, partner, sign) tables."""
    rounds = _round_robin_pairs(n)
    tables = []
    for pairs in rounds:
        partner = np.empty(n, np.int32)
        sgn = np.empty(n, np.float64)
        pair_of = np.empty(n, np.int32)
        for k, (p, q) in enumerate(pairs):
            partner[p], partner[q] = q, p
            sgn[p], sgn[q] = -1.0, 1.0
            pair_of[p] = pair_of[q] = k
        tables.append((pairs, partner, sgn, pair_of))
    return tables


def _eigh2_inline(a):
    """Closed-form symmetric 2x2 eigendecomposition (ops/lane.py:_eigh2).

    Same convention as the lane version (theta = atan2(2q, p-d)/2) but via
    half-angle algebra — Mosaic has no atan2 lowering.  cos(theta) >= 0 for
    theta in (-pi/2, pi/2] matches atan2's range; the sign of sin(theta)
    follows sin(2 theta) = 2q/r.
    """
    p, q, d = a[0, 0], a[0, 1], a[1, 1]
    diff = p - d
    r = jnp.sqrt(diff * diff + 4.0 * q * q)
    safe = r > 0.0
    rs = jnp.where(safe, r, 1.0)
    cos2 = jnp.where(safe, diff / rs, 1.0)
    sin2 = jnp.where(safe, 2.0 * q / rs, 0.0)
    c = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2), 0.0))
    s = jnp.where(sin2 >= 0.0, 1.0, -1.0) * jnp.sqrt(
        jnp.maximum(0.5 * (1.0 - cos2), 0.0)
    )
    wa = c * c * p + 2.0 * c * s * q + s * s * d
    wb = s * s * p - 2.0 * c * s * q + c * c * d
    lo = wa <= wb
    w1 = jnp.where(lo, wa, wb)
    w2 = jnp.where(lo, wb, wa)
    v11 = jnp.where(lo, c, -s)
    v21 = jnp.where(lo, s, c)
    v12 = jnp.where(lo, -s, c)
    v22 = jnp.where(lo, c, s)
    w = jnp.stack([w1, w2], axis=0)
    v = jnp.stack(
        [jnp.stack([v11, v12], axis=0), jnp.stack([v21, v22], axis=0)],
        axis=0,
    )
    return w, v


def _leigh_inline(a, sweeps: int):
    """Parallel-ordered cyclic Jacobi on [n, n, TB]; returns (w, v).

    Same math as ops/lane.py:_leigh_parallel, with the static permutations
    unrolled for Mosaic.  n must be even (n = nstr/2 with nstr a multiple
    of 4 covers every production config; odd n falls back to XLA upstream).
    """
    n = a.shape[0]
    dtype = a.dtype
    eps = jnp.finfo(dtype).eps
    v0 = _identity_like(a)
    tables = _jacobi_rounds(n)

    def one_sweep(_, av):
        a, v = av
        for pairs, partner, sgn, pair_of in tables:
            # FULL-SUBLANE pair math (round 5): rotation parameters are
            # computed per ROW at [n, TB] instead of per pair at [n/2, TB]
            # (half the sublanes idle) followed by two gathers back to row
            # space.  For row i with partner j, the row form
            #     tau_row[i] = -sgn[i] (d[j] - d[i]) / (2 a[i, j])
            # equals the PAIR's tau on BOTH rows (sgn[p] = -1, sgn[q] = +1
            # flip the difference's sign consistently; a[i, j] = a[j, i] by
            # symmetry), so cos comes out row-replicated and sin row-signed
            # exactly as the old gather produced them — same rotations,
            # no [n/2, TB] intermediates, no c/s gathers.
            d = jnp.stack([a[i, i] for i in range(n)], axis=0)       # [n, TB]
            off = jnp.stack(
                [a[i, int(partner[i])] for i in range(n)], axis=0
            )
            d_prm = _static_gather_rows(d, partner)
            small = jnp.abs(off) <= eps * jnp.maximum(
                jnp.abs(d) + jnp.abs(d_prm), eps
            )
            tau = _scale_rows(d_prm - d, -sgn) / (
                2.0 * jnp.where(small, 1.0, off)
            )
            tsgn = jnp.where(tau >= 0.0, 1.0, -1.0)
            t = tsgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(small, 0.0, t)
            crow = 1.0 / jnp.sqrt(1.0 + t * t)
            srow = _scale_rows(t * crow, sgn)
            # whole-matrix rotation passes: measured FASTER than unrolled
            # per-row fused multiply-adds (55 vs 65 ms at n=8, B=400k) —
            # Mosaic schedules the big uniform ops better than 8 small ones
            a_prm = _static_gather_rows(a, partner)            # rows permuted
            a = crow[:, None, :] * a + srow[:, None, :] * a_prm
            a_cprm = _static_gather_cols(a, partner)
            a = crow[None, :, :] * a + srow[None, :, :] * a_cprm
            v_cprm = _static_gather_cols(v, partner)
            v = crow[None, :, :] * v + srow[None, :, :] * v_cprm
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps, one_sweep, (a, v0))
    w = jnp.stack([a[i, i] for i in range(n)], axis=0)

    # NO eigenvalue sort (round 4): every consumer of the solver's
    # homogeneous solutions — BVP block assembly, boundary sums, radiance
    # source projections — sums over the eigenmode index j, so the
    # (kk_j, G_j) pairing is all that matters and the O(n^2) compare-swap
    # network that rebuilt w AND the v columns per stage was pure idle
    # work (~1 Jacobi sweep's worth).  ops/lane.py:leigh keeps its sort:
    # it is a general utility whose callers may expect eigh conventions.
    return w, v


def _chol_inline(a):
    """Lower Cholesky of SPD [n, n, TB] (ops/lane.py:lcholesky, verbatim)."""
    n = a.shape[0]
    rows = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j, j]
        for k in range(j):
            s = s - rows[j][k] * rows[j][k]
        d = jnp.sqrt(s)
        rows[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s2 = a[i, j]
            for k in range(j):
                s2 = s2 - rows[i][k] * rows[j][k]
            rows[i][j] = s2 * inv_d
        for k in range(j + 1, n):
            rows[j][k] = jnp.zeros_like(d)
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)


def _solve_ut_inline(u, b):
    """U x = b, U upper-tri [n, n, TB], b [n, m, TB]."""
    n = u.shape[0]
    x = [None] * n
    for i in reversed(range(n)):
        s = b[i]
        for k in range(i + 1, n):
            s = s - u[i, k][None, :] * x[k]
        x[i] = s / u[i, i][None, :]
    return jnp.stack(x, axis=0)


def _mm(a, b):
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _eig_chain_inline(cppl, cpml, mu, w, sweeps):
    """The full SOLEIG chain on lane-layout values (jnp, kernel-safe).

    mu/w arrive as numpy arrays and are folded in as python-float scalars
    (see the note above _scale_rows).
    """
    eye = _identity_like(cppl)
    inv_mu = [1.0 / float(m) for m in mu]
    wf = [float(x) for x in w]
    amb = _scale_rows(eye - _scale_cols(cppl + cpml, wf), inv_mu)
    apb = _scale_rows(eye - _scale_cols(cppl - cpml, wf), inv_mu)
    return _eig_chain_core(amb, apb, eye, mu, w, sweeps)


def _eig_chain_core(amb, apb, eye, mu, w, sweeps):
    """SOLEIG chain given the assembled (alpha -+ beta) operators."""
    n = amb.shape[0]
    p = np.sqrt(np.asarray(mu) * np.asarray(w))
    s_minus = _scale_cols(_scale_rows(amb, p), 1.0 / p)
    s_plus = _scale_cols(_scale_rows(apb, p), 1.0 / p)
    s_minus = 0.5 * (s_minus + jnp.swapaxes(s_minus, 0, 1))
    s_plus = 0.5 * (s_plus + jnp.swapaxes(s_plus, 0, 1))

    eps = jnp.finfo(amb.dtype).eps
    trace = jnp.sum(s_minus * eye, axis=(0, 1))
    s_minus = s_minus + (8.0 * eps / n) * trace * eye
    l = _chol_inline(s_minus)
    lt = jnp.swapaxes(l, 0, 1)
    lt_sp_l = _mm(_mm(lt, s_plus), l)
    lt_sp_l = 0.5 * (lt_sp_l + jnp.swapaxes(lt_sp_l, 0, 1))
    if n == 2:
        k2, v = _eigh2_inline(lt_sp_l)      # nstr=4: closed form
    else:
        k2, v = _leigh_inline(lt_sp_l, sweeps)
    kk = jnp.sqrt(jnp.maximum(k2, 1e-30))

    z = _solve_ut_inline(lt, v)
    x = _scale_rows(z, 1.0 / p)
    y = -_mm(amb, x) / kk[None, :, :]
    gp = 0.5 * (x + y)
    gm = 0.5 * (x - y)
    return kk, gp, gm


def _kernel(mu, w, sweeps, cpp_ref, cpm_ref, kk_ref, gp_ref, gm_ref):
    kk, gp, gm = _eig_chain_inline(
        cpp_ref[...], cpm_ref[...], mu, w, sweeps
    )
    kk_ref[...] = kk
    gp_ref[...] = gp
    gm_ref[...] = gm


def _kernel_beam(mu, w, sweeps, cpp_ref, cpm_ref, r1_ref, r2_ref, mu0_ref,
                 kk_ref, gp_ref, gm_ref, zp_ref, zm_ref):
    """Eig chain + the UPBEAM-equivalent reduced beam solve, fused.

    The beam particular solution reuses amb/apb (already in VMEM from the
    eig chain), so fusing it here removes an entire XLA stage that
    recomputed them from cpp/cpm through HBM (solver/sources.py
    beam_particular — 50 ms of the nstr=16 flux solve).  Same algebra:

        [(a+b)(a-b) - I/mu0^2] S = (a+b) r1 - r2/mu0
        D = (r1 - (a-b) S) mu0 ;  Z+- = (S +- D)/2
    """
    from sbdart_tpu.pallas.blocktri import _solve_step

    cppl = cpp_ref[...]
    cpml = cpm_ref[...]
    n = cppl.shape[0]
    eye = _identity_like(cppl)
    inv_mu = [1.0 / float(m) for m in mu]
    wf = [float(x) for x in w]
    amb = _scale_rows(eye - _scale_cols(cppl + cpml, wf), inv_mu)
    apb = _scale_rows(eye - _scale_cols(cppl - cpml, wf), inv_mu)

    kk, gp, gm = _eig_chain_core(amb, apb, eye, mu, w, sweeps)
    kk_ref[...] = kk
    gp_ref[...] = gp
    gm_ref[...] = gm

    r1 = r1_ref[...]                      # [N, TB]
    r2 = r2_ref[...]
    mu0 = mu0_ref[...][0]                 # [TB]
    inv_mu0 = 1.0 / mu0
    mat = _mm(apb, amb) - eye * (inv_mu0 * inv_mu0)[None, None, :]
    rhs = jnp.sum(apb * r1[None, :, :], axis=1) - r2 * inv_mu0[None, :]
    s = _solve_step(mat, rhs[:, None, :])[:, 0]
    d = (r1 - jnp.sum(amb * s[None, :, :], axis=1)) * mu0[None, :]
    zp_ref[...] = 0.5 * (s + d)
    zm_ref[...] = 0.5 * (s - d)


def _tile_for_vmem(floats_per_lane: int, tile_b: int) -> int:
    budget = 10 * 1024 * 1024
    tb = budget // (4 * floats_per_lane)
    tb = (tb // 128) * 128
    if tb == 0:
        return 0
    cap = -(-tile_b // 128) * 128      # lane-aligned cap (pad b up to tile)
    return min(cap, tb)


@functools.partial(
    jax.jit, static_argnames=("mu_t", "w_t", "sweeps", "tile_b", "interpret")
)
def _eig_lane_call(cppl, cpml, *, mu_t, w_t, sweeps, tile_b, interpret):
    n = cppl.shape[0]
    b = cppl.shape[-1]
    dtype = cppl.dtype
    mu = np.asarray(mu_t, np.float64)
    w = np.asarray(w_t, np.float64)

    # working set: ~14 n^2-matrices (inputs, amb/apb, s_minus/s_plus, l,
    # lt_sp_l, a, v, gp/gm, temporaries) + vectors
    floats = 14 * n * n + 6 * n
    tb = _tile_for_vmem(floats, min(tile_b, max(128, b)))
    if tb == 0:
        raise ValueError(f"eig kernel working set too large (n={n})")
    pad = (-b) % tb
    if pad:
        # identity-ish pad: cpp = cpm = 0 -> amb/apb = M^-1, SPD, harmless
        cppl = jnp.pad(cppl, [(0, 0), (0, 0), (0, pad)])
        cpml = jnp.pad(cpml, [(0, 0), (0, 0), (0, pad)])
    b_pad = b + pad
    grid = (b_pad // tb,)

    mat_spec = pl.BlockSpec(
        (n, n, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((n, tb), lambda i: (0, i), memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        kk, gp, gm = pl.pallas_call(
            functools.partial(_kernel, mu, w, sweeps),
            grid=grid,
            in_specs=[mat_spec, mat_spec],
            out_specs=[vec_spec, mat_spec, mat_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n, b_pad), dtype),
                jax.ShapeDtypeStruct((n, n, b_pad), dtype),
                jax.ShapeDtypeStruct((n, n, b_pad), dtype),
            ],
            interpret=interpret,
        )(cppl, cpml)
    if pad:
        kk, gp, gm = kk[..., :b], gp[..., :b], gm[..., :b]
    return kk, gp, gm


# Default Jacobi sweep count: measured on physics matrices at n=8 (incl.
# near-conservative ssalb up to 1 - 1e-6).  Round 4 trimmed 6 -> 4;
# round 5 re-measured the eigen-relation residuals per sweep:
#     sweeps=2: 8.8e-7 / 1.45e-2   (under-converged)
#     sweeps=3: 1.0e-6 / 8.73e-3   <- converged
#     sweeps=4: 1.0e-6 / 8.73e-3   (identical digits)
#     sweeps=5: 1.0e-6 / 8.73e-3   (identical digits)
# (second number is the near-conservative-conditioning-dominated
# (a+b)Y residual, the same at every sweep >= 3) — so sweep 4 was
# provably idle work by exactly the round-4 argument, and the full
# battery (fused-vs-lane 5e-4, f32-vs-f64 bounds incl. conservative
# limit, adding-doubling suite, radlane equivalence, SLOW set included)
# holds at its existing bars at 3.  Kernel time at the radiance shape
# drops 8.2 -> 6.7 ms.
DEFAULT_SWEEPS = 3


def eig_chain_lane_fused(
    cppl: jnp.ndarray,     # [N, N, B] same-hemisphere scatter matrix (lane)
    cpml: jnp.ndarray,     # [N, N, B] cross-hemisphere
    mu: np.ndarray,        # [N] quadrature cosines (static)
    w: np.ndarray,         # [N] weights (static)
    *,
    sweeps: int = DEFAULT_SWEEPS,
    tile_b: int | None = None,
    interpret: bool = False,
):
    """(kk [N, B], gp [N, N, B], gm [N, N, B]) — fused SOLEIG chain.

    Default tile: measured optima — n >= 4 runs ~1.3x faster at 256-lane
    tiles (rotation working set register-resident), the tiny n = 2 chain
    prefers big tiles (amortized grid overhead).
    """
    if tile_b is None:
        tile_b = 2048 if cppl.shape[0] <= 2 else 256
    return _eig_lane_call(
        cppl, cpml,
        mu_t=tuple(float(x) for x in np.asarray(mu)),
        w_t=tuple(float(x) for x in np.asarray(w)),
        sweeps=sweeps, tile_b=tile_b, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("mu_t", "w_t", "sweeps", "tile_b", "interpret")
)
def _eig_beam_call(cppl, cpml, r1, r2, mu0, *, mu_t, w_t, sweeps, tile_b,
                   interpret):
    n = cppl.shape[0]
    b = cppl.shape[-1]
    dtype = cppl.dtype
    mu = np.asarray(mu_t, np.float64)
    w = np.asarray(w_t, np.float64)

    floats = 16 * n * n + 10 * n
    tb = _tile_for_vmem(floats, min(tile_b, max(128, b)))
    if tb == 0:
        raise ValueError(f"eig+beam kernel working set too large (n={n})")
    pad = (-b) % tb
    if pad:
        cppl = jnp.pad(cppl, [(0, 0), (0, 0), (0, pad)])
        cpml = jnp.pad(cpml, [(0, 0), (0, 0), (0, pad)])
        r1 = jnp.pad(r1, [(0, 0), (0, pad)])
        r2 = jnp.pad(r2, [(0, 0), (0, pad)])
        mu0 = jnp.pad(mu0, [(0, 0), (0, pad)], constant_values=0.5)
    b_pad = b + pad
    grid = (b_pad // tb,)

    mat_spec = pl.BlockSpec(
        (n, n, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((n, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
    mu0_spec = pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        kk, gp, gm, zp, zm = pl.pallas_call(
            functools.partial(_kernel_beam, mu, w, sweeps),
            grid=grid,
            in_specs=[mat_spec, mat_spec, vec_spec, vec_spec, mu0_spec],
            out_specs=[vec_spec, mat_spec, mat_spec, vec_spec, vec_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n, b_pad), dtype),
                jax.ShapeDtypeStruct((n, n, b_pad), dtype),
                jax.ShapeDtypeStruct((n, n, b_pad), dtype),
                jax.ShapeDtypeStruct((n, b_pad), dtype),
                jax.ShapeDtypeStruct((n, b_pad), dtype),
            ],
            interpret=interpret,
        )(cppl, cpml, r1, r2, mu0)
    if pad:
        kk, gp, gm = kk[..., :b], gp[..., :b], gm[..., :b]
        zp, zm = zp[..., :b], zm[..., :b]
    return kk, gp, gm, zp, zm


def eig_beam_chain_lane_fused(
    cppl, cpml,            # [N, N, B]
    r1, r2,                # [N, B] reduced beam RHS (see solver/sources.py)
    mu0,                   # [1, B] beam cosine (dithered where no beam)
    mu, w,                 # [N] static quadrature
    *,
    sweeps: int = DEFAULT_SWEEPS,
    tile_b: int | None = None,   # see eig_chain_lane_fused
    interpret: bool = False,
):
    """(kk, gp, gm, zp [N, B], zm [N, B]) — eig chain + beam solve fused."""
    if cppl.shape[0] == 2:
        # n = 2: the PLANAR kernel (full sublane occupancy) via the
        # layered entry viewed as a single layer — see _n2_planar_kernel
        kk, gp, gm, zp, zm = _eig_beam_call_layered_n2(
            cppl[None], cpml[None], r1[None], r2[None], mu0,
            mu_t=tuple(float(x) for x in np.asarray(mu)),
            w_t=tuple(float(x) for x in np.asarray(w)),
            interpret=interpret,
        )
        return kk[0], gp[0], gm[0], zp[0], zm[0]
    if tile_b is None:
        tile_b = 2048 if cppl.shape[0] <= 2 else 256
    return _eig_beam_call(
        cppl, cpml, r1, r2, mu0,
        mu_t=tuple(float(x) for x in np.asarray(mu)),
        w_t=tuple(float(x) for x in np.asarray(w)),
        sweeps=sweeps, tile_b=tile_b, interpret=interpret,
    )


# --------------------------------------------------------------------------
# Layered variant: same fused eig+beam chain, but operands/results carry the
# layer axis LEADING ([L, ..., B] — the exact layout the block-Thomas BVP
# kernel consumes) with a 2-D (layer, lane-tile) grid.  Round 5: the flux
# lane pipeline previously ran the kernel on a flat [*, L*B] lane axis and
# paid a leading-axis transpose of every [N, N] eigen tensor between the
# eig and BVP kernels (measured 27% of the nstr=4 primary path's device
# time was glue); emitting the BVP layout directly removes that copy.
# --------------------------------------------------------------------------


def _beam_kernel_squeeze(mu, w, sweeps, cpp_ref, cpm_ref, r1_ref, r2_ref,
                         mu0_ref, kk_ref, gp_ref, gm_ref, zp_ref, zm_ref):
    _kernel_beam(
        mu, w, sweeps,
        cpp_ref.at[0], cpm_ref.at[0], r1_ref.at[0], r2_ref.at[0], mu0_ref,
        kk_ref.at[0], gp_ref.at[0], gm_ref.at[0], zp_ref.at[0], zm_ref.at[0],
    )


@functools.partial(
    jax.jit, static_argnames=("mu_t", "w_t", "sweeps", "tile_b", "interpret")
)
def _eig_beam_call_layered(cppl, cpml, r1, r2, mu0, *, mu_t, w_t, sweeps,
                           tile_b, interpret):
    nlyr, n, _, b = cppl.shape
    dtype = cppl.dtype
    mu = np.asarray(mu_t, np.float64)
    w = np.asarray(w_t, np.float64)

    floats = 16 * n * n + 10 * n
    tb = _tile_for_vmem(floats, min(tile_b, max(128, b)))
    if tb == 0:
        raise ValueError(f"eig+beam kernel working set too large (n={n})")
    pad = (-b) % tb
    if pad:
        p3 = [(0, 0), (0, 0), (0, pad)]
        p4 = [(0, 0), (0, 0), (0, 0), (0, pad)]
        cppl = jnp.pad(cppl, p4)
        cpml = jnp.pad(cpml, p4)
        r1 = jnp.pad(r1, p3)
        r2 = jnp.pad(r2, p3)
        mu0 = jnp.pad(mu0, [(0, 0), (0, pad)], constant_values=0.5)
    b_pad = b + pad
    grid = (nlyr, b_pad // tb)

    mat_spec = pl.BlockSpec(
        (1, n, n, tb), lambda l, i: (l, 0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, n, tb), lambda l, i: (l, 0, i), memory_space=pltpu.VMEM
    )
    # mu0 is layer-independent: one [1, B] row shared by every layer block
    mu0_spec = pl.BlockSpec(
        (1, tb), lambda l, i: (0, i), memory_space=pltpu.VMEM
    )

    with jax.enable_x64(False):
        kk, gp, gm, zp, zm = pl.pallas_call(
            functools.partial(_beam_kernel_squeeze, mu, w, sweeps),
            grid=grid,
            in_specs=[mat_spec, mat_spec, vec_spec, vec_spec, mu0_spec],
            out_specs=[vec_spec, mat_spec, mat_spec, vec_spec, vec_spec],
            out_shape=[
                jax.ShapeDtypeStruct((nlyr, n, b_pad), dtype),
                jax.ShapeDtypeStruct((nlyr, n, n, b_pad), dtype),
                jax.ShapeDtypeStruct((nlyr, n, n, b_pad), dtype),
                jax.ShapeDtypeStruct((nlyr, n, b_pad), dtype),
                jax.ShapeDtypeStruct((nlyr, n, b_pad), dtype),
            ],
            interpret=interpret,
        )(cppl, cpml, r1, r2, mu0)
    if pad:
        kk, zp, zm = kk[..., :b], zp[..., :b], zm[..., :b]
        gp, gm = gp[..., :b], gm[..., :b]
    return kk, gp, gm, zp, zm


def eig_beam_chain_lane_fused_layered(
    cppl, cpml,            # [L, N, N, B] scattering matrices, layer leading
    r1, r2,                # [L, N, B] reduced beam RHS
    mu0,                   # [1, B] beam cosine (layer-independent)
    mu, w,                 # [N] static quadrature
    *,
    sweeps: int = DEFAULT_SWEEPS,
    tile_b: int | None = None,
    interpret: bool = False,
):
    """(kk [L,N,B], gp [L,N,N,B], gm, zp [L,N,B], zm) — the fused eig+beam
    chain emitting the block-Thomas scan layout directly (no transpose
    between the two kernels).  n = 2 dispatches the PLANAR kernel (full
    sublane occupancy — see _n2_planar_kernel)."""
    if cppl.shape[1] == 2:
        return _eig_beam_call_layered_n2(
            cppl, cpml, r1, r2, mu0,
            mu_t=tuple(float(x) for x in np.asarray(mu)),
            w_t=tuple(float(x) for x in np.asarray(w)),
            interpret=interpret,
        )
    if tile_b is None:
        tile_b = 2048 if cppl.shape[1] <= 2 else 256
    return _eig_beam_call_layered(
        cppl, cpml, r1, r2, mu0,
        mu_t=tuple(float(x) for x in np.asarray(mu)),
        w_t=tuple(float(x) for x in np.asarray(w)),
        sweeps=sweeps, tile_b=tile_b, interpret=interpret,
    )


# --------------------------------------------------------------------------
# PLANAR n=2 kernel (round 5).  At n = 2 every op in the generic kernel is
# shaped [2, 2, TB] or [2, TB]: the second-to-last dim maps to SUBLANES, so
# 2 of 8 sublanes do work — a 4x occupancy waste unique to the nstr=4
# primary path (n = 8 fills the sublanes exactly).  The whole n=2 chain is
# closed-form scalar algebra, so this kernel carries each matrix ENTRY as
# its own [8, B/8] plane — a free row-major reshape of the lane axis done
# OUTSIDE the kernel — and every vector op runs on full (8, 128) tiles.
# Math is identical to _eig_chain_core(n=2) + _kernel_beam's reduced solve;
# the 2x2 beam solve is branchless partial-pivoted GE (same pivot choice
# as _solve_step at m=2).
# --------------------------------------------------------------------------


def _n2_chain_planar(mu, w, cpp, cpm, r1a, r1b, r2a, r2b, mu0p):
    """The full n=2 chain on scalar planes.

    cpp/cpm: lists of 4 entry planes (11, 12, 21, 22); r*: beam RHS
    planes; mu0p: beam-cosine plane.  Returns (kk [2 planes],
    g [8 planes: gp11..gp22, gm11..gm22], z [4: zp1, zp2, zm1, zm2]).
    """
    mu1, mu2 = float(mu[0]), float(mu[1])
    w1, w2 = float(w[0]), float(w[1])
    p1, p2 = float(np.sqrt(mu1 * w1)), float(np.sqrt(mu2 * w2))
    dtype = cpp[0].dtype
    eps = float(jnp.finfo(dtype).eps)

    # amb/apb entries (delta_ij - (cpp -+ cpm) w_j) / mu_i
    amb11 = (1.0 - (cpp[0] + cpm[0]) * w1) / mu1
    amb12 = (-(cpp[1] + cpm[1]) * w2) / mu1
    amb21 = (-(cpp[2] + cpm[2]) * w1) / mu2
    amb22 = (1.0 - (cpp[3] + cpm[3]) * w2) / mu2
    apb11 = (1.0 - (cpp[0] - cpm[0]) * w1) / mu1
    apb12 = (-(cpp[1] - cpm[1]) * w2) / mu1
    apb21 = (-(cpp[2] - cpm[2]) * w1) / mu2
    apb22 = (1.0 - (cpp[3] - cpm[3]) * w2) / mu2

    # symmetrized congruence s = sym(P M P^-1), P = diag(p)
    def sym_congr(m11, m12, m21, m22):
        s12 = m12 * (p1 / p2)
        s21 = m21 * (p2 / p1)
        o12 = 0.5 * (s12 + s21)
        return m11, o12, m22                    # symmetric: (11, 12, 22)

    sm11, sm12, sm22 = sym_congr(amb11, amb12, amb21, amb22)
    sp11, sp12, sp22 = sym_congr(apb11, apb12, apb21, apb22)

    # trace ridge (matches _eig_chain_core: (8 eps / n) tr added to diag)
    tr = sm11 + sm22
    ridge = (8.0 * eps / 2.0) * tr
    sm11 = sm11 + ridge
    sm22 = sm22 + ridge

    # Cholesky of s_minus (2x2 lower)
    l11 = jnp.sqrt(sm11)
    l21 = sm12 / l11                             # s21 == s12
    l22 = jnp.sqrt(sm22 - l21 * l21)

    # M = L^T S+ L, symmetrized (2x2: symmetric by construction up to fp)
    a11 = sp11 * l11 + sp12 * l21
    a12 = sp12 * l22
    a21 = sp12 * l11 + sp22 * l21                # s+ symmetric
    a22 = sp22 * l22
    m11 = l11 * a11 + l21 * a21
    m12v = l11 * a12 + l21 * a22
    m21v = l22 * a21
    m22 = l22 * a22
    q12 = 0.5 * (m12v + m21v)

    # closed-form symmetric 2x2 eigendecomposition (matches _eigh2_inline)
    diff = m11 - m22
    rr = jnp.sqrt(diff * diff + 4.0 * q12 * q12)
    safe = rr > 0.0
    rs = jnp.where(safe, rr, 1.0)
    cos2 = jnp.where(safe, diff / rs, 1.0)
    sin2 = jnp.where(safe, 2.0 * q12 / rs, 0.0)
    cth = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos2), 0.0))
    sth = jnp.where(sin2 >= 0.0, 1.0, -1.0) * jnp.sqrt(
        jnp.maximum(0.5 * (1.0 - cos2), 0.0)
    )
    wa = cth * cth * m11 + 2.0 * cth * sth * q12 + sth * sth * m22
    wb = sth * sth * m11 - 2.0 * cth * sth * q12 + cth * cth * m22
    lo = wa <= wb
    k2_1 = jnp.where(lo, wa, wb)
    k2_2 = jnp.where(lo, wb, wa)
    v11 = jnp.where(lo, cth, -sth)
    v21 = jnp.where(lo, sth, cth)
    v12 = jnp.where(lo, -sth, cth)
    v22 = jnp.where(lo, cth, sth)
    kk1 = jnp.sqrt(jnp.maximum(k2_1, 1e-30))
    kk2 = jnp.sqrt(jnp.maximum(k2_2, 1e-30))

    # z = (L^T)^-1 v  (upper-tri solve), x = P^-1 z
    z21 = v21 / l22
    z22 = v22 / l22
    z11 = (v11 - l21 * z21) / l11
    z12 = (v12 - l21 * z22) / l11
    x11 = z11 / p1
    x12 = z12 / p1
    x21 = z21 / p2
    x22 = z22 / p2

    # y = -(amb @ x) / kk_j ; gp/gm = (x +- y)/2
    y11 = -(amb11 * x11 + amb12 * x21) / kk1
    y12 = -(amb11 * x12 + amb12 * x22) / kk2
    y21 = -(amb21 * x11 + amb22 * x21) / kk1
    y22 = -(amb21 * x12 + amb22 * x22) / kk2
    gp11 = 0.5 * (x11 + y11)
    gp12 = 0.5 * (x12 + y12)
    gp21 = 0.5 * (x21 + y21)
    gp22 = 0.5 * (x22 + y22)
    gm11 = 0.5 * (x11 - y11)
    gm12 = 0.5 * (x12 - y12)
    gm21 = 0.5 * (x21 - y21)
    gm22 = 0.5 * (x22 - y22)

    # ---- beam particular: [(a+b)(a-b) - I/mu0^2] S = (a+b) r1 - r2/mu0 ----
    inv0 = 1.0 / mu0p
    inv0sq = inv0 * inv0
    b11 = apb11 * amb11 + apb12 * amb21 - inv0sq
    b12 = apb11 * amb12 + apb12 * amb22
    b21 = apb21 * amb11 + apb22 * amb21
    b22 = apb21 * amb12 + apb22 * amb22 - inv0sq
    rb1 = apb11 * r1a + apb12 * r1b - r2a * inv0
    rb2 = apb21 * r1a + apb22 * r1b - r2b * inv0
    # branchless partial-pivoted 2x2 GE (same pivot rule as _solve_step)
    swap = jnp.abs(b21) > jnp.abs(b11)
    t11 = jnp.where(swap, b21, b11)
    t12 = jnp.where(swap, b22, b12)
    tr1 = jnp.where(swap, rb2, rb1)
    t21 = jnp.where(swap, b11, b21)
    t22 = jnp.where(swap, b12, b22)
    tr2 = jnp.where(swap, rb1, rb2)
    f = t21 / t11
    d22 = t22 - f * t12
    s2 = (tr2 - f * tr1) / d22
    s1 = (tr1 - t12 * s2) / t11
    d1 = (r1a - (amb11 * s1 + amb12 * s2)) * mu0p
    d2 = (r1b - (amb21 * s1 + amb22 * s2)) * mu0p
    zp1 = 0.5 * (s1 + d1)
    zp2 = 0.5 * (s2 + d2)
    zm1 = 0.5 * (s1 - d1)
    zm2 = 0.5 * (s2 - d2)

    return (
        [kk1, kk2],
        [gp11, gp12, gp21, gp22, gm11, gm12, gm21, gm22],
        [zp1, zp2, zm1, zm2],
    )


def _n2_planar_kernel(mu, w, cpp_ref, cpm_ref, r_ref, mu0_ref,
                      kk_ref, g_ref, z_ref):
    """Planes: cpp/cpm [4, S, L'] (entries 11,12,21,22), r [4, S, L']
    (r1_1, r1_2, r2_1, r2_2), mu0 [S, L']; outputs kk [2,..], g [8,..]
    (gp11..gp22, gm11..gm22), z [4,..] (zp1, zp2, zm1, zm2)."""
    cpp = [cpp_ref[0][i] for i in range(4)]
    cpm = [cpm_ref[0][i] for i in range(4)]
    r = r_ref[0]
    kk, g, z = _n2_chain_planar(
        mu, w, cpp, cpm, r[0], r[1], r[2], r[3], mu0_ref[0, 0]
    )
    kk_ref[0] = jnp.stack(kk, axis=0)
    g_ref[0] = jnp.stack(g, axis=0)
    z_ref[0] = jnp.stack(z, axis=0)


def _n2_scatter_kernel(mu, w, ylm0, par0, ssalb_ref, gl_ref, scale_ref,
                       mu0_ref, kk_ref, g_ref, z_ref):
    """Planar n=2 kernel with the SCATTERING-MATRIX build and beam-RHS
    assembly fused in (round 5, part 3): inputs are the delta-M-scaled
    single-scatter albedo and the 4 phase moments, not prebuilt cpp/cpm —
    the XLA einsums, the Legendre-at-mu0 evaluation and the RHS
    broadcasts all happen on planes in VMEM.

    ssalb [1, S, L'], gl [4, S, L'] (moments l = 0..3), scale [S, L']
    (fbeam-masked /2pi), mu0 [S, L'].  ylm0 [4, 2] = Lam_l(mu_i) and
    par0 [4] = (-1)^l are static (mode 0).
    """
    ss = ssalb_ref[0, 0]
    gl = [gl_ref[0][k] for k in range(4)]
    mu0p = mu0_ref[0, 0]
    scale = scale_ref[0, 0]

    c = [0.5 * float(2 * l + 1) * ss * gl[l] for l in range(4)]
    cpp = []
    cpm = []
    for i in range(2):
        for j in range(2):
            cpp.append(sum(
                float(ylm0[l, i] * ylm0[l, j]) * c[l] for l in range(4)
            ))
            cpm.append(sum(
                float(par0[l] * ylm0[l, i] * ylm0[l, j]) * c[l]
                for l in range(4)
            ))

    # Lam_l(mu0) for m = 0 are the ordinary Legendre polynomials
    # (matches sources._ylm_at's recurrence at m = 0)
    y0 = [
        jnp.ones_like(mu0p),
        mu0p,
        0.5 * (3.0 * mu0p * mu0p - 1.0),
        0.5 * mu0p * (5.0 * mu0p * mu0p - 3.0),
    ]
    prod = [c[l] * (float(par0[l]) * y0[l]) for l in range(4)]
    x0p = [
        sum(float(ylm0[l, i]) * prod[l] for l in range(4)) * scale
        for i in range(2)
    ]
    x0m = [
        sum(float(par0[l] * ylm0[l, i]) * prod[l] for l in range(4)) * scale
        for i in range(2)
    ]
    r1a = (x0p[0] + x0m[0]) / float(mu[0])
    r1b = (x0p[1] + x0m[1]) / float(mu[1])
    r2a = (x0p[0] - x0m[0]) / float(mu[0])
    r2b = (x0p[1] - x0m[1]) / float(mu[1])

    kk, g, z = _n2_chain_planar(mu, w, cpp, cpm, r1a, r1b, r2a, r2b, mu0p)
    kk_ref[0] = jnp.stack(kk, axis=0)
    g_ref[0] = jnp.stack(g, axis=0)
    z_ref[0] = jnp.stack(z, axis=0)


def _n2_deltam_scatter_kernel(mu, w, ylm0, par0, dither, use_dm,
                              dtau_ref, ssalb_ref, pm_ref, scale_ref,
                              mu0_ref, kk_ref, g_ref, z_ref, dts_ref,
                              ee_ref):
    """Planar n=2 kernel with DELTA-M + scattering build + beam RHS fused
    (round 5, part 4): inputs are the RAW per-layer optical properties
    (dtau, ssalb, 5 phase moments); the kernel applies the Wiscombe
    delta-M rescaling (solver/deltam.py formulas, same dither), builds
    the scattering matrices and beam RHS, runs the closed-form chain, and
    also emits the scaled dtau* and ee = exp(-kk dtau*) planes so the
    caller's only remaining layer math is the tau cumsum."""
    dtau = dtau_ref[0, 0]
    ss_raw = jnp.clip(ssalb_ref[0, 0], 0.0, 1.0 - dither)
    pm = [pm_ref[0][k] for k in range(5)]
    mu0p = mu0_ref[0, 0]
    scale = scale_ref[0, 0]

    if use_dm:
        f = jnp.clip(pm[4], 0.0, 1.0 - 1e-6)
        wf = ss_raw * f
        dts = (1.0 - wf) * dtau
        ss = jnp.clip(ss_raw * (1.0 - f) / (1.0 - wf), 0.0, 1.0 - dither)
        inv1mf = 1.0 / (1.0 - f)
        gl = [(pm[l] - f) * inv1mf for l in range(4)]
    else:
        dts = dtau
        ss = ss_raw
        gl = [pm[l] for l in range(4)]

    c = [0.5 * float(2 * l + 1) * ss * gl[l] for l in range(4)]
    cpp = []
    cpm = []
    for i in range(2):
        for j in range(2):
            cpp.append(sum(
                float(ylm0[l, i] * ylm0[l, j]) * c[l] for l in range(4)
            ))
            cpm.append(sum(
                float(par0[l] * ylm0[l, i] * ylm0[l, j]) * c[l]
                for l in range(4)
            ))
    y0 = [
        jnp.ones_like(mu0p),
        mu0p,
        0.5 * (3.0 * mu0p * mu0p - 1.0),
        0.5 * mu0p * (5.0 * mu0p * mu0p - 3.0),
    ]
    prod = [c[l] * (float(par0[l]) * y0[l]) for l in range(4)]
    x0p = [
        sum(float(ylm0[l, i]) * prod[l] for l in range(4)) * scale
        for i in range(2)
    ]
    x0m = [
        sum(float(par0[l] * ylm0[l, i]) * prod[l] for l in range(4)) * scale
        for i in range(2)
    ]
    r1a = (x0p[0] + x0m[0]) / float(mu[0])
    r1b = (x0p[1] + x0m[1]) / float(mu[1])
    r2a = (x0p[0] - x0m[0]) / float(mu[0])
    r2b = (x0p[1] - x0m[1]) / float(mu[1])

    kk, g, z = _n2_chain_planar(mu, w, cpp, cpm, r1a, r1b, r2a, r2b, mu0p)
    kk_ref[0] = jnp.stack(kk, axis=0)
    g_ref[0] = jnp.stack(g, axis=0)
    z_ref[0] = jnp.stack(z, axis=0)
    dts_ref[0] = dts[None]
    ee_ref[0] = jnp.stack(
        [jnp.exp(-kk[0] * dts), jnp.exp(-kk[1] * dts)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("mu_t", "w_t", "ylm_t", "par_t", "dither", "use_dm",
                     "interpret"),
)
def _eig_beam_deltam_call_n2(dtau, ssalb, pmom, scale, mu0, *, mu_t, w_t,
                             ylm_t, par_t, dither, use_dm, interpret):
    """dtau/ssalb [L, B], pmom [L, 5, B], scale/mu0 [1, B]."""
    nlyr, _, b = pmom.shape
    dtype = pmom.dtype
    mu = np.asarray(mu_t, np.float64)
    w = np.asarray(w_t, np.float64)
    ylm0 = np.asarray(ylm_t, np.float64).reshape(4, 2)
    par0 = np.asarray(par_t, np.float64)

    sub = 8
    pad = (-b) % (sub * 128)
    if pad:
        dtau = jnp.pad(dtau, [(0, 0), (0, pad)], constant_values=0.1)
        ssalb = jnp.pad(ssalb, [(0, 0), (0, pad)], constant_values=0.5)
        pmom = jnp.pad(pmom, [(0, 0), (0, 0), (0, pad)])
        scale = jnp.pad(scale, [(0, 0), (0, pad)])
        mu0 = jnp.pad(mu0, [(0, 0), (0, pad)], constant_values=0.5)
    bp = b + pad
    lp = bp // sub

    dt_p = dtau.reshape(nlyr, 1, sub, lp)
    ss_p = ssalb.reshape(nlyr, 1, sub, lp)
    pm_p = pmom.reshape(nlyr, 5, sub, lp)
    sc_p = scale.reshape(1, 1, sub, lp)
    mu0_p = mu0.reshape(1, 1, sub, lp)

    tb = min(1024, lp)
    tb = max(128, (tb // 128) * 128)
    if lp % tb:
        for cand in range(tb, 127, -128):
            if lp % cand == 0:
                tb = cand
                break
    grid = (nlyr, lp // tb)

    def spec(k):
        return pl.BlockSpec((1, k, sub, tb), lambda l, i: (l, 0, 0, i),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, 1, sub, tb), lambda l, i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        kk_p, g_p, z_p, dts_p, ee_p = pl.pallas_call(
            functools.partial(_n2_deltam_scatter_kernel, mu, w, ylm0, par0,
                              dither, use_dm),
            grid=grid,
            in_specs=[spec(1), spec(1), spec(5), row, row],
            out_specs=[spec(2), spec(8), spec(4), spec(1), spec(2)],
            out_shape=[
                jax.ShapeDtypeStruct((nlyr, 2, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 8, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 4, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 1, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 2, sub, lp), dtype),
            ],
            interpret=interpret,
        )(dt_p, ss_p, pm_p, sc_p, mu0_p)

    kk = kk_p.reshape(nlyr, 2, bp)
    g = g_p.reshape(nlyr, 8, bp)
    z = z_p.reshape(nlyr, 4, bp)
    dts = dts_p.reshape(nlyr, bp)
    ee = ee_p.reshape(nlyr, 2, bp)
    gp = g[:, :4].reshape(nlyr, 2, 2, bp)
    gm = g[:, 4:].reshape(nlyr, 2, 2, bp)
    zp = z[:, :2]
    zm = z[:, 2:]
    if pad:
        kk, zp, zm = kk[..., :b], zp[..., :b], zm[..., :b]
        gp, gm = gp[..., :b], gm[..., :b]
        dts, ee = dts[..., :b], ee[..., :b]
    return kk, gp, gm, zp, zm, dts, ee


def eig_beam_deltam_scatter_n2_layered(
    dtau_scan,             # [L, B] RAW layer optical depth
    ssalb_scan,            # [L, B] RAW single-scatter albedo
    pmom_scan,             # [L, 5, B] RAW phase moments l = 0..4
    scale,                 # [1, B] beam amplitude fbeam/(2 pi), 0 if no beam
    mu0,                   # [1, B] beam cosine (dithered where no beam)
    tab,                   # AngularTables for (nstr=4, 1 mode)
    *,
    use_deltam: bool = True,
    interpret: bool = False,
):
    """Fully fused nstr=4 front end from RAW optics: delta-M + scattering
    matrices + Legendre-at-mu0 + beam RHS + eig chain + beam solve + the
    per-eigenmode transmissions, one planar kernel.  Returns
    (kk, gp, gm, zp, zm, dtau_scaled [L, B], ee [L, 2, B])."""
    from sbdart_tpu.constants import SSALB_DITHER

    dither = max(
        SSALB_DITHER,
        100.0 * float(jnp.finfo(jnp.result_type(ssalb_scan)).eps),
    )
    ylm0 = np.asarray(tab.ylm[0], np.float64)
    par0 = np.asarray(tab.parity[0], np.float64)
    return _eig_beam_deltam_call_n2(
        dtau_scan, ssalb_scan, pmom_scan, scale, mu0,
        mu_t=tuple(float(x) for x in np.asarray(tab.mu)),
        w_t=tuple(float(x) for x in np.asarray(tab.w)),
        ylm_t=tuple(float(x) for x in ylm0.reshape(-1)),
        par_t=tuple(float(x) for x in par0),
        dither=float(dither), use_dm=bool(use_deltam), interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("mu_t", "w_t", "ylm_t", "par_t", "interpret")
)
def _eig_beam_scatter_call_n2(ssalb, gl, scale, mu0, *, mu_t, w_t, ylm_t,
                              par_t, interpret):
    """ssalb [L, B], gl [L, 4, B], scale/mu0 [1, B] -> planar outputs."""
    nlyr, _, b = gl.shape
    dtype = gl.dtype
    mu = np.asarray(mu_t, np.float64)
    w = np.asarray(w_t, np.float64)
    ylm0 = np.asarray(ylm_t, np.float64).reshape(4, 2)
    par0 = np.asarray(par_t, np.float64)

    sub = 8
    pad = (-b) % (sub * 128)
    if pad:
        ssalb = jnp.pad(ssalb, [(0, 0), (0, pad)])
        gl = jnp.pad(gl, [(0, 0), (0, 0), (0, pad)])
        scale = jnp.pad(scale, [(0, 0), (0, pad)])
        mu0 = jnp.pad(mu0, [(0, 0), (0, pad)], constant_values=0.5)
    bp = b + pad
    lp = bp // sub

    ss_p = ssalb.reshape(nlyr, 1, sub, lp)
    gl_p = gl.reshape(nlyr, 4, sub, lp)
    sc_p = scale.reshape(1, 1, sub, lp)
    mu0_p = mu0.reshape(1, 1, sub, lp)

    tb = min(1024, lp)
    tb = max(128, (tb // 128) * 128)
    if lp % tb:
        for cand in range(tb, 127, -128):
            if lp % cand == 0:
                tb = cand
                break
    grid = (nlyr, lp // tb)

    def spec(k):
        return pl.BlockSpec((1, k, sub, tb), lambda l, i: (l, 0, 0, i),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, 1, sub, tb), lambda l, i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        kk_p, g_p, z_p = pl.pallas_call(
            functools.partial(_n2_scatter_kernel, mu, w, ylm0, par0),
            grid=grid,
            in_specs=[spec(1), spec(4), row, row],
            out_specs=[spec(2), spec(8), spec(4)],
            out_shape=[
                jax.ShapeDtypeStruct((nlyr, 2, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 8, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 4, sub, lp), dtype),
            ],
            interpret=interpret,
        )(ss_p, gl_p, sc_p, mu0_p)

    kk = kk_p.reshape(nlyr, 2, bp)
    g = g_p.reshape(nlyr, 8, bp)
    z = z_p.reshape(nlyr, 4, bp)
    gp = g[:, :4].reshape(nlyr, 2, 2, bp)
    gm = g[:, 4:].reshape(nlyr, 2, 2, bp)
    zp = z[:, :2]
    zm = z[:, 2:]
    if pad:
        kk, zp, zm = kk[..., :b], zp[..., :b], zm[..., :b]
        gp, gm = gp[..., :b], gm[..., :b]
    return kk, gp, gm, zp, zm


def eig_beam_scatter_n2_layered(
    ssalb_scan,            # [L, B] delta-M-scaled single-scatter albedo
    gl_scan,               # [L, 4, B] delta-M-scaled phase moments
    scale,                 # [1, B] beam amplitude fbeam/(2 pi), 0 if no beam
    mu0,                   # [1, B] beam cosine (dithered where no beam)
    tab,                   # AngularTables for (nstr=4, 1 mode)
    *,
    interpret: bool = False,
):
    """Fully fused nstr=4 front end: delta-M-scaled optical inputs ->
    (kk, gp, gm, zp, zm) in the block-Thomas scan layout.  Replaces the
    XLA scattering-matrix einsums + Legendre-at-mu0 + beam-RHS assembly
    of fluxlane's generic front end for the primary path."""
    ylm0 = np.asarray(tab.ylm[0], np.float64)       # [4, 2]
    par0 = np.asarray(tab.parity[0], np.float64)    # [4]
    return _eig_beam_scatter_call_n2(
        ssalb_scan, gl_scan, scale, mu0,
        mu_t=tuple(float(x) for x in np.asarray(tab.mu)),
        w_t=tuple(float(x) for x in np.asarray(tab.w)),
        ylm_t=tuple(float(x) for x in ylm0.reshape(-1)),
        par_t=tuple(float(x) for x in par0),
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("mu_t", "w_t", "interpret")
)
def _eig_beam_call_layered_n2(cppl, cpml, r1, r2, mu0, *, mu_t, w_t,
                              interpret):
    nlyr, n, _, b = cppl.shape
    assert n == 2
    dtype = cppl.dtype
    mu = np.asarray(mu_t, np.float64)
    w = np.asarray(w_t, np.float64)

    # lane axis folded into (8 sublanes x lanes): pad b to a multiple of
    # 8 * 128, then a row-major reshape [.., b] -> [.., 8, b/8] is free
    sub = 8
    pad = (-b) % (sub * 128)
    if pad:
        p4 = [(0, 0), (0, 0), (0, 0), (0, pad)]
        cppl = jnp.pad(cppl, p4)
        cpml = jnp.pad(cpml, p4)
        r1 = jnp.pad(r1, [(0, 0), (0, 0), (0, pad)])
        r2 = jnp.pad(r2, [(0, 0), (0, 0), (0, pad)])
        mu0 = jnp.pad(mu0, [(0, 0), (0, pad)], constant_values=0.5)
    bp = b + pad
    lp = bp // sub

    cpp_p = cppl.reshape(nlyr, 4, sub, lp)
    cpm_p = cpml.reshape(nlyr, 4, sub, lp)
    r_p = jnp.concatenate([r1, r2], axis=1).reshape(nlyr, 4, sub, lp)
    mu0_p = mu0.reshape(1, 1, sub, lp)

    tb = min(1024, lp)
    tb = max(128, (tb // 128) * 128)
    padl = (-lp) % tb
    if padl:
        # keep it simple: require the 8*128 pad above to also make lp a
        # tile multiple (it does for tb chosen as a divisor-friendly cap)
        for cand in range(tb, 127, -128):
            if lp % cand == 0:
                tb = cand
                padl = 0
                break
    if padl:
        raise ValueError(f"n2 planar kernel: lane dim {lp} not tileable")
    grid = (nlyr, lp // tb)

    def spec(k):
        return pl.BlockSpec((1, k, sub, tb), lambda l, i: (l, 0, 0, i),
                            memory_space=pltpu.VMEM)

    mu0_spec = pl.BlockSpec((1, 1, sub, tb), lambda l, i: (0, 0, 0, i),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        kk_p, g_p, z_p = pl.pallas_call(
            functools.partial(_n2_planar_kernel, mu, w),
            grid=grid,
            in_specs=[spec(4), spec(4), spec(4), mu0_spec],
            out_specs=[spec(2), spec(8), spec(4)],
            out_shape=[
                jax.ShapeDtypeStruct((nlyr, 2, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 8, sub, lp), dtype),
                jax.ShapeDtypeStruct((nlyr, 4, sub, lp), dtype),
            ],
            interpret=interpret,
        )(cpp_p, cpm_p, r_p, mu0_p)

    kk = kk_p.reshape(nlyr, 2, bp)
    g = g_p.reshape(nlyr, 8, bp)
    z = z_p.reshape(nlyr, 4, bp)
    gp = g[:, :4].reshape(nlyr, 2, 2, bp)
    gm = g[:, 4:].reshape(nlyr, 2, 2, bp)
    zp = z[:, :2]
    zm = z[:, 2:]
    if pad:
        kk, zp, zm = kk[..., :b], zp[..., :b], zm[..., :b]
        gp, gm = gp[..., :b], gm[..., :b]
    return kk, gp, gm, zp, zm
