"""Fused block-tridiagonal Thomas solve as a Pallas TPU kernel.

Replaces the lax.scan in solver/bvp.py (the SETMTX/SOLVE0 equivalent — see
SURVEY.md section 3.2 step 5) for the forward-elimination + back-substitution
recursion over layers.  The scan version round-trips the carry through HBM
on every one of the ~2*L sequential steps and pays a kernel-launch per step;
here one kernel program holds ALL layers of a batch tile in VMEM and runs
the whole recursion on-chip:

    HBM traffic = read blocks once + write solution once  (speed of light
    for this op — the recursion itself is VMEM/register resident).

Layout matches ops/lane.py: blocks [L, m, m, B] with the flattened
(batch x mode) axis B minor; the grid tiles B, so every vector op inside
the kernel runs at full lane occupancy.

The per-step m x m solve is partial-pivoted Gaussian elimination with the
(static, tiny) m-loops unrolled — the same branchless masked-select scheme
as ops/lane.lsolve, which matches the pivoting robustness of the
reference's LINPACK SGBFA.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_step(dt, rhs_aug):
    """Solve dt @ X = rhs_aug for [m, m, TB] dt, [m, r, TB] rhs_aug.

    Branchless partial-pivoted GE with IMPLICIT pivoting: rows are never
    physically exchanged — each step argmax-selects a pivot row per lane,
    eliminates it from every remaining row in place, and saves the pivot
    row for the back-substitution.  Same pivoting decisions bit-for-bit
    as LINPACK SGBFA-style explicit swaps, no scatters or dynamic slices
    (Mosaic-clean).

    SHRINKING ELIMINATION (round 5): once column k is eliminated it is
    never read again (the back-substitution works off the SAVED pivot
    rows, and every remaining row has an exact zero there), so each step
    drops its pivot column instead of updating the full width — the
    update pass narrows from m+r to m+r-k columns, cutting total GE
    update work by m(m+1)/2 / (m(m+r)) (39% at the nstr=4 shape, 23% at
    nstr=16 with the rank-N RHS).  The loops are statically unrolled, so
    the shrinking widths are static shapes.
    """
    m = dt.shape[0]
    tb = dt.shape[-1]
    aug = jnp.concatenate([dt, rhs_aug], axis=1)       # [m, m+r, TB]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)   # [m, 1]
    eliminated = jnp.zeros((m, tb), jnp.bool_)
    prows = []
    for k in range(m):
        # the current pivot column is always the leading column: column
        # k-1 was dropped at the end of the previous step
        lead = aug[:, 0, :]                            # [m, TB]
        col = jnp.where(eliminated, -1.0, jnp.abs(lead))
        piv = jax.lax.argmax(col, axis=0, index_dtype=jnp.int32)   # [TB]
        sel_p = (row_ids == piv[None, :])              # [m, TB]
        # pivot value and pivot-row tail extracted SEPARATELY: slicing the
        # masked-sum result afterwards trips Mosaic's gather lowering
        # ("shape mismatch" on the sliced broadcast), slicing the operand
        # first lowers fine
        piv_val = jnp.sum(jnp.where(sel_p, lead, 0.0), axis=0)     # [TB]
        tail = aug[:, 1:, :]                           # [m, w-1, TB]
        row_t = jnp.sum(jnp.where(sel_p[:, None, :], tail, 0.0), axis=0)
        inv_piv = 1.0 / piv_val
        factor = jnp.where(
            eliminated | sel_p, 0.0, lead * inv_piv[None, :]
        )
        aug = tail - factor[:, None, :] * row_t[None, :, :]
        eliminated = eliminated | sel_p
        prows.append((piv_val, row_t))                 # tail: [m+r-k-1, TB]
    # back substitution on the saved pivot rows; prows[i] = (pivot value,
    # [a_{i,i+1..m-1}, rhs_i]) with columns < i dropped before capture,
    # so a_{ij} sits at tail offset j - i - 1 and the rhs at m - i - 1.
    x = [None] * m
    for i in reversed(range(m)):
        pv, rest = prows[i]
        s = rest[m - i - 1:]
        for j in range(i + 1, m):
            s = s - rest[j - i - 1][None, :] * x[j]
        x[i] = s / pv[None, :]
    return jnp.stack(x, axis=0)                        # [m, r, TB]


def _kernel(diag_ref, lower_ref, upper_ref, rhs_ref, xs_ref, ws_ref, ys_ref):
    nlyr, m, _, tb = diag_ref.shape

    def fwd(l, carry):
        w_prev, y_prev = carry
        d_l = diag_ref[pl.ds(l, 1)][0]
        a_l = lower_ref[pl.ds(l, 1)][0]
        u_l = upper_ref[pl.ds(l, 1)][0]
        r_l = rhs_ref[pl.ds(l, 1)][0]
        dt = d_l - jnp.sum(a_l[:, :, None, :] * w_prev[None, :, :, :], axis=1)
        rt = r_l - jnp.sum(a_l * y_prev[None, :, :], axis=1)
        sol = _solve_step(dt, jnp.concatenate([u_l, rt[:, None, :]], axis=1))
        w_l = sol[:, :m]
        y_l = sol[:, m]
        # Mosaic cannot legalize dynamic stores to 4-D scratch refs; keep the
        # w history flattened to 3-D [L, m*m, tb] and reshape at the uses.
        ws_ref[pl.ds(l, 1)] = w_l.reshape(m * m, tb)[None]
        ys_ref[pl.ds(l, 1)] = y_l[None]
        return (w_l, y_l)

    w0 = jnp.zeros((m, m, tb), diag_ref.dtype)
    y0 = jnp.zeros((m, tb), diag_ref.dtype)
    # int32 bounds keep the loop counter i32 under jax_enable_x64 (Mosaic
    # only supports i32 index arithmetic)
    w_last, y_last = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nlyr), fwd, (w0, y0)
    )

    xs_ref[nlyr - 1] = y_last

    def bwd(i, x_next):
        l = jnp.int32(nlyr - 2) - i
        y_l = ys_ref[pl.ds(l, 1)][0]
        w_l = ws_ref[pl.ds(l, 1)][0].reshape(m, m, tb)
        x_l = y_l - jnp.sum(w_l * x_next[None, :, :], axis=1)
        xs_ref[pl.ds(l, 1)] = x_l[None]
        return x_l

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlyr - 1), bwd, y_last)


def _tile_for_vmem(floats_per_lane: int, tile_b: int) -> int:
    """Largest lane-tile (multiple of 128, <= tile_b) whose working set fits
    the ~16 MB VMEM budget (with headroom for Mosaic double buffering).

    Returns 0 when even a 128-lane tile does not fit — callers must then
    stream the layer axis (block_thomas_rt does, via the two-pass chunked
    kernels below) instead of holding the whole column in VMEM.
    """
    budget = 12 * 1024 * 1024
    tb = budget // (4 * floats_per_lane)
    tb = (tb // 128) * 128
    if tb == 0:
        return 0
    # Round the caller's cap UP to a lane multiple: Mosaic rejects lane tiles
    # that are not 128-aligned (e.g. b=130 would otherwise become the tile
    # itself and fail at compile); the callers pad b up to the tile instead.
    cap = -(-tile_b // 128) * 128
    return min(cap, tb)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def block_thomas(
    diag: jnp.ndarray,     # [L, m, m, B]
    lower: jnp.ndarray,    # [L, m, m, B]
    upper: jnp.ndarray,    # [L, m, m, B]
    rhs: jnp.ndarray,      # [L, m, B]
    *,
    tile_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Solve the block-tridiagonal system; returns xs [L, m, B]."""
    nlyr, m, _, b = diag.shape
    dtype = diag.dtype

    # per-lane f32 working set: 3 block mats + rhs + xs + ws/ys scratch,
    # with input double-buffering headroom folded into _tile_for_vmem
    tb = _tile_for_vmem(nlyr * (7 * m * m + 3 * m), min(tile_b, max(128, b)))
    if tb == 0:
        raise ValueError(
            f"block_thomas working set (nlyr={nlyr}, m={m}) exceeds VMEM at "
            "the minimum 128-lane tile; use block_thomas_rt (it streams the "
            "layer axis for large shapes) or the scan fallback"
        )
    pad = (-b) % tb
    if pad:
        # pad with identity blocks / zero rhs -> solution zeros (discarded)
        eye = jnp.broadcast_to(
            jnp.eye(m, dtype=dtype)[None, :, :, None], (nlyr, m, m, pad)
        )
        diag = jnp.concatenate([diag, eye], axis=-1)
        zmat = jnp.zeros((nlyr, m, m, pad), dtype)
        lower = jnp.concatenate([lower, zmat], axis=-1)
        upper = jnp.concatenate([upper, zmat], axis=-1)
        rhs = jnp.concatenate([rhs, jnp.zeros((nlyr, m, pad), dtype)], axis=-1)
    b_pad = b + pad

    grid = (b_pad // tb,)
    mat_spec = pl.BlockSpec(
        (nlyr, m, m, tb), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (nlyr, m, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    # Trace the kernel with x64 disabled: the package enables jax_enable_x64
    # globally (CPU f64 reference paths), but Mosaic fails to legalize the
    # i64 index arithmetic x64 tracing injects into the kernel body.  All
    # operands here are f32 either way.
    with jax.enable_x64(False):
        xs = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[mat_spec, mat_spec, mat_spec, vec_spec],
            out_specs=vec_spec,
            out_shape=jax.ShapeDtypeStruct((nlyr, m, b_pad), dtype),
            scratch_shapes=[
                pltpu.VMEM((nlyr, m * m, tb), dtype),
                pltpu.VMEM((nlyr, m, tb), dtype),
            ],
            interpret=interpret,
        )(diag, lower, upper, rhs)
    return xs[..., :b] if pad else xs


# --------------------------------------------------------------------------
# Fused RT variant: assemble the BVP blocks ON THE FLY from the eigen
# quantities (SETMTX fused into SOLVE0)
# --------------------------------------------------------------------------
#
# The assembled blocks are [L, 2N, 2N, B] x3 — by far the largest tensors in
# the flux hot path (for nstr=4 they are 48 floats/layer/column vs 10 for
# gp/gm/ee).  Building them inside the kernel from gp/gm/ee (+ the [N, N, B]
# surface operator) removes ~5x of HBM traffic through the BVP stage and
# shrinks the VMEM working set enough for 65-layer columns.
#
# Block algebra (see solver/bvp.py for the derivation; N = nstr/2, m = 2N):
#   diag_l  = [[gm_l,        gp_l*e_l],
#              [gp_l*e_l,    gm_l    ]]   (- surface refl on last layer's
#                                          bottom rows: [R@(gm*e), R@gp])
#   lower_l = -[[gm_{l-1}*e, gp_{l-1}], [0, 0]]          (l >= 1)
#   upper_l = -[[0, 0], [gp_{l+1},     gm_{l+1}*e]]      (l <= L-2)
#
# RANK-N FACTOR STORAGE (round 5): the Thomas elimination factor
# W_l = dt_l^-1 @ upper_l has rank <= N because upper_l's only nonzero
# rows are its bottom N:  upper_l = [[0], [ub_l]] with ub_l [N, 2N], so
#
#     W_l = C_l @ ub_l,   C_l = dt_l^-1[:, N:]   ([2N, N]).
#
# The kernel therefore never forms W: the forward pass solves for the N
# columns C (identity RHS rows N..2N-1) instead of the 2N columns of W —
# shrinking the _solve_step augmented width from 4N+1 to 3N+1 — and stores
# C (+ y), HALVING the factor history the backward pass streams; the
# backward pass reconstructs ub_l from gp/gm/ee at layer l+1 (already
# resident) and applies x_l = y_l - C_l (ub_l x_{l+1}) as two skinny
# matvecs.  The forward correction lower @ W_prev becomes
# (lt @ C_prev) @ ub_prev — same flops, ub_prev built from the CURRENT
# layer's mats (ub_{l-1} couples layer l-1 to l).


def _mm(a, b):
    """[n,k,TB] @ [k,j,TB] -> [n,j,TB] lane matmul."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _eye_bottom(m, n, like_row):
    """[m, n, TB] whose rows N..2N-1 form I_N (columns of dt^-1 to solve
    for); built from ones_like so Mosaic sees no captured constant."""
    one = jnp.ones_like(like_row)
    zero = jnp.zeros_like(like_row)
    return jnp.stack(
        [jnp.stack([one if i == (m - n) + j else zero for j in range(n)],
                   axis=0)
         for i in range(m)], axis=0,
    )


def _rt_kernel(gp_ref, gm_ref, ee_ref, refl_ref, rhs_ref,
               xs_ref, ws_ref, ys_ref):
    """Single-pass (whole column VMEM-resident) fused assemble+solve.

    Stores the FULL [2N, 2N] Thomas factor W per layer: the history lives
    in VMEM scratch, so the rank-N storage that pays on the streamed
    variant (HBM history traffic) only adds backward-pass work here —
    measured round 5: rank-N single-pass was 9% SLOWER at the nstr=4
    bench shape (the ub reconstruction + two skinny matvecs cost more
    than the 2-column-narrower forward solve saves when no HBM byte
    moves).  The streamed chunk kernels below keep the rank-N scheme.
    """
    nlyr, n, _, tb = gp_ref.shape
    m = 2 * n
    dtype = gp_ref.dtype

    def layer_mats(l):
        gpl = gp_ref[pl.ds(l, 1)][0]            # [N, N, TB]
        gml = gm_ref[pl.ds(l, 1)][0]
        eel = ee_ref[pl.ds(l, 1)][0]            # [N, TB]
        gpe = gpl * eel[None, :, :]             # column scaling
        gme = gml * eel[None, :, :]
        return gpl, gml, gpe, gme

    def fwd(l, carry):
        w_prev, y_prev = carry
        gpl, gml, gpe, gme = layer_mats(l)

        # ---- diagonal block ------------------------------------------------
        d_top = jnp.concatenate([gml, gpe], axis=1)       # [N, 2N, TB]
        d_bot = jnp.concatenate([gpe, gml], axis=1)
        last = jnp.where(l == nlyr - 1, jnp.ones((), dtype), jnp.zeros((), dtype))
        refl = refl_ref[:]                                 # [N, N, TB]
        d_bot = d_bot - last * jnp.concatenate(
            [_mm(refl, gme), _mm(refl, gpl)], axis=1
        )
        diag_l = jnp.concatenate([d_top, d_bot], axis=0)   # [2N, 2N, TB]

        # ---- lower block (top rows only, from layer l-1) -------------------
        lm1 = jnp.maximum(l - 1, 0)
        gpm, gmm, gpem, gmem = layer_mats(lm1)
        has_low = jnp.where(l > 0, jnp.ones((), dtype), jnp.zeros((), dtype))
        lt = -has_low * jnp.concatenate([gmem, gpm], axis=1)   # [N, 2N, TB]

        # dt = diag - lower @ w_prev ; lower nonzero only in top rows
        corr_top = _mm(lt, w_prev)                         # [N, 2N, TB]
        dt = diag_l - jnp.concatenate(
            [corr_top, jnp.zeros_like(corr_top)], axis=0
        )
        r_l = rhs_ref[pl.ds(l, 1)][0]                      # [2N, TB]
        corr_r = jnp.sum(lt * y_prev[None, :, :], axis=1)  # [N, TB]
        rt = r_l - jnp.concatenate([corr_r, jnp.zeros_like(corr_r)], axis=0)

        # ---- upper block (bottom rows only, from layer l+1) ----------------
        lp1 = jnp.minimum(l + 1, nlyr - 1)
        gpp, gmp, gpep, gmep = layer_mats(lp1)
        has_up = jnp.where(l < nlyr - 1, jnp.ones((), dtype),
                           jnp.zeros((), dtype))
        ub = -has_up * jnp.concatenate([gpp, gmep], axis=1)    # [N, 2N, TB]
        upper_l = jnp.concatenate([jnp.zeros_like(ub), ub], axis=0)

        sol = _solve_step(dt, jnp.concatenate(
            [upper_l, rt[:, None, :]], axis=1))
        w_l = sol[:, :m]
        y_l = sol[:, m]
        ws_ref[pl.ds(l, 1)] = w_l.reshape(m * m, tb)[None]
        ys_ref[pl.ds(l, 1)] = y_l[None]
        return (w_l, y_l)

    w0 = jnp.zeros((m, m, tb), dtype)
    y0 = jnp.zeros((m, tb), dtype)
    w_last, y_last = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nlyr), fwd, (w0, y0)
    )

    xs_ref[nlyr - 1] = y_last

    def bwd(i, x_next):
        l = jnp.int32(nlyr - 2) - i
        y_l = ys_ref[pl.ds(l, 1)][0]
        w_l = ws_ref[pl.ds(l, 1)][0].reshape(m, m, tb)
        x_l = y_l - jnp.sum(w_l * x_next[None, :, :], axis=1)
        xs_ref[pl.ds(l, 1)] = x_l[None]
        return x_l

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlyr - 1), bwd, y_last)


# --------------------------------------------------------------------------
# Streamed (two-pass, layer-chunked) variant for shapes whose whole-column
# working set exceeds VMEM (e.g. nstr=16 x 65 layers: the single-pass kernel
# needs ~19 MB/128 lanes > the 16 MB scoped-vmem limit).  The forward
# elimination runs as a SEQUENTIAL grid over layer chunks, carrying
# (C_prev, y_prev, previous layer's gp/gm/ee) in VMEM scratch across grid
# steps and writing the rank-N C/y factor history to HBM as chunked
# outputs; the backward substitution is a second kernel streaming that
# history in reverse plus a re-read of gp/gm/ee (to rebuild ub_l).  HBM
# traffic is [inputs + 2x rank-N history + gp/gm/ee re-read + xs] —
# vs round 4's full-W history this trades m*m*L of W write+read for
# m*n*L write+read plus (2n^2+n)*L re-read: a ~30% total-traffic cut at
# n=8, and the fwd solve width shrinks from 4N+1 to 3N+1 columns.
# --------------------------------------------------------------------------


def _rt_fwd_chunk_kernel(nlyr_real, lc, gp_ref, gm_ref, ee_ref, refl_ref,
                         rhs_ref, cs_ref, ys_ref,
                         ccar, ycar, gpcar, gmcar, eecar):
    n = gp_ref.shape[1]
    m = 2 * n
    tb = gp_ref.shape[-1]
    dtype = gp_ref.dtype
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        ccar[...] = jnp.zeros((m, n, tb), dtype)
        ycar[...] = jnp.zeros((m, tb), dtype)
        gpcar[...] = jnp.zeros((n, n, tb), dtype)
        gmcar[...] = jnp.zeros((n, n, tb), dtype)
        eecar[...] = jnp.zeros((n, tb), dtype)

    def layer_mats(l):
        gpl = gp_ref[pl.ds(l, 1)][0]
        gml = gm_ref[pl.ds(l, 1)][0]
        eel = ee_ref[pl.ds(l, 1)][0]
        return gpl, gml, gpl * eel[None, :, :], gml * eel[None, :, :]

    eyeb = _eye_bottom(m, n, gp_ref[0][0, 0])

    def fwd(l, carry):
        c_prev, y_prev, gp_pm, gm_pm, ee_pm = carry
        gl = c * lc + l                       # global layer index
        gpl, gml, gpe, gme = layer_mats(l)

        d_top = jnp.concatenate([gml, gpe], axis=1)
        d_bot = jnp.concatenate([gpe, gml], axis=1)
        last = jnp.where(gl == nlyr_real - 1, jnp.ones((), dtype),
                         jnp.zeros((), dtype))
        refl = refl_ref[:]
        d_bot = d_bot - last * jnp.concatenate(
            [_mm(refl, gme), _mm(refl, gpl)], axis=1
        )
        diag_l = jnp.concatenate([d_top, d_bot], axis=0)

        # previous layer's mats: in-chunk for l >= 1, carried for l == 0
        lm1 = jnp.maximum(l - 1, 0)
        gpm_c, gmm_c, _, _ = layer_mats(lm1)
        eem_c = ee_ref[pl.ds(lm1, 1)][0]
        first = (l == 0)
        gpm = jnp.where(first, gp_pm, gpm_c)
        gmm = jnp.where(first, gm_pm, gmm_c)
        eem = jnp.where(first, ee_pm, eem_c)
        gpem = gpm * eem[None, :, :]
        gmem = gmm * eem[None, :, :]
        has_low = jnp.where(gl > 0, jnp.ones((), dtype), jnp.zeros((), dtype))
        lt = -has_low * jnp.concatenate([gmem, gpm], axis=1)

        # rank-N correction: lower @ W_prev = (lt @ C_prev) @ ub_prev,
        # with ub_prev (layer gl-1 -> gl coupling) from THIS layer's mats —
        # always in-chunk, so no halo read in the forward pass
        ub_prev = -jnp.concatenate([gpl, gme], axis=1)
        corr_top = _mm(_mm(lt, c_prev), ub_prev)
        dt = diag_l - jnp.concatenate(
            [corr_top, jnp.zeros_like(corr_top)], axis=0
        )
        r_l = rhs_ref[pl.ds(l, 1)][0]
        corr_r = jnp.sum(lt * y_prev[None, :, :], axis=1)
        rt = r_l - jnp.concatenate([corr_r, jnp.zeros_like(corr_r)], axis=0)

        sol = _solve_step(dt, jnp.concatenate(
            [eyeb, rt[:, None, :]], axis=1))
        c_l = sol[:, :n]
        y_l = sol[:, n]
        cs_ref[pl.ds(l, 1)] = c_l.reshape(m * n, tb)[None]
        ys_ref[pl.ds(l, 1)] = y_l[None]
        return (c_l, y_l, gpl, gml, ee_ref[pl.ds(l, 1)][0])

    carry0 = (ccar[...], ycar[...], gpcar[...], gmcar[...], eecar[...])
    c_l, y_l, gpl, gml, eel = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(lc), fwd, carry0
    )
    ccar[...] = c_l
    ycar[...] = y_l
    gpcar[...] = gpl
    gmcar[...] = gml
    eecar[...] = eel


def _rt_bwd_chunk_kernel(nchunks, lc, gp_ref, gm_ref, ee_ref,
                         cs_ref, ys_ref, xs_ref, xcar):
    """Backward substitution, streaming the rank-N factors in reverse.

    x_l = y_l - C_l (ub_l x_{l+1}) with ub_l rebuilt from gp/gm/ee at
    layer l+1 — the one-layer halo (the caller feeds lc+1 layers per
    chunk) makes l+1 always in-chunk; the global last layer's halo row is
    zero, so its ub (and hence the correction) vanishes, as does every
    padded layer's (gp = 0, ee = 0).
    """
    n = gp_ref.shape[1]
    m = 2 * n
    tb = cs_ref.shape[-1]
    dtype = cs_ref.dtype
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        # the very last (padded-identity or real-last) layer: x = y
        xcar[...] = jnp.zeros((m, tb), dtype)

    def bwd(i, x_next):
        l = jnp.int32(lc - 1) - i
        y_l = ys_ref[pl.ds(l, 1)][0]
        c_l = cs_ref[pl.ds(l, 1)][0].reshape(m, n, tb)
        gpp = gp_ref[pl.ds(l + 1, 1)][0]
        gmp = gm_ref[pl.ds(l + 1, 1)][0]
        eep = ee_ref[pl.ds(l + 1, 1)][0]
        ub = -jnp.concatenate([gpp, gmp * eep[None, :, :]], axis=1)
        z = jnp.sum(ub * x_next[None, :, :], axis=1)
        x_l = y_l - jnp.sum(c_l * z[None, :, :], axis=1)
        xs_ref[pl.ds(l, 1)] = x_l[None]
        return x_l

    x_last = jax.lax.fori_loop(jnp.int32(0), jnp.int32(lc), bwd, xcar[...])
    xcar[...] = x_last


def _chunk_floats(lc: int, n: int, m: int) -> int:
    """Per-lane f32 working set of one streamed chunk (max of fwd/bwd).

    fwd: gp/gm/ee halo chunk + rhs + cs/ys out + refl + carries;
    bwd: gp/gm/ee halo chunk + cs/ys in + xs out + xcar.
    """
    halo = (lc + 1) * (2 * n * n + n)
    fwd = halo + lc * (2 * m + m * n) + n * n + (m * n + m) + (2 * n * n + n)
    bwd = halo + lc * (2 * m + m * n) + m
    return max(fwd, bwd)


def _block_thomas_rt_streamed(gp, gm, ee, refl, rhs, *, tile_b, interpret,
                              layer_chunk=None):
    nlyr, n, _, b = gp.shape
    m = 2 * n
    dtype = gp.dtype

    if layer_chunk is None:
        # autotune: among chunk sizes whose working set still allows a
        # 128-lane tile, MINIMIZE the padded layer count first (the
        # serial loop runs every padded layer: lc=32 at nlyr=65 pads to
        # 96 layers — 48% pure waste, measured as a 17% kernel regression
        # in round 5), then prefer the larger chunk (bigger chunks
        # amortize the grid-step carry; round-4 trace sweep: lc=24/t128
        # beats lc=8/t256 by 8%)
        best = (1 << 30, 0, 8)
        for lc_try in (64, 48, 40, 36, 33, 32, 28, 24, 22, 20, 16, 12, 8):
            if lc_try <= nlyr and _tile_for_vmem(
                2 * _chunk_floats(lc_try, n, m), 256
            ) >= 128:
                padded = -(-nlyr // lc_try) * lc_try
                key = (padded, -lc_try, lc_try)
                if key < best:
                    best = key
        layer_chunk = best[2]

    # pad layers to a chunk multiple with decoupled identity layers
    # (gp = 0, gm = I, ee = 0, rhs = 0): their W is zero, so the padded
    # back-substitution start x = 0 leaves real layers untouched.
    lpad = (-nlyr) % layer_chunk
    if lpad:
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=dtype)[None, :, :, None], (lpad, n, n, b)
        )
        gp = jnp.concatenate([gp, jnp.zeros((lpad, n, n, b), dtype)], axis=0)
        gm = jnp.concatenate([gm, eye], axis=0)
        ee = jnp.concatenate([ee, jnp.zeros((lpad, n, b), dtype)], axis=0)
        rhs = jnp.concatenate([rhs, jnp.zeros((lpad, m, b), dtype)], axis=0)
    lfull = nlyr + lpad
    nchunks = lfull // layer_chunk
    lc = layer_chunk

    # one-layer halo for the upper-block read (layer l+1); the final chunk's
    # halo reads a zero layer appended here
    gp_h = jnp.concatenate([gp, jnp.zeros((1, n, n, b), dtype)], axis=0)
    gm_h = jnp.concatenate([gm, jnp.zeros((1, n, n, b), dtype)], axis=0)
    ee_h = jnp.concatenate([ee, jnp.zeros((1, n, b), dtype)], axis=0)

    # lane tile from the CHUNK working set
    tb = _tile_for_vmem(2 * _chunk_floats(lc, n, m), min(tile_b, max(128, b)))
    if tb == 0:
        raise ValueError("streamed block_thomas_rt: chunk too large for VMEM")
    pad = (-b) % tb
    if pad:
        def padb(x, diag_eye=False):
            if not diag_eye:
                return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
            eye = jnp.broadcast_to(
                jnp.eye(x.shape[-2], dtype=dtype)[None, :, :, None],
                x.shape[:-1] + (pad,),
            )
            return jnp.concatenate([x, eye], axis=-1)
        gp_h = padb(gp_h)
        gm_h = padb(gm_h, diag_eye=True)
        ee_h = padb(ee_h)
        refl = padb(refl)
        rhs = padb(rhs)
    b_pad = b + pad
    grid = (b_pad // tb, nchunks)

    # halo-block spec: chunk c covers layers [c*lc, c*lc + lc]; expressed as
    # an index_map in units of the block shape requires overlap, which
    # BlockSpec cannot do — so slice the halo'd operand into a 4-D
    # [nchunks, lc+1, ...] gather done HERE (XLA), letting each grid step
    # load its own halo'd chunk.
    idx = (np.arange(nchunks)[:, None] * lc + np.arange(lc + 1)[None, :])
    gp_c = gp_h[idx.reshape(-1)].reshape((nchunks, lc + 1) + gp_h.shape[1:])
    gm_c = gm_h[idx.reshape(-1)].reshape((nchunks, lc + 1) + gm_h.shape[1:])
    ee_c = ee_h[idx.reshape(-1)].reshape((nchunks, lc + 1) + ee_h.shape[1:])
    rhs_c = rhs.reshape((nchunks, lc) + rhs.shape[1:])

    def cspec(x):
        blk = (1,) + x.shape[1:-1] + (tb,)
        nd = x.ndim
        return pl.BlockSpec(
            blk, lambda i, c, nd=nd: (c,) + (0,) * (nd - 2) + (i,),
            memory_space=pltpu.VMEM,
        )

    refl_spec = pl.BlockSpec(
        (n, n, tb), lambda i, c: (0, 0, i), memory_space=pltpu.VMEM
    )

    def rev(x):
        blk = (1,) + x.shape[1:-1] + (tb,)
        nd = x.ndim
        return pl.BlockSpec(
            blk, lambda i, c, nd=nd: (nchunks - 1 - c,) + (0,) * (nd - 2) + (i,),
            memory_space=pltpu.VMEM,
        )

    with jax.enable_x64(False):
        cs, ys = pl.pallas_call(
            functools.partial(_fwd_chunk_squeeze, nlyr, lc),
            grid=grid,
            in_specs=[cspec(gp_c), cspec(gm_c), cspec(ee_c), refl_spec,
                      cspec(rhs_c)],
            out_specs=[
                pl.BlockSpec((1, lc, m * n, tb),
                             lambda i, c: (c, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lc, m, tb), lambda i, c: (c, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nchunks, lc, m * n, b_pad), dtype),
                jax.ShapeDtypeStruct((nchunks, lc, m, b_pad), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((m, n, tb), dtype), pltpu.VMEM((m, tb), dtype),
                pltpu.VMEM((n, n, tb), dtype), pltpu.VMEM((n, n, tb), dtype),
                pltpu.VMEM((n, tb), dtype),
            ],
            interpret=interpret,
        )(gp_c, gm_c, ee_c, refl, rhs_c)

        xs = pl.pallas_call(
            functools.partial(_bwd_chunk_squeeze, nchunks, lc),
            grid=grid,
            in_specs=[
                rev(gp_c), rev(gm_c), rev(ee_c), rev(cs), rev(ys),
            ],
            out_specs=pl.BlockSpec(
                (1, lc, m, tb), lambda i, c: (nchunks - 1 - c, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((nchunks, lc, m, b_pad), dtype),
            scratch_shapes=[pltpu.VMEM((m, tb), dtype)],
            interpret=interpret,
        )(gp_c, gm_c, ee_c, cs, ys)

    xs = xs.reshape(lfull, m, b_pad)[:nlyr]
    return xs[..., :b] if pad else xs


def _fwd_chunk_squeeze(nlyr_real, lc, gp_ref, gm_ref, ee_ref, refl_ref,
                       rhs_ref, cs_ref, ys_ref, *scratch):
    _rt_fwd_chunk_kernel(
        nlyr_real, lc,
        gp_ref.at[0], gm_ref.at[0], ee_ref.at[0], refl_ref,
        rhs_ref.at[0], cs_ref.at[0], ys_ref.at[0], *scratch,
    )


def _bwd_chunk_squeeze(nchunks, lc, gp_ref, gm_ref, ee_ref, cs_ref, ys_ref,
                       xs_ref, xcar):
    _rt_bwd_chunk_kernel(
        nchunks, lc, gp_ref.at[0], gm_ref.at[0], ee_ref.at[0],
        cs_ref.at[0], ys_ref.at[0], xs_ref.at[0], xcar
    )


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def block_thomas_rt(
    gp: jnp.ndarray,        # [L, N, N, B] eigenvectors G+ (lane layout)
    gm: jnp.ndarray,        # [L, N, N, B] eigenvectors G-
    ee: jnp.ndarray,        # [L, N, B]    exp(-k dtau) per eigenmode
    refl: jnp.ndarray,      # [N, N, B]    surface operator R[i,k] w_k mu_k
    rhs: jnp.ndarray,       # [L, 2N, B]
    *,
    tile_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SETMTX+SOLVE0: block-tridiag solve with on-the-fly assembly."""
    nlyr, n, _, b = gp.shape
    m = 2 * n
    dtype = gp.dtype

    # n=2 (the nstr=4 primary path): planar full-sublane kernel (every
    # block entry its own [8, B/8] plane — see _rt_kernel_planar)
    if n == 2:
        xs = _block_thomas_rt_planar_n2(
            gp, gm, ee, refl, rhs, interpret=interpret
        )
        if xs is not None:
            return xs

    # per-lane f32 working set: gp+gm+ee inputs, rhs/xs/ys, and the FULL
    # [2N, 2N] factor history (the single-pass kernel keeps full W — see
    # _rt_kernel docstring), + refl and temporaries
    floats = nlyr * (4 * n * n + 2 * n + 2 * 2 * m + m * m) + 2 * n * n
    tb = _tile_for_vmem(floats, min(tile_b, max(128, b)))
    if tb == 0:
        # whole-column working set exceeds VMEM (e.g. nstr=16 x 65 layers):
        # stream the layer axis in chunks through HBM instead
        return _block_thomas_rt_streamed(
            gp, gm, ee, refl, rhs, tile_b=tile_b, interpret=interpret
        )
    pad = (-b) % tb
    if pad:
        def padb(x, diag_eye=False):
            pw = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            if not diag_eye:
                return jnp.pad(x, pw)
            eye = jnp.broadcast_to(
                jnp.eye(x.shape[-2], dtype=dtype)[None, :, :, None],
                x.shape[:-1] + (pad,),
            )
            return jnp.concatenate([x, eye], axis=-1)
        gp = padb(gp)
        gm = padb(gm, diag_eye=True)   # gm = I on pad lanes => diag invertible
        ee = padb(ee)
        refl = padb(refl)
        rhs = padb(rhs)
    b_pad = b + pad

    grid = (b_pad // tb,)

    def spec(x):
        blk = x.shape[:-1] + (tb,)
        nd = x.ndim
        return pl.BlockSpec(
            blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,),
            memory_space=pltpu.VMEM,
        )

    with jax.enable_x64(False):
        xs = pl.pallas_call(
            _rt_kernel,
            grid=grid,
            in_specs=[spec(gp), spec(gm), spec(ee), spec(refl), spec(rhs)],
            out_specs=spec(rhs),
            out_shape=jax.ShapeDtypeStruct((nlyr, m, b_pad), dtype),
            scratch_shapes=[
                pltpu.VMEM((nlyr, m * m, tb), dtype),
                pltpu.VMEM((nlyr, m, tb), dtype),
            ],
            interpret=interpret,
        )(gp, gm, ee, refl, rhs)
    return xs[..., :b] if pad else xs


# --------------------------------------------------------------------------
# PLANAR n=2 single-pass kernel (round 5).  At n = 2 (the nstr=4 primary
# path) every op in _rt_kernel is shaped [4, w, TB] or [4, TB]: the
# second-to-last dim maps to SUBLANES, so at most half of each (8, 128)
# tile does work.  Here every block ENTRY is its own [8, B/8] plane — a
# free row-major reshape of the lane axis done outside the kernel — and
# all arithmetic runs on full tiles.  Same math as _rt_kernel (full-W
# history, shrinking pivoted GE with the identical first-max pivot rule);
# equivalence rides the existing block_thomas_rt interpret + TPU tests,
# which dispatch here for every n=2 shape.
# --------------------------------------------------------------------------


def _planar_solve4(dt, rhs_cols):
    """Pivoted shrinking GE on planes.

    dt: 4x4 nested list of [S, tb] planes; rhs_cols: list of r columns,
    each a list of 4 row planes.  Returns list of r solution columns
    (each 4 planes).  Pivot rule identical to _solve_step: first row of
    maximal |leading entry| among uneliminated rows.
    """
    m = 4
    aug = [[dt[i][j] for i in range(m)] for j in range(m)] + \
        [list(c) for c in rhs_cols]
    elim = [None] * m
    prows = []
    for k in range(m):
        lead = aug[0]
        cand = []
        for i in range(m):
            c = jnp.abs(lead[i])
            if elim[i] is not None:
                c = jnp.where(elim[i], -1.0, c)
            cand.append(c)
        mx = jnp.maximum(jnp.maximum(cand[0], cand[1]),
                         jnp.maximum(cand[2], cand[3]))
        sel = []
        taken = None
        for i in range(m):
            s_i = cand[i] == mx
            if taken is not None:
                s_i = s_i & (~taken)
                taken = taken | s_i
            else:
                taken = s_i
            sel.append(s_i)
        pv = sum(jnp.where(sel[i], lead[i], 0.0) for i in range(m))
        inv = 1.0 / pv
        fac = []
        for i in range(m):
            f = lead[i] * inv
            mask = sel[i] if elim[i] is None else (elim[i] | sel[i])
            fac.append(jnp.where(mask, 0.0, f))
        tail = []
        new_aug = []
        for col in aug[1:]:
            rp = sum(jnp.where(sel[i], col[i], 0.0) for i in range(m))
            tail.append(rp)
            new_aug.append([col[i] - fac[i] * rp for i in range(m)])
        aug = new_aug
        prows.append((pv, tail))
        elim = [sel[i] if elim[i] is None else (elim[i] | sel[i])
                for i in range(m)]
    r = len(rhs_cols)
    x = [None] * m
    for i in reversed(range(m)):
        pv, tail = prows[i]            # tail: a_{i,i+1..3} then r rhs cols
        s = list(tail[m - i - 1:])
        for j in range(i + 1, m):
            aij = tail[j - i - 1]
            s = [s[t] - aij * x[j][t] for t in range(r)]
        x[i] = [s[t] / pv for t in range(r)]
    return [[x[i][t] for i in range(m)] for t in range(r)]   # r columns


def _rt_kernel_planar(gp_ref, gm_ref, ee_ref, refl_ref, rhs_ref,
                      xs_ref, ws_ref, ys_ref):
    """Planar n=2 fused assemble+solve; refs carry entry planes:
    gp/gm [L, 4, S, tb] (11,12,21,22), ee [L, 2, S, tb], refl [4, S, tb],
    rhs/xs [L, 4, S, tb], ws scratch [L, 16, S, tb], ys [L, 4, S, tb]."""
    nlyr = gp_ref.shape[0]
    s_dim, tb = gp_ref.shape[-2], gp_ref.shape[-1]
    dtype = gp_ref.dtype

    refl_p = refl_ref[...]
    rmat = [[refl_p[0], refl_p[1]], [refl_p[2], refl_p[3]]]

    def mats(l):
        g = gp_ref[pl.ds(l, 1)][0]
        h = gm_ref[pl.ds(l, 1)][0]
        e = ee_ref[pl.ds(l, 1)][0]
        gp2 = [[g[0], g[1]], [g[2], g[3]]]
        gm2 = [[h[0], h[1]], [h[2], h[3]]]
        gpe = [[gp2[i][j] * e[j] for j in range(2)] for i in range(2)]
        gme = [[gm2[i][j] * e[j] for j in range(2)] for i in range(2)]
        return gp2, gm2, gpe, gme

    def fwd(l, carry):
        w_arr, y_arr = carry           # [16, S, tb], [4, S, tb]
        w_prev = [[w_arr[4 * i + j] for j in range(4)] for i in range(4)]
        y_prev = [y_arr[i] for i in range(4)]
        gp2, gm2, gpe, gme = mats(l)

        last = jnp.where(l == nlyr - 1, jnp.ones((), dtype),
                         jnp.zeros((), dtype))
        # diag = [[gm, gpe], [gpe, gm]] - last * [[0,0],[R gme, R gp]]
        d = [[None] * 4 for _ in range(4)]
        for i in range(2):
            for j in range(2):
                d[i][j] = gm2[i][j]
                d[i][2 + j] = gpe[i][j]
                rg_me = rmat[i][0] * gme[0][j] + rmat[i][1] * gme[1][j]
                rg_p = rmat[i][0] * gp2[0][j] + rmat[i][1] * gp2[1][j]
                d[2 + i][j] = gpe[i][j] - last * rg_me
                d[2 + i][2 + j] = gm2[i][j] - last * rg_p

        # lower block rows (from layer l-1)
        lm1 = jnp.maximum(l - 1, 0)
        has_low = jnp.where(l > 0, jnp.ones((), dtype), jnp.zeros((), dtype))
        gpm, gmm, gpem, gmem = mats(lm1)
        lt = [[None] * 4 for _ in range(2)]
        for i in range(2):
            for j in range(2):
                lt[i][j] = -has_low * gmem[i][j]
                lt[i][2 + j] = -has_low * gpm[i][j]

        r_l = rhs_ref[pl.ds(l, 1)][0]
        rt = [r_l[i] for i in range(4)]
        dt = [[d[i][j] for j in range(4)] for i in range(4)]
        for i in range(2):
            corr_r = sum(lt[i][k] * y_prev[k] for k in range(4))
            rt[i] = rt[i] - corr_r
            for j in range(4):
                corr = sum(lt[i][k] * w_prev[k][j] for k in range(4))
                dt[i][j] = dt[i][j] - corr

        # upper block (bottom rows, from layer l+1)
        lp1 = jnp.minimum(l + 1, nlyr - 1)
        has_up = jnp.where(l < nlyr - 1, jnp.ones((), dtype),
                           jnp.zeros((), dtype))
        gpp, gmp, gpep, gmep = mats(lp1)
        zero = jnp.zeros_like(rt[0])
        ucols = []
        for j in range(4):
            col = [zero, zero, None, None]
            for i in range(2):
                if j < 2:
                    col[2 + i] = -has_up * gpp[i][j]
                else:
                    col[2 + i] = -has_up * gmep[i][j - 2]
            ucols.append(col)

        sol = _planar_solve4(dt, ucols + [rt])
        w_l = [[sol[j][i] for j in range(4)] for i in range(4)]
        y_l = sol[4]
        ws_ref[pl.ds(l, 1)] = jnp.stack(
            [w_l[i][j] for i in range(4) for j in range(4)], axis=0
        )[None]
        ys_ref[pl.ds(l, 1)] = jnp.stack(y_l, axis=0)[None]
        return (jnp.stack([w_l[i][j] for i in range(4) for j in range(4)],
                          axis=0),
                jnp.stack(y_l, axis=0))

    w0 = jnp.zeros((16, s_dim, tb), dtype)
    y0 = jnp.zeros((4, s_dim, tb), dtype)
    w_last, y_last = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nlyr), fwd, (w0, y0)
    )

    xs_ref[nlyr - 1] = y_last

    def bwd(i, x_next):
        l = jnp.int32(nlyr - 2) - i
        y_l = ys_ref[pl.ds(l, 1)][0]
        w_l = ws_ref[pl.ds(l, 1)][0]
        x_l = jnp.stack(
            [y_l[r] - sum(w_l[4 * r + j] * x_next[j] for j in range(4))
             for r in range(4)], axis=0,
        )
        xs_ref[pl.ds(l, 1)] = x_l[None]
        return x_l

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nlyr - 1), bwd, y_last)


def _block_thomas_rt_planar_n2(gp, gm, ee, refl, rhs, *, interpret):
    """Planar-layout wrapper for n=2: pad B to an (8*128)-multiple, fold
    the lane axis into (8 sublanes x B/8 lanes), run the planar kernel."""
    nlyr, n, _, b = gp.shape
    assert n == 2
    dtype = gp.dtype
    sub = 8

    # VMEM working set per PLANAR lane = 8 original lanes' worth
    per_lane = nlyr * (4 * 4 + 2 * 4 + 4 * 4 + 16 + 4) + 2 * 4
    tb = _tile_for_vmem(sub * per_lane, 512)
    if tb == 0:
        return None                    # caller falls back to generic kernel
    unit = sub * tb
    pad = (-b) % unit
    if pad:
        eye = jnp.broadcast_to(
            jnp.eye(2, dtype=dtype)[None, :, :, None], (nlyr, 2, 2, pad)
        )
        gp = jnp.concatenate([gp, jnp.zeros((nlyr, 2, 2, pad), dtype)],
                             axis=-1)
        gm = jnp.concatenate([gm, eye], axis=-1)
        ee = jnp.concatenate([ee, jnp.zeros((nlyr, 2, pad), dtype)], axis=-1)
        refl = jnp.concatenate([refl, jnp.zeros((2, 2, pad), dtype)],
                               axis=-1)
        rhs = jnp.concatenate([rhs, jnp.zeros((nlyr, 4, pad), dtype)],
                              axis=-1)
    bp = b + pad
    lp = bp // sub

    gp_p = gp.reshape(nlyr, 4, sub, lp)
    gm_p = gm.reshape(nlyr, 4, sub, lp)
    ee_p = ee.reshape(nlyr, 2, sub, lp)
    refl_p = refl.reshape(4, sub, lp)
    rhs_p = rhs.reshape(nlyr, 4, sub, lp)

    grid = (lp // tb,)

    def spec(x):
        blk = x.shape[:-1] + (tb,)
        nd = x.ndim
        return pl.BlockSpec(
            blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,),
            memory_space=pltpu.VMEM,
        )

    with jax.enable_x64(False):
        xs_p = pl.pallas_call(
            _rt_kernel_planar,
            grid=grid,
            in_specs=[spec(gp_p), spec(gm_p), spec(ee_p), spec(refl_p),
                      spec(rhs_p)],
            out_specs=spec(rhs_p),
            out_shape=jax.ShapeDtypeStruct((nlyr, 4, sub, lp), dtype),
            scratch_shapes=[
                pltpu.VMEM((nlyr, 16, sub, tb), dtype),
                pltpu.VMEM((nlyr, 4, sub, tb), dtype),
            ],
            interpret=interpret,
        )(gp_p, gm_p, ee_p, refl_p, rhs_p)
    xs = xs_p.reshape(nlyr, 4, bp)
    return xs[..., :b] if pad else xs
