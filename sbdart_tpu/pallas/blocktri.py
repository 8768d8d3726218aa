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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_step(dt, rhs_aug):
    """Solve dt @ X = rhs_aug for [m, m, TB] dt, [m, r, TB] rhs_aug.

    Branchless masked partial-pivoted GE: no scatters, no dynamic slices —
    every update is a where/select over the full [m, m+r, TB] block, which
    is what Mosaic lowers cleanly.
    """
    m = dt.shape[0]
    tb = dt.shape[-1]
    aug = jnp.concatenate([dt, rhs_aug], axis=1)       # [m, m+r, TB]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)   # [m, 1]
    for k in range(m):
        col = jnp.abs(aug[:, k, :])                    # [m, TB]
        col = jnp.where(row_ids < k, -1.0, col)
        piv = jax.lax.argmax(col, axis=0, index_dtype=jnp.int32)   # [TB]
        sel_p = (row_ids == piv[None, :])              # [m, TB]
        sel_k = (row_ids == k)                         # [m, 1]
        row_k = aug[k]                                 # [m+r, TB]
        row_p = jnp.sum(jnp.where(sel_p[:, None, :], aug, 0.0), axis=0)
        # swap rows k and piv: row k <- row_p, row piv <- row_k
        aug = jnp.where(sel_p[:, None, :], row_k[None, :, :], aug)
        aug = jnp.where(sel_k[:, None, :], row_p[None, :, :], aug)
        # eliminate strictly below row k
        inv_piv = 1.0 / aug[k, k]
        factor = jnp.where(row_ids > k, aug[:, k, :] * inv_piv[None, :], 0.0)
        aug = aug - factor[:, None, :] * aug[k][None, :, :]
    x = [None] * m
    for i in reversed(range(m)):
        s = aug[i, m:]
        for j in range(i + 1, m):
            s = s - aug[i, j][None, :] * x[j]
        x[i] = s / aug[i, i][None, :]
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
    the ~16 MB VMEM budget (with headroom for Mosaic double buffering)."""
    budget = 12 * 1024 * 1024
    tb = budget // (4 * floats_per_lane)
    tb = max(128, min(tile_b, (tb // 128) * 128))
    return tb


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


def _mm(a, b):
    """[n,k,TB] @ [k,j,TB] -> [n,j,TB] lane matmul."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _rt_kernel(gp_ref, gm_ref, ee_ref, refl_ref, rhs_ref,
               xs_ref, ws_ref, ys_ref):
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

    # per-lane f32 working set: gp+gm+ee+rhs+refl inputs, xs out, ws/ys scratch
    floats = nlyr * (4 * n * n + 2 * n + 2 * 2 * m + m * m) + 2 * n * n
    tb = _tile_for_vmem(floats, min(tile_b, max(128, b)))
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
