"""Lane-layout batched small linear algebra.

TPU arrays are tiled on their LAST TWO dims as (8 sublanes, 128 lanes) for
f32.  The solver's natural pytrees put the tiny matrix dims (n = nstr/2,
2..16) last, so every elementwise op on a [batch, n, n] array wastes up to
(8*128)/(n*n) = 256x of the vector unit and of HBM bandwidth.  The "lane
layout" fixes this by transposing to matrix-dims-leading:

    matrices  [n, n, B]     vectors  [n, B]     scalars  [B]

with the flattened batch B in the minor (lane) axis, so every row/column/
element access is a [B] vector op at full lane occupancy.  The unrolled
n-loops (n is static and tiny) generate pure VPU code with zero padding.

These kernels replace the reference's LINPACK/EISPACK calls
(disutil.f:SGECO/SGESL/SGBFA and disort.f:ASYMTX — see SURVEY.md section
3.2) with batch-vectorized equivalents; the batch axis carries the
parallelism the serial Fortran never had.

Public wrappers in batched_linalg.py keep the [..., n, n] convention and
relayout at the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Layout shuffles
# --------------------------------------------------------------------------

def to_lane(x: jnp.ndarray, ndim_mat: int = 2) -> tuple[jnp.ndarray, tuple]:
    """[..., n, n] -> [n, n, B] (or [..., n] -> [n, B]); returns batch shape."""
    batch_shape = x.shape[: x.ndim - ndim_mat]
    mat_shape = x.shape[x.ndim - ndim_mat:]
    b = 1
    for s in batch_shape:
        b *= s
    x = x.reshape((b,) + mat_shape)
    x = jnp.moveaxis(x, 0, -1)
    return x, batch_shape


def from_lane(x: jnp.ndarray, batch_shape: tuple) -> jnp.ndarray:
    """[n, ..., B] -> [batch..., n, ...]."""
    x = jnp.moveaxis(x, -1, 0)
    return x.reshape(batch_shape + x.shape[1:])


# --------------------------------------------------------------------------
# Primitives (all operate on lane-layout operands)
# --------------------------------------------------------------------------

def lmatmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., p, q, B] @ [..., q, r, B] -> [..., p, r, B] (fused mul+reduce)."""
    return jnp.sum(a[..., :, :, None, :] * b[..., None, :, :, :], axis=-3)


def lmatvec(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """[..., p, q, B] @ [..., q, B] -> [..., p, B]."""
    return jnp.sum(a * x[..., None, :, :], axis=-2)


def ltranspose(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(a, -3, -2)


def lcholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of SPD [n, n, B]; unrolled over the static n."""
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


def lsolve_upper_tri(u: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve U x = b with U upper-triangular [n, n, B], b [n, m, B]."""
    n = u.shape[0]
    x = [None] * n
    for i in reversed(range(n)):
        s = b[i]
        for k in range(i + 1, n):
            s = s - u[i, k][None, :] * x[k]
        x[i] = s / u[i, i][None, :]
    return jnp.stack(x, axis=0)


def lsolve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a @ x = b, a [n, n, B], b [n, m, B]: pivoted GE, unrolled.

    Partial pivoting is done branchlessly: the pivot row is chosen per batch
    lane with an argmax over |column| and rows are exchanged with masked
    selects, so the whole elimination is data-independent vector code.
    """
    n = a.shape[0]
    aug = jnp.concatenate([a, b], axis=1)          # [n, n+m, B]
    for k in range(n):
        col = jnp.abs(aug[:, k, :])                 # [n, B]
        if k > 0:
            col = col.at[:k].set(-1.0)
        piv = jnp.argmax(col, axis=0)               # [B]
        # swap rows k and piv (vectorized over B)
        row_k = aug[k]                              # [n+m, B]
        sel = (jnp.arange(n)[:, None] == piv[None, :])  # [n, B]
        row_p = jnp.sum(jnp.where(sel[:, None, :], aug, 0.0), axis=0)
        is_k = (piv == k)                           # [B]
        new_rows = jnp.where(
            sel[:, None, :] & ~is_k[None, None, :], row_k[None], aug
        )
        aug = new_rows.at[k].set(jnp.where(is_k[None, :], row_k, row_p))
        # eliminate below
        inv_piv = 1.0 / aug[k, k]
        if k + 1 < n:
            factor = aug[k + 1:, k, :] * inv_piv[None, :]      # [n-k-1, B]
            aug = aug.at[k + 1:].add(
                -factor[:, None, :] * aug[k][None, :, :]
            )
    # back substitution on the upper-triangular system
    x = [None] * n
    for i in reversed(range(n)):
        s = aug[i, n:]                               # [m, B]
        for j in range(i + 1, n):
            s = s - aug[i, j][None, :] * x[j]
        x[i] = s / aug[i, i][None, :]
    return jnp.stack(x, axis=0)                      # [n, m, B]


# --------------------------------------------------------------------------
# Symmetric eigendecomposition
# --------------------------------------------------------------------------

def _eigh2(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form symmetric 2x2 eigendecomposition, a [2, 2, B].

    The n=2 case is the nstr=4 SBDART default, so the entire ASYMTX
    replacement collapses to a handful of vector ops.
    """
    p, q, d = a[0, 0], a[0, 1], a[1, 1]
    theta = 0.5 * jnp.arctan2(2.0 * q, p - d)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    wa = c * c * p + 2.0 * c * s * q + s * s * d     # for column (c, s)
    wb = s * s * p - 2.0 * c * s * q + c * c * d     # for column (-s, c)
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


def _sort_ascending(w: jnp.ndarray, v: jnp.ndarray):
    """Ascending eigenvalue sort via a static compare-swap (bubble) network."""
    n = w.shape[0]
    for i in range(n - 1):
        for j in range(n - 1 - i):
            wj, wk = w[j], w[j + 1]
            swap = wj > wk
            w = w.at[j].set(jnp.where(swap, wk, wj))
            w = w.at[j + 1].set(jnp.where(swap, wj, wk))
            vj, vk = v[:, j], v[:, j + 1]
            v = v.at[:, j].set(jnp.where(swap[None, :], vk, vj))
            v = v.at[:, j + 1].set(jnp.where(swap[None, :], vj, vk))
    return w, v


def _round_robin_pairs(n: int) -> list[list[tuple[int, int]]]:
    """Tournament schedule: n-1 rounds of n/2 disjoint (p, q) pairs covering
    every unordered pair exactly once (parallel Jacobi ordering)."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        rounds.append([
            tuple(sorted((players[i], players[n - 1 - i])))
            for i in range(n // 2)
        ])
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


def _leigh_parallel(a: jnp.ndarray, v0: jnp.ndarray, sweeps: int):
    """Parallel-ordered cyclic Jacobi for even n: each round applies n/2
    disjoint Givens rotations at once as whole-matrix vector ops, so a
    sweep is n-1 large steps instead of n(n-1)/2 small ones — the shape
    the TPU VPU wants (fewer, bigger ops; same flops)."""
    n = a.shape[0]
    dtype = a.dtype
    eps = jnp.finfo(dtype).eps
    rounds = _round_robin_pairs(n)
    # static per-round gather/sign/mask tables
    tables = []
    for pairs in rounds:
        partner = np.empty(n, np.int32)
        sgn = np.empty(n, np.float64)
        for p, q in pairs:
            partner[p], partner[q] = q, p
            sgn[p], sgn[q] = -1.0, 1.0
        tables.append((partner, sgn))

    def one_sweep(_, av):
        a, v = av
        for pairs, (partner, sgn) in zip(rounds, tables):
            pidx = np.array([pq[0] for pq in pairs])
            qidx = np.array([pq[1] for pq in pairs])
            app = jnp.stack([a[p, p] for p in pidx], 0)      # [n/2, B]
            aqq = jnp.stack([a[q, q] for q in qidx], 0)
            apq = jnp.stack([a[p, q] for p, q in pairs], 0)
            small = jnp.abs(apq) <= eps * jnp.maximum(
                jnp.abs(app) + jnp.abs(aqq), eps
            )
            tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
            tsgn = jnp.where(tau >= 0.0, 1.0, -1.0)
            t = tsgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(small, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)                   # [n/2, B]
            s = t * c
            # scatter pair coefficients to per-row vectors [n, B]
            pair_of = np.empty(n, np.int32)
            for k, (p, q) in enumerate(pairs):
                pair_of[p] = pair_of[q] = k
            crow = c[pair_of]                                  # [n, B]
            srow = s[pair_of] * jnp.asarray(sgn, dtype)[:, None]
            prm = np.asarray(partner)
            # rows: A <- J^T A  (row i' = c_i row_i + sgn_i s_i row_partner)
            a = crow[:, None, :] * a + srow[:, None, :] * a[prm]
            # cols: A <- A J
            a = crow[None, :, :] * a + srow[None, :, :] * a[:, prm]
            # eigenvector columns rotate like columns of A
            v = crow[None, :, :] * v + srow[None, :, :] * v[:, prm]
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps, one_sweep, (a, v0))
    w = jnp.stack([a[i, i] for i in range(n)], axis=0)        # [n, B]
    return _sort_ascending(w, v)


def leigh(a: jnp.ndarray, sweeps: int = 6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition of [n, n, B]: (w [n, B], v [n, n, B]).

    Eigenvalues ascending, eigenvector columns v[:, j] matching
    jnp.linalg.eigh conventions.  n == 2 is closed-form; larger n runs
    cyclic Jacobi with the rotation order unrolled (static) and the sweep
    count as a fori_loop.

    Default sweeps: measured on the solver's physics matrices at n = 8
    (incl. near-conservative layers) — eigenvalue error and eigenpair
    residual reach the f32 floor by sweep 3 and are bit-stable from 4;
    6 keeps a 2x margin (see pallas/eig.py:DEFAULT_SWEEPS).  Re-measured
    at n = 16 (nstr = 32, the largest lane-path size): relerr ~1.5e-6,
    residual ~4e-6 at 6 sweeps — pinned by
    tests/test_foundations.py::test_leigh_convergence_n16.
    """
    n = a.shape[0]
    if n == 1:
        return a[0], jnp.ones_like(a)
    if n == 2:
        return _eigh2(a)

    dtype = a.dtype
    eps = jnp.finfo(dtype).eps
    v0 = jnp.zeros_like(a) + jnp.eye(n, dtype=dtype)[..., None]

    if n % 2 == 0:
        return _leigh_parallel(a, v0, sweeps)

    def one_sweep(_, av):
        a, v = av
        for p in range(n - 1):
            for q in range(p + 1, n):
                app, aqq, apq = a[p, p], a[q, q], a[p, q]
                small = jnp.abs(apq) <= eps * jnp.maximum(
                    jnp.abs(app) + jnp.abs(aqq), eps
                )
                tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
                sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
                t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(small, 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                # rows p, q of A
                rp, rq = a[p], a[q]
                a = a.at[p].set(c * rp - s * rq).at[q].set(s * rp + c * rq)
                # cols p, q of A
                cp, cq = a[:, p], a[:, q]
                a = (
                    a.at[:, p].set(c * cp - s * cq)
                    .at[:, q].set(s * cp + c * cq)
                )
                # accumulate V (columns rotate like cols of A)
                vp, vq = v[:, p], v[:, q]
                v = (
                    v.at[:, p].set(c * vp - s * vq)
                    .at[:, q].set(s * vp + c * vq)
                )
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps, one_sweep, (a, v0))
    w = jnp.stack([a[i, i] for i in range(n)], axis=0)   # [n, B]
    return _sort_ascending(w, v)
