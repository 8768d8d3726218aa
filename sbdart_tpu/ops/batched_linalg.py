"""Batched dense linear algebra for many tiny matrices.

The DOM solver needs, per (batch, mode, layer):
  * a symmetric eigendecomposition of an (n x n) matrix, n = nstr/2
    (replaces disort.f:ASYMTX — our symmetrization makes the general
    eigenproblem symmetric, see solver/eig.py),
  * dense solves with (2n x 2n) matrices (replaces SGECO/SGESL in UPBEAM),
  * Cholesky of (n x n) SPD matrices (part of the symmetrization).

Batch sizes reach 10^5–10^7 while n <= 16, so the right TPU mapping is
"vectorize across the batch, unroll across n": every step below is a
VPU-friendly elementwise/broadcast op over the batch with python-level
(static) loops over the tiny matrix dimension.  `jnp.linalg.*` is kept as
the reference path (`method='xla'`) and for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Symmetric eigendecomposition: batched cyclic Jacobi
# --------------------------------------------------------------------------

def _one_hot(i: int, n: int, dtype) -> jnp.ndarray:
    v = jnp.zeros((n,), dtype=dtype)
    return v.at[i].set(1.0)


def jacobi_eigh(a: jnp.ndarray, sweeps: int = 10) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigendecomposition via cyclic Jacobi rotations.

    Args:
      a: [..., n, n] symmetric matrices (small n; the pivot loop is unrolled).
      sweeps: number of full cyclic sweeps (10 reaches f64 convergence for
        n <= 16 on well-scaled RT matrices; each sweep is quadratically
        convergent near the end).

    Returns:
      (w, v): eigenvalues [..., n] (ascending) and eigenvectors [..., n, n]
      with columns v[..., :, j] matching `jnp.linalg.eigh` conventions.
    """
    n = a.shape[-1]
    dtype = a.dtype
    if n == 1:
        return a[..., 0], jnp.ones_like(a)
    v = jnp.broadcast_to(jnp.eye(n, dtype=dtype), a.shape)
    eps = jnp.finfo(dtype).eps

    def one_sweep(_, av):
        a, v = av
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = a[..., p, p]
                aqq = a[..., q, q]
                apq = a[..., p, q]
                small = jnp.abs(apq) <= eps * jnp.maximum(
                    jnp.abs(app) + jnp.abs(aqq), eps
                )
                tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.sign(tau) == 0, 1.0 / (tau + jnp.sqrt(1.0 + tau * tau)), t)
                t = jnp.where(small, 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                # Rotate rows/cols p and q of A: A <- J^T A J
                rp = a[..., p, :]
                rq = a[..., q, :]
                nrp = c[..., None] * rp - s[..., None] * rq
                nrq = s[..., None] * rp + c[..., None] * rq
                ep = _one_hot(p, n, dtype)
                eq = _one_hot(q, n, dtype)
                a = (
                    a
                    + ep[:, None] * (nrp - rp)[..., None, :]
                    + eq[:, None] * (nrq - rq)[..., None, :]
                )
                cp = a[..., :, p]
                cq = a[..., :, q]
                ncp = c[..., None] * cp - s[..., None] * cq
                ncq = s[..., None] * cp + c[..., None] * cq
                a = (
                    a
                    + (ncp - cp)[..., :, None] * ep[None, :]
                    + (ncq - cq)[..., :, None] * eq[None, :]
                )
                # accumulate eigenvectors: V <- V J
                vp = v[..., :, p]
                vq = v[..., :, q]
                nvp = c[..., None] * vp - s[..., None] * vq
                nvq = s[..., None] * vp + c[..., None] * vq
                v = (
                    v
                    + (nvp - vp)[..., :, None] * ep[None, :]
                    + (nvq - vq)[..., :, None] * eq[None, :]
                )
        return a, v

    # sweeps as a fori_loop: one sweep's rotations are unrolled (static
    # pivot order), the sweep repetition is not — 10x smaller XLA graph.
    a, v = jax.lax.fori_loop(0, sweeps, one_sweep, (a, v))

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


def eigh_small(a: jnp.ndarray, method: str = "auto") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigendecomposition with backend selection.

    method: 'xla' (jnp.linalg.eigh), 'lane' (lane-layout closed-form/Jacobi —
    the TPU fast path for n <= 16; see ops/lane.py), 'jacobi' (legacy
    batch-major Jacobi), or 'auto'.
    """
    from sbdart_tpu.ops import lane

    n = a.shape[-1]
    if method == "auto":
        from sbdart_tpu.dtypes import on_tpu as _on_tpu

        method = "lane" if (_on_tpu() and n <= 16) else "xla"
    if method == "lane":
        al, batch_shape = lane.to_lane(a)
        w, v = lane.leigh(al)
        return (
            lane.from_lane(w, batch_shape),
            lane.from_lane(v, batch_shape),
        )
    if method == "jacobi":
        return jacobi_eigh(a)
    return jnp.linalg.eigh(a)


# --------------------------------------------------------------------------
# Batched dense solve: Gaussian elimination with partial pivoting, unrolled
# --------------------------------------------------------------------------

def gauss_solve(a: jnp.ndarray, b: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """Solve a @ x = b for batched small a: [..., n, n], b: [..., n, m].

    method 'lane' relayouts to matrix-dims-leading and runs partial-pivoted
    GE as pure vector code (the TPU fast path; see ops/lane.py); 'unrolled'
    is the legacy batch-major elimination; 'xla' defers to jnp.linalg.solve.
    Replaces disutil.f:SGECO/SGESL usage in UPBEAM.
    """
    from sbdart_tpu.ops import lane

    n = a.shape[-1]
    if method == "auto":
        from sbdart_tpu.dtypes import on_tpu as _on_tpu

        method = "lane" if (_on_tpu() and n <= 48) else "xla"
    if method == "lane":
        al, batch_shape = lane.to_lane(a)
        bl, _ = lane.to_lane(b)
        return lane.from_lane(lane.lsolve(al, bl), batch_shape)
    if method == "xla":
        return jnp.linalg.solve(a, b)

    dtype = a.dtype
    m = b.shape[-1]
    aug = jnp.concatenate([a, b.astype(dtype)], axis=-1)  # [..., n, n+m]

    for k in range(n):
        col = jnp.abs(aug[..., :, k])
        if k > 0:
            mask = jnp.arange(n) >= k
            col = jnp.where(mask, col, -jnp.inf)
        piv = jnp.argmax(col, axis=-1)                      # [...]
        e_piv = jax.nn.one_hot(piv, n, dtype=dtype)          # [..., n]
        row_k = aug[..., k, :]                               # [..., n+m]
        row_p = jnp.einsum("...n,...nm->...m", e_piv, aug)
        e_k = _one_hot(k, n, dtype)
        aug = (
            aug
            + e_k[:, None] * (row_p - row_k)[..., None, :]
            + e_piv[..., :, None] * (row_k - row_p)[..., None, :]
        )
        pivval = aug[..., k, k]
        inv = 1.0 / pivval
        factor = aug[..., :, k] * inv[..., None]             # [..., n]
        below = (jnp.arange(n) > k).astype(dtype)
        factor = factor * below
        aug = aug - factor[..., :, None] * aug[..., k, :][..., None, :]

    # back substitution
    x = jnp.zeros(b.shape[:-2] + (n, m), dtype=dtype)
    for k in reversed(range(n)):
        rhs = aug[..., k, n:]
        if k < n - 1:
            rhs = rhs - jnp.einsum("...j,...jm->...m", aug[..., k, k + 1:n], x[..., k + 1:, :])
        xk = rhs / aug[..., k, k][..., None]
        x = x.at[..., k, :].set(xk)
    return x


# --------------------------------------------------------------------------
# Batched Cholesky, unrolled
# --------------------------------------------------------------------------

def cholesky_small(a: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """Lower Cholesky factor of batched SPD [..., n, n] matrices."""
    from sbdart_tpu.ops import lane

    n = a.shape[-1]
    if method == "auto":
        from sbdart_tpu.dtypes import on_tpu as _on_tpu

        method = "lane" if (_on_tpu() and n <= 32) else "xla"
    if method == "lane":
        al, batch_shape = lane.to_lane(a)
        return lane.from_lane(lane.lcholesky(al), batch_shape)
    if method == "xla":
        return jnp.linalg.cholesky(a)
    dtype = a.dtype
    l = jnp.zeros_like(a)
    for j in range(n):
        if j > 0:
            s = jnp.einsum("...k,...k->...", l[..., j, :j], l[..., j, :j])
        else:
            s = jnp.zeros(a.shape[:-2], dtype=dtype)
        d = jnp.sqrt(a[..., j, j] - s)
        l = l.at[..., j, j].set(d)
        if j + 1 < n:
            if j > 0:
                s2 = jnp.einsum("...ik,...k->...i", l[..., j + 1:, :j], l[..., j, :j])
            else:
                s2 = jnp.zeros(a.shape[:-2] + (n - j - 1,), dtype=dtype)
            l = l.at[..., j + 1:, j].set((a[..., j + 1:, j] - s2) / d[..., None])
    return l
