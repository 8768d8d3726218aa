"""Pallas kernel vs XLA-fallback equivalence (interpret mode on CPU).

The TPU kernels must match their lax.scan/lane fallbacks bit-for-bit-ish;
interpret=True runs the same kernel logic through the Pallas interpreter so
the equivalence is testable without TPU hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.pallas.blocktri import block_thomas, block_thomas_rt
from sbdart_tpu.solver.bvp import assemble_blocks, block_thomas_scan


@pytest.mark.parametrize(
    "nlyr,m,b",
    [(33, 4, 300), (5, 8, 128), (2, 2, 700), (65, 16, 130)],
)
def test_block_thomas_matches_scan(nlyr, m, b):
    rng = np.random.default_rng(11)
    diag = rng.normal(size=(nlyr, m, m, b)) + 4.0 * np.eye(m)[None, :, :, None]
    lower = rng.normal(size=(nlyr, m, m, b)) * 0.3
    upper = rng.normal(size=(nlyr, m, m, b)) * 0.3
    rhs = rng.normal(size=(nlyr, m, b))
    args = [jnp.asarray(x, jnp.float32) for x in (diag, lower, upper, rhs)]
    xs_k = np.asarray(block_thomas(*args, interpret=True))
    xs_s = np.asarray(block_thomas_scan(*args))
    assert np.allclose(xs_k, xs_s, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "nlyr,n,b",
    [(33, 2, 300), (5, 4, 128), (2, 2, 700), (65, 8, 130)],
)
def test_block_thomas_rt_matches_assembled_scan(nlyr, n, b):
    """Fused on-the-fly assembly == materialized SETMTX + scan."""
    rng = np.random.default_rng(7)
    # realistic-ish eigen quantities: gm diagonally dominant, gp smaller,
    # ee in (0, 1], refl a contraction
    gm = rng.normal(size=(nlyr, n, n, b)) * 0.3 + 2.0 * np.eye(n)[None, :, :, None]
    gp = rng.normal(size=(nlyr, n, n, b)) * 0.4
    ee = rng.uniform(0.05, 1.0, size=(nlyr, n, b))
    refl = rng.uniform(0.0, 0.3, size=(n, n, b))
    rhs = rng.normal(size=(nlyr, 2 * n, b))
    gp, gm, ee, refl, rhs = (
        jnp.asarray(x, jnp.float32) for x in (gp, gm, ee, refl, rhs)
    )
    xs_k = np.asarray(block_thomas_rt(gp, gm, ee, refl, rhs, interpret=True))
    diag, lower, upper = assemble_blocks(gp, gm, ee, refl)
    xs_s = np.asarray(block_thomas_scan(diag, lower, upper, rhs))
    assert np.allclose(xs_k, xs_s, rtol=1e-5, atol=1e-6), (
        np.abs(xs_k - xs_s).max()
    )


def test_block_thomas_needs_pivoting():
    # zero diagonal pivot in the first block forces a row exchange
    nlyr, m, b = 3, 4, 130
    rng = np.random.default_rng(5)
    diag = rng.normal(size=(nlyr, m, m, b))
    diag[0, 0, 0, :] = 0.0
    diag[0, 1, 0, :] = 3.0   # pivot row below
    lower = np.zeros((nlyr, m, m, b))
    upper = rng.normal(size=(nlyr, m, m, b)) * 0.1
    rhs = rng.normal(size=(nlyr, m, b))
    args = [jnp.asarray(x, jnp.float32) for x in (diag, lower, upper, rhs)]
    xs_k = np.asarray(block_thomas(*args, interpret=True))
    xs_s = np.asarray(block_thomas_scan(*args))
    assert np.isfinite(xs_k).all()
    assert np.allclose(xs_k, xs_s, rtol=1e-4, atol=1e-5)
