"""Pallas kernel vs XLA-fallback equivalence (interpret mode on CPU).

The TPU kernels must match their lax.scan/lane fallbacks bit-for-bit-ish;
interpret=True runs the same kernel logic through the Pallas interpreter so
the equivalence is testable without TPU hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.pallas.blocktri import block_thomas
from sbdart_tpu.solver.bvp import block_thomas_scan


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
