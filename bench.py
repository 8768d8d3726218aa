"""Benchmark: spectral band-columns per second per chip.

Runs the flux-mode discrete-ordinates solve (the framework's hot path —
the equivalent of SBDART's DISORT call, which dominates its runtime; see
SURVEY.md section 4.2) on one chip, batched over (band-columns x 3 k-terms),
nstr=4, 33 layers — the shape of BASELINE configs 1/5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is a documented estimate of serial Fortran SBDART throughput on
one CPU core (~2000 band-columns/s for nstr=4, ~33 layers — "a broadband
run of ~10^3-10^4 DISORT calls takes seconds", SURVEY.md section 7).
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

FORTRAN_EST_BAND_COLS_PER_SEC = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sbdart_tpu.solver.disort import solve_rte

    nlyr, nstr, nk = 33, 4, 3
    nbc = 16384            # band-columns per launch
    rng = np.random.default_rng(0)
    dtype = jnp.float32

    shape = (nbc, nk, nlyr)
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, shape), dtype)
    ssalb = jnp.asarray(rng.uniform(0.05, 0.999, shape), dtype)
    g = rng.uniform(0.0, 0.85, (nbc, 1, nlyr))
    pmom = jnp.asarray(
        np.broadcast_to(
            g[..., None] ** np.arange(nstr + 1), shape + (nstr + 1,)
        ),
        dtype,
    )
    fbeam = jnp.ones((nbc, 1), dtype)
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (nbc, 1)), dtype)
    albedo = jnp.asarray(rng.uniform(0.0, 0.8, (nbc, 1)), dtype)

    fn = jax.jit(functools.partial(
        solve_rte, nstr=nstr, onlyfl=True, dtype=dtype
    ))

    out = fn(dtau, ssalb, pmom, fbeam=fbeam, umu0=umu0, albedo=albedo)
    jax.block_until_ready(out)
    flup = np.asarray(out.flup)
    assert np.isfinite(flup).all(), "bench outputs not finite — no timing"
    assert flup.max() > 0.0

    # Sustained throughput: chain K solves inside one executable (as the
    # production spectral pipeline does) so the per-dispatch host-sync RTT
    # of the tunneled chip (~25 ms) is amortized out of the measurement.
    K = 8

    @jax.jit
    def chained(dtau, ssalb, pmom, fbeam, umu0, albedo):
        def body(acc, _):
            o = solve_rte(
                dtau * (1.0 + 1e-6 * acc[0, 0]), ssalb, pmom, nstr=nstr,
                fbeam=fbeam, umu0=umu0, albedo=albedo, onlyfl=True,
                dtype=dtype,
            )
            return o.flup[..., :1], ()
        acc, _ = jax.lax.scan(
            body, jnp.zeros((nbc, nk, 1), dtype), None, length=K
        )
        return acc

    r = chained(dtau, ssalb, pmom, fbeam, umu0, albedo)
    jax.block_until_ready(r)
    np.asarray(np.asarray(r).ravel()[:1])  # realize the stream (axon defers)
    n_iter = 4
    t0 = time.perf_counter()
    for _ in range(n_iter):
        jax.block_until_ready(chained(dtau, ssalb, pmom, fbeam, umu0, albedo))
    dt = time.perf_counter() - t0
    rate = nbc * n_iter * K / dt

    print(json.dumps({
        "metric": "band_columns_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "band-columns/s (nstr=4, nlyr=33, 3 k-terms, f32)",
        "vs_baseline": round(rate / FORTRAN_EST_BAND_COLS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
