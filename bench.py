"""Benchmark: spectral band-columns per second per chip (+ kernel rooflines).

Primary metric: flux-mode discrete-ordinates solves (the framework's hot
path — the equivalent of SBDART's DISORT call, which dominates its runtime;
see SURVEY.md section 4.2) on one chip, batched over (band-columns x 3
k-terms), nstr=4, 33 layers — the shape of BASELINE configs 1/5.

Extras (BASELINE.json named metrics, recorded in the same JSON line):
  nstr16_nlyr65_bc_per_s  throughput at the BASELINE config-3/4 shape
                          (nstr=16, 65 layers, flux mode)
  bvp_fused_sol_pct       bandwidth %SOL of the FUSED production BVP kernel
                          (pallas/blocktri.py:block_thomas_rt — assembles
                          SETMTX blocks on the fly; min traffic = eigen
                          quantities in + solution out)
  eig_lane_sol_pct        FLOP-model %SOL of the lane eigensolve stage
                          (ops/lane.py leigh chain) against the VPU f32 peak

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extras"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is the BUILDER'S OWN ESTIMATE of serial Fortran SBDART
throughput on one CPU core (~2000 band-columns/s for nstr=4, ~33 layers —
"a broadband run of ~10^3-10^4 DISORT calls takes seconds", SURVEY.md
section 7) — treat the ratio as an order-of-magnitude indicator only.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

FORTRAN_EST_BAND_COLS_PER_SEC = 2000.0

# v5e (TPU v5 lite): ~819 GB/s HBM; VPU f32 ~ 8x128x4 ALUs @ ~0.94 GHz.
HBM_PEAK_GBS = {"v5 lite": 819.0, "v5litepod": 819.0, "v4": 1228.0}
DEFAULT_HBM_GBS = 819.0
VPU_F32_TFLOPS = 3.85


def _timeit(fn, *args, n=4):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(np.asarray(jax.tree.leaves(r)[0]).ravel()[:1])  # axon defers
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def _throughput(nstr: int, nlyr: int, nbc: int, K: int = 8) -> float:
    """Chained flux solves; returns band-columns/s (x nk k-terms inside)."""
    import jax
    import jax.numpy as jnp

    from sbdart_tpu.solver.disort import solve_rte

    nk = 3
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    shape = (nbc, nk, nlyr)
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, shape), dtype)
    ssalb = jnp.asarray(rng.uniform(0.05, 0.999, shape), dtype)
    g = rng.uniform(0.0, 0.85, (nbc, 1, nlyr))
    pmom = jnp.asarray(
        np.broadcast_to(g[..., None] ** np.arange(nstr + 1), shape + (nstr + 1,)),
        dtype,
    )
    fbeam = jnp.ones((nbc, 1), dtype)
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (nbc, 1)), dtype)
    albedo = jnp.asarray(rng.uniform(0.0, 0.8, (nbc, 1)), dtype)

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

    out = chained(dtau, ssalb, pmom, fbeam, umu0, albedo)
    flup = np.asarray(out)
    assert np.isfinite(flup).all(), "bench outputs not finite — no timing"
    t = _timeit(chained, dtau, ssalb, pmom, fbeam, umu0, albedo)
    return nbc * K / t


def _bvp_fused_sol(nlyr=65, n=8, b=8192, K=16) -> float:
    """Bandwidth %SOL of the fused SETMTX+SOLVE0 kernel at the nstr=16 shape."""
    import jax
    import jax.numpy as jnp

    from sbdart_tpu.pallas.blocktri import block_thomas_rt

    if jax.default_backend() != "tpu":
        return float("nan")
    rng = np.random.default_rng(1)
    gm = jnp.asarray(
        rng.normal(size=(nlyr, n, n, b)) * 0.15 + 2 * np.eye(n)[None, :, :, None],
        jnp.float32,
    )
    gp = jnp.asarray(rng.normal(size=(nlyr, n, n, b)) * 0.15, jnp.float32)
    ee = jnp.asarray(rng.uniform(0.05, 0.8, (nlyr, n, b)), jnp.float32)
    refl = jnp.asarray(rng.uniform(0, 0.2, (n, n, b)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(nlyr, 2 * n, b)), jnp.float32)

    @jax.jit
    def chain(gp, gm, ee, refl, rhs):
        def body(r, _):
            xs = block_thomas_rt(gp, gm, ee, refl, rhs * (1 + 1e-6 * r[0, 0]))
            return xs, ()
        out, _ = jax.lax.scan(body, rhs, None, length=K)
        return out

    t = _timeit(chain, gp, gm, ee, refl, rhs) / K
    # min HBM traffic: gp+gm (2 n^2 L) + ee (n L) + rhs in / xs out (2n L each)
    # + refl (n^2), all x b x 4 bytes
    bytes_min = ((2 * n * n + n + 2 * n + 2 * n) * nlyr + n * n) * b * 4
    device = jax.devices()[0]
    peak = DEFAULT_HBM_GBS
    for k, v in HBM_PEAK_GBS.items():
        if k in str(device).lower():
            peak = v
    return 100.0 * (bytes_min / t / 1e9) / peak


def _eig_lane_sol(nlyr=65, nstr=16, b=2048, K=8) -> float:
    """FLOP-model %SOL of the PRODUCTION eigensolve vs the VPU f32 peak.

    Measures the auto-dispatched path (the fused Pallas kernel on TPU,
    pallas/eig.py).  FLOP model per (layer, mode) matrix of size
    n = nstr/2: Cholesky n^3/3, Jacobi DEFAULT_SWEEPS x n(n-1)/2 rotations
    x ~12n flops, triangular solve n^3, assembly matmuls ~4 n^3 — an
    analytic estimate, so the %SOL is an order-of-magnitude efficiency
    indicator, not a measured roofline.
    """
    import jax
    import jax.numpy as jnp

    from sbdart_tpu.pallas.eig import DEFAULT_SWEEPS
    from sbdart_tpu.solver.eig import angular_tables, solve_eigen

    if jax.default_backend() != "tpu":
        return float("nan")
    n = nstr // 2
    tab = angular_tables(nstr, 1)
    rng = np.random.default_rng(2)
    ssalb = jnp.asarray(rng.uniform(0.1, 0.999, (b, nlyr)), jnp.float32)
    gg = rng.uniform(0.0, 0.85, (b, nlyr))
    gl = jnp.asarray(gg[..., None] ** np.arange(nstr), jnp.float32)

    @jax.jit
    def chain(ssalb, gl):
        def body(acc, _):
            e = solve_eigen(
                ssalb * (1 + 1e-6 * acc), gl, tab, jnp.float32,
                eig_method="auto",
            )
            return jnp.mean(e.kk), ()
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=K)
        return out

    t = _timeit(chain, ssalb, gl) / K
    nmat = b * nlyr
    flops = nmat * (
        n**3 / 3.0
        + DEFAULT_SWEEPS * (n * (n - 1) / 2) * 12 * n
        + n**3 + 4 * n**3
    )
    return 100.0 * (flops / t / 1e12) / VPU_F32_TFLOPS


def _radiance_throughput(nstr=16, nlyr=65, nbc=256, K=3) -> float:
    """Full radiance solves (all Fourier modes + TMS/IMS) — the BASELINE
    config-4 shape: band-columns/s with a 5-zenith x 3-azimuth view grid."""
    import jax
    import jax.numpy as jnp

    from sbdart_tpu.solver.disort import solve_rte

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, (nbc, nlyr)), dtype)
    ssalb = jnp.asarray(rng.uniform(0.05, 0.999, (nbc, nlyr)), dtype)
    g = rng.uniform(0.0, 0.85, (nbc, nlyr))
    pmom = jnp.asarray(g[..., None] ** np.arange(65), dtype)
    fbeam = jnp.ones((nbc,), dtype)
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (nbc,)), dtype)
    albedo = jnp.asarray(rng.uniform(0.0, 0.8, (nbc,)), dtype)
    umu = np.array([0.2, 0.5, 0.9, -0.3, -0.8])
    phi = np.array([0.0, 90.0, 180.0])

    @jax.jit
    def run(dtau, ssalb, pmom):
        o = solve_rte(dtau, ssalb, pmom, nstr=nstr, fbeam=fbeam, umu0=umu0,
                      albedo=albedo, onlyfl=False, umu=umu, phi=phi,
                      dtype=dtype)
        return o.uu

    out = run(dtau, ssalb, pmom)
    assert np.isfinite(np.asarray(out)).all()
    t = _timeit(run, dtau, ssalb, pmom, n=K)
    return nbc / t


def main() -> None:
    import os

    rate4 = _throughput(nstr=4, nlyr=33, nbc=16384)
    rate16 = _throughput(nstr=16, nlyr=65, nbc=2048)
    rate_rad = _radiance_throughput()
    sol_bvp = _bvp_fused_sol()
    sol_eig = _eig_lane_sol()

    # weak-scaling efficiency from the committed measurement artifact
    # (benchmarks/weak_scaling.py writes it; BASELINE.md scaling row)
    ws_eff = None
    ws_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "weak_scaling.json")
    if os.path.exists(ws_path):
        with open(ws_path) as fh:
            ws = json.load(fh)
        ws_eff = ws.get("efficiency_vs_linear")

    print(json.dumps({
        "metric": "band_columns_per_sec_per_chip",
        "value": round(rate4, 1),
        "unit": "band-columns/s (nstr=4, nlyr=33, 3 k-terms, f32)",
        "vs_baseline": round(rate4 / FORTRAN_EST_BAND_COLS_PER_SEC, 2),
        "extras": {
            "baseline_note": "denominator 2000/s is the builder's own "
                             "estimate of serial Fortran (no published refs)",
            "nstr16_nlyr65_bc_per_s": round(rate16, 1),
            "nstr16_radiance_bc_per_s": round(rate_rad, 1),
            "bvp_fused_sol_pct": None if sol_bvp != sol_bvp else round(sol_bvp, 1),
            "eig_lane_sol_pct": None if sol_eig != sol_eig else round(sol_eig, 1),
            "weak_scaling_efficiency_cpu_mesh": ws_eff,
        },
    }))


if __name__ == "__main__":
    main()
