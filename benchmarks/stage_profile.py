"""Per-stage timing of the solver hot path on the current backend.

Times the eigensolve (SOLEIG/ASYMTX equiv), beam particular solution
(UPBEAM equiv), and the block-tridiagonal BVP (SETMTX/SOLVE0 equiv)
separately so optimization effort goes where the cycles are.

Usage: python benchmarks/stage_profile.py [nbc] [nstr] [nlyr]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    nbc = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    nstr = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nlyr = int(sys.argv[3]) if len(sys.argv) > 3 else 33
    dt = jnp.float32

    from sbdart_tpu.solver.deltam import apply_deltam
    from sbdart_tpu.solver.eig import angular_tables, solve_eigen
    from sbdart_tpu.solver.sources import beam_particular
    from sbdart_tpu.solver import bvp as bvp_mod
    from sbdart_tpu.solver.disort import solve_rte

    rng = np.random.default_rng(0)
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, (nbc, nlyr)), dt)
    ssalb = jnp.asarray(rng.uniform(0.05, 0.999, (nbc, nlyr)), dt)
    g = rng.uniform(0.0, 0.85, (nbc, nlyr))
    pmom = jnp.asarray(g[..., None] ** np.arange(nstr + 1), dt)
    fbeam = jnp.ones((nbc,), dt)
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (nbc,)), dt)
    albedo = jnp.asarray(rng.uniform(0.0, 0.8, (nbc,)), dt)
    tab = angular_tables(nstr, 1)

    @jax.jit
    def st_deltam(dtau, ssalb, pmom):
        dm = apply_deltam(dtau, ssalb, pmom, nstr)
        return dm.dtau, dm.ssalb, dm.gl

    @jax.jit
    def st_eig(ssalb_s, gl):
        e = solve_eigen(ssalb_s, gl, tab, dt)
        return e.kk, e.gp, e.gm, e.cpp, e.cpm

    @jax.jit
    def st_beam(cpp, cpm, ssalb_s, gl, fbeam, umu0):
        b = beam_particular(cpp, cpm, ssalb_s, gl, fbeam, umu0, tab, dt)
        return b.zp, b.zm

    @jax.jit
    def st_full(dtau, ssalb, pmom, fbeam, umu0, albedo):
        out = solve_rte(dtau, ssalb, pmom, nstr=nstr, fbeam=fbeam,
                        umu0=umu0, albedo=albedo, onlyfl=True, dtype=dt)
        return out.flup

    def timeit(f, *a, n=5):
        r = f(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / n

    dts, sss, gls = st_deltam(dtau, ssalb, pmom)
    kk, gp, gm, cpp, cpm = st_eig(sss, gls)

    t_dm = timeit(st_deltam, dtau, ssalb, pmom)
    t_eig = timeit(st_eig, sss, gls)
    t_beam = timeit(st_beam, cpp, cpm, sss, gls, fbeam, umu0)
    t_full = timeit(st_full, dtau, ssalb, pmom, fbeam, umu0, albedo)

    print(f"backend={jax.default_backend()} nbc={nbc} nstr={nstr} nlyr={nlyr}")
    print(f"deltam : {t_dm*1e3:8.2f} ms")
    print(f"eig    : {t_eig*1e3:8.2f} ms")
    print(f"beam   : {t_beam*1e3:8.2f} ms")
    print(f"full   : {t_full*1e3:8.2f} ms  "
          f"(bvp+fluxes ~ {max(t_full-t_dm-t_eig-t_beam,0)*1e3:.2f} ms)")
    print(f"throughput: {nbc/t_full/1e6:.2f} M solves/s")


if __name__ == "__main__":
    main()
