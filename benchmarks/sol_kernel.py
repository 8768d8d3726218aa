"""%SOL (speed-of-light) roofline for the solver hot kernels.

The block-Thomas BVP kernel (pallas/blocktri.py) is bandwidth-bound: its
speed of light is HBM traffic / peak bandwidth.  This bench measures achieved
bandwidth against the chip peak and prints the %SOL the BASELINE.json north
star asks for ("eigensolve+solve %SOL").

Usage: python benchmarks/sol_kernel.py [B] [nstr] [nlyr]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

# v5e (TPU v5 lite): ~819 GB/s HBM BW, ~197 TFLOP/s bf16 / ~98 f32-ish MXU.
HBM_PEAK_GBS = {"v5 lite": 819.0, "v5litepod": 819.0, "v4": 1228.0}
DEFAULT_PEAK = 819.0


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    nstr = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nlyr = int(sys.argv[3]) if len(sys.argv) > 3 else 33

    import jax
    import jax.numpy as jnp

    from sbdart_tpu.pallas.blocktri import block_thomas
    from sbdart_tpu.solver.bvp import block_thomas_scan

    np.asarray(jnp.ones((8,)) + 1)  # realize the dispatch stream (axon)

    m = nstr  # block size 2N = nstr
    rng = np.random.default_rng(0)
    diag = jnp.asarray(
        rng.normal(size=(nlyr, m, m, b)) + 4 * np.eye(m)[None, :, :, None],
        jnp.float32,
    )
    lower = jnp.asarray(rng.normal(size=(nlyr, m, m, b)) * 0.3, jnp.float32)
    upper = jnp.asarray(rng.normal(size=(nlyr, m, m, b)) * 0.3, jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(nlyr, m, b)), jnp.float32)

    device = jax.devices()[0]
    peak = DEFAULT_PEAK
    for k, v in HBM_PEAK_GBS.items():
        if k in str(device).lower():
            peak = v

    # Chain K invocations inside one jit so the per-call cost is resolvable
    # above the host-sync floor of the tunneled chip (~25 ms per dispatch).
    K = 16

    def chain(solver):
        @jax.jit
        def run(d, lo, u, rhs0):
            def body(r, _):
                xs = solver(d, lo, u, r)
                return xs, ()
            out, _ = jax.lax.scan(body, rhs0, None, length=K)
            return out
        return run

    def timeit(f, *a, n=4):
        r = f(*a)
        jax.block_until_ready(r)
        np.asarray(np.asarray(r).ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / n

    t_pallas = timeit(
        chain(lambda d, lo, u, r: block_thomas(d, lo, u, r)),
        diag, lower, upper, rhs,
    ) / K
    # the scan fallback is too slow to chain (and its double-nested scan
    # compiles for minutes); report it raw — it dwarfs the sync floor anyway
    scan_j = jax.jit(block_thomas_scan)
    t_scan = timeit(scan_j, diag, lower, upper, rhs, n=3)

    # minimal HBM traffic: read diag+lower+upper+rhs, write xs
    bytes_min = (3 * m * m + 2 * m) * nlyr * b * 4
    gbs = bytes_min / t_pallas / 1e9
    print(f"device: {device}  assumed HBM peak: {peak:.0f} GB/s")
    print(f"block_thomas pallas : {t_pallas*1e3:8.3f} ms/call (chained x{K})")
    print(f"block_thomas scan   : {t_scan*1e3:8.3f} ms/call (raw, incl sync)")
    print(f"min HBM traffic     : {bytes_min/1e6:8.1f} MB")
    print(f"achieved BW         : {gbs:8.1f} GB/s")
    print(f"%SOL (bandwidth)    : {100.0*gbs/peak:8.1f} %")


if __name__ == "__main__":
    main()
