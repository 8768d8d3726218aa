"""Per-kernel device timing via jax.profiler traces (the reliable method
through the axon tunnel — see docs/PERF.md "Timing rules").

Times the two production Pallas kernels in isolation at the bench shapes:

  eig+beam  (pallas/eig.py)      at the rad16 lane shape [8, 8, M*L*Bc]
  block-Thomas (pallas/blocktri) at the rad16 scan shape [65, 8, 8, M*Bc]
  both                            at the nstr=4 primary shape

Usage:  python benchmarks/kernel_trace.py [eig|bvp|all]
Prints one line per (kernel, shape): device ms summed over custom-call ops.
Run alone — never concurrently with another TPU process.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import _trace_device_ops


def _report(tag, fn, args):
    ops = _trace_device_ops(fn, args)
    krn = [o for o in ops if o["bytes"] > 0]
    tot = sum(o["dur_ms"] for o in ops if not o["name"].startswith("jit_"))
    k_ms = sum(o["dur_ms"] for o in krn)
    k_by = sum(o["bytes"] for o in krn)
    bw = k_by / (k_ms / 1e3) / 1e9 if k_ms else 0.0
    print(f"{tag:28s} total {tot:8.2f} ms  kernels {k_ms:8.2f} ms  "
          f"glue {tot - k_ms:7.2f} ms  kernel-bw {bw:6.1f} GB/s")
    for o in sorted(krn, key=lambda o: -o["dur_ms"])[:4]:
        print(f"    {o['dur_ms']:8.3f} ms  {o['bytes']/1e6:8.1f} MB  "
              f"{o['name'][:60]}")
    return tot, k_ms


def eig_case(n=8, lanes=16 * 65 * 256, K=8):
    from sbdart_tpu.pallas.eig import eig_beam_chain_lane_fused

    rng = np.random.default_rng(0)
    cpp = jnp.asarray(rng.uniform(-0.05, 0.1, (n, n, lanes)), jnp.float32)
    cpm = jnp.asarray(rng.uniform(-0.05, 0.1, (n, n, lanes)), jnp.float32)
    r1 = jnp.asarray(rng.standard_normal((n, lanes)), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal((n, lanes)), jnp.float32)
    mu0 = jnp.asarray(rng.uniform(0.2, 1.0, (1, lanes)), jnp.float32)
    mu = np.linspace(0.1, 0.95, n)
    w = np.full(n, 1.0 / n)

    @jax.jit
    def run(cpp, cpm, r1, r2, mu0):
        def body(acc, _):
            out = eig_beam_chain_lane_fused(
                cpp * (1 + 1e-6 * acc), cpm, r1, r2, mu0, mu, w
            )
            return acc + out[0][0, 0] * 1e-12, ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=K)
        return acc

    tot, k_ms = _report(f"eig+beam n={n} B={lanes}", run,
                        (cpp, cpm, r1, r2, mu0))
    print(f"    per-call kernel: {k_ms / K:.3f} ms")


def bvp_case(nlyr=65, n=8, b=16 * 256, K=8):
    from sbdart_tpu.pallas.blocktri import block_thomas_rt

    rng = np.random.default_rng(1)
    gm = jnp.asarray(
        rng.normal(size=(nlyr, n, n, b)) * 0.15
        + 2 * np.eye(n)[None, :, :, None], jnp.float32)
    gp = jnp.asarray(rng.normal(size=(nlyr, n, n, b)) * 0.15, jnp.float32)
    ee = jnp.asarray(rng.uniform(0.05, 0.8, (nlyr, n, b)), jnp.float32)
    refl = jnp.asarray(rng.uniform(0, 0.2, (n, n, b)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(nlyr, 2 * n, b)), jnp.float32)

    @jax.jit
    def run(gp, gm, ee, refl, rhs):
        def body(r, _):
            xs = block_thomas_rt(gp, gm, ee, refl, rhs * (1 + 1e-6 * r[0, 0]))
            return xs, ()
        out, _ = jax.lax.scan(body, rhs, None, length=K)
        return out

    tot, k_ms = _report(f"block-thomas L={nlyr} n={n} B={b}", run,
                        (gp, gm, ee, refl, rhs))
    print(f"    per-call kernel: {k_ms / K:.3f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("eig", "all"):
        eig_case()
        eig_case(n=2, lanes=33 * 49152, K=8)
    if which in ("bvp", "all"):
        bvp_case()
        bvp_case(nlyr=33, n=2, b=49152, K=8)
