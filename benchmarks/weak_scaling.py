"""Weak-scaling harness: band-columns/s at 1/2/4/8 jax.distributed processes.

Measures the BASELINE.md scaling metric (weak-scaling efficiency, 1 chip ->
N hosts >= 80%) on whatever devices exist: each process gets one CPU device
(xla_force_host_platform_device_count=1) and a fixed per-process column
count, so ideal scaling is rate(N) = N * rate(1).  On a real pod slice the
same launcher runs one process per host with its local TPU chips.

NOTE on interpreting CPU numbers: this host oversubscribes N worker
processes onto a fixed core count, so measured CPU "efficiency" beyond the
core count is a lower bound on the communication efficiency — the metric
that matters is that the multihost path (jax.distributed + global mesh +
make_array_from_process_local_data + the single psum) runs and that the
per-process rate does not collapse.

Usage:
    python benchmarks/weak_scaling.py [--procs 1,2,4,8] [--cols 64]
        [--out benchmarks/weak_scaling.json]
    python benchmarks/weak_scaling.py --worker N PID PORT COLS OUT  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(nproc: int, pid: int, port: int, cols: int, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    import numpy as np

    from sbdart_tpu.batch import build_batch_fn
    from sbdart_tpu.config import Config
    from sbdart_tpu.sharding import make_mesh

    cfg = Config(idatm=2, wlinf=0.30, wlsup=0.70, wlinc=0.05, nstr=4)
    mesh = make_mesh(1)          # (band=1, data=all global devices)
    fn, meta = build_batch_fn(cfg, band_chunk=8, mesh=mesh)

    rng = np.random.default_rng(100 + pid)
    params = dict(
        csza=rng.uniform(0.2, 1.0, cols),
        gas_scale=rng.uniform(0.8, 1.2, cols),
        cld_scale=np.ones(cols),
        aer_scale=np.ones(cols),
        albedo_scale=np.ones(cols),
    )

    out = fn(params)             # compile + warm
    jax.block_until_ready(out)
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        jax.block_until_ready(fn(params))
    dt = time.perf_counter() - t0

    nwl = len(meta["wl"])
    global_cols = cols * nproc
    rate = global_cols * nwl * n_iter / dt     # band-columns/s, all processes
    if pid == 0:
        with open(out_path, "w") as fh:
            json.dump({"nproc": nproc, "band_columns_per_sec": rate}, fh)


def launch(nproc: int, cols: int, port: int, tmpdir: str) -> float:
    out_path = os.path.join(tmpdir, f"ws_{nproc}.json")
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(nproc), str(pid), str(port), str(cols), out_path],
            cwd=REPO,
        ))
    rc = [p.wait(timeout=1200) for p in procs]
    if any(rc):
        raise RuntimeError(f"worker failed: rc={rc}")
    with open(out_path) as fh:
        return json.load(fh)["band_columns_per_sec"]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        n, pid, port, cols, out = sys.argv[2:7]
        worker(int(n), int(pid), int(port), int(cols), out)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8")
    ap.add_argument("--cols", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "weak_scaling.json"))
    args = ap.parse_args()
    import tempfile

    results = {}
    with tempfile.TemporaryDirectory() as td:
        for i, n in enumerate(int(x) for x in args.procs.split(",")):
            rate = launch(n, args.cols, port=12421 + 7 * i, tmpdir=td)
            results[n] = rate
            print(f"nproc={n}: {rate:.1f} band-columns/s", flush=True)

    base = min(results)
    eff = {
        n: results[n] / (results[base] * n / base) for n in results
    }
    payload = {
        "metric": "weak_scaling_efficiency",
        "rates_band_columns_per_sec": results,
        "efficiency_vs_linear": {str(n): round(e, 3) for n, e in eff.items()},
        "ncores_host": os.cpu_count(),
        "note": "CPU-device emulation; efficiencies beyond the host core "
                "count are lower bounds (oversubscription)",
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
