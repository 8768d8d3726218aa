"""The weak-scaling harness must run end-to-end (BASELINE scaling metric).

Launches real subprocesses (1 and 2 jax.distributed processes, one CPU
device each) through benchmarks/weak_scaling.py and checks the JSON it
writes.  Efficiency numbers on a shared CI host are not asserted — only
that the multihost measurement path works.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "weak_scaling.py")


@pytest.mark.slow
def test_weak_scaling_harness_runs(tmp_path):
    out = tmp_path / "ws.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # workers set their own device count
    r = subprocess.run(
        [sys.executable, SCRIPT, "--procs", "1,2", "--cols", "8",
         "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(out.read_text())
    rates = payload["rates_band_columns_per_sec"]
    assert set(rates) == {"1", "2"} or set(rates) == {1, 2}
    assert all(v > 0 for v in rates.values())
    assert "efficiency_vs_linear" in payload
