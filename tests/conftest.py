"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-chip sharding path
(mesh + shard_map) is exercised without TPU hardware, per the project's
multi-chip validation strategy.  Must set env before jax import.
"""

import os
import sys

# Force CPU: the harness exports JAX_PLATFORMS=axon (remote TPU compiles —
# per-op dispatch there is seconds each), so setdefault is not enough.
# SBDART_TPU_TESTS=1 opts out, letting the @pytest.mark.tpu tests run the
# non-interpret kernels on real hardware.
_ON_TPU = os.environ.get("SBDART_TPU_TESTS") == "1"
if _ON_TPU and os.environ.get("PYTEST_XDIST_WORKER"):
    raise RuntimeError(
        "TPU tests must run SERIALLY: two processes contend ~1000x on the "
        "single tunneled chip.  Re-run with `-n 0` (pyproject's default "
        "addopts add -n 2 for the CPU suite)."
    )
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _ON_TPU:
    # The axon plugin ignores the JAX_PLATFORMS env var; force via config too.
    jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (solver jits at many (nstr, nlyr) shapes).
# A persistent compilation cache makes warm reruns minutes faster; keyed by
# jaxlib version + flags, so it is safe across upgrades.
_CACHE_DIR = os.environ.get(
    "SBDART_TPU_TEST_CACHE", os.path.expanduser("~/.cache/sbdart_tpu_xla")
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

