"""Device mesh and sharding utilities.

The reference has NO parallelism (SURVEY.md section 3: one column, one
process; users script shell loops over INPUT files).  The TPU-native
replacement treats (column x solar-angle x band) as first-class sharded
axes on a `jax.sharding.Mesh`:

  * `data` axis — the flattened column/solar-angle batch (embarrassingly
    parallel, no collectives at all);
  * optional `band` axis — spectral band chunks; the ONLY collective in the
    whole framework is the `psum` of band-partial spectral integrals over
    this axis (BASELINE.json north star: "host-to-host collectives only at
    spectral flux integration").

Multi-host: call `init_distributed()` first (jax.distributed), then meshes
span all hosts' devices; the batch driver shards the global column axis.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host runs (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_band: int = 1, devices=None) -> Mesh:
    """Mesh over (band, data).  n_band=1 -> pure data parallelism."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n % n_band:
        raise ValueError(f"{n} devices not divisible by band axis {n_band}")
    grid = devices.reshape(n_band, n // n_band)
    return Mesh(grid, ("band", "data"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(a: np.ndarray, m: int, axis: int = 0):
    """Pad axis to a multiple of m (edge-replicate); returns (padded, n_orig)."""
    n = a.shape[axis]
    r = (-n) % m
    if r == 0:
        return a, n
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, r)
    return np.pad(a, pad, mode="edge"), n
