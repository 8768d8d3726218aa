"""sbdart_tpu — a TPU-native plane-parallel radiative-transfer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SBDART
(Santa Barbara DISORT Atmospheric Radiative Transfer; Ricchiazzi et al. 1998,
BAMS 79, 2101-2114): atmospheric profiles, LOWTRAN7-style gas k-distribution,
cloud/aerosol Mie optics, and a DISORT-class discrete-ordinates solver —
all batched from day one over (band x k x column x solar-angle) and sharded
over a TPU mesh with `shard_map`.

Architecture (see SURVEY.md section 8 for the blueprint):
  - solver/   discrete-ordinates core (quadrature, delta-M, symmetrized
              eigensolve, beam/thermal particular solutions, block-tridiagonal
              boundary-value solve, fluxes, user-angle radiances, TMS
              single-scatter correction).  Replaces disort.f:DISORT and its
              callees (SOLEIG/ASYMTX/UPBEAM/UPISOT/SETMTX/SOLVE0/FLUXES/
              USRINT/INTCOR) with batched, branchless TPU-friendly math.
  - data/     regenerated static tables (model atmospheres, gas band models,
              Mie optics, aerosol models, solar spectra, surface albedos).
  - ops/      batched small-matrix linear algebra (Jacobi eigh, Gaussian
              elimination) tuned for TPU; Pallas kernels where they win.
  - pipeline  the spectral loop: scan over band chunks, vmap over columns,
              k-weighted accumulation of fluxes/radiances.
  - sharding  device-mesh utilities (column/band sharding, psum at spectral
              integration only).

The public configuration surface mirrors SBDART's &INPUT namelist
(sbdart.f namelist &INPUT; ~75 parameters) so that existing INPUT files
load verbatim.
"""

from __future__ import annotations

import jax as _jax

# The solver core needs f64 available (the eigensolve/BVP chain at nstr>=16
# loses too much precision in pure f32; reference DISORT is f32 Fortran but
# accumulates differently).  Arrays are explicitly dtyped throughout, so
# enabling x64 globally does not force f64 on the hot path — the TPU path
# runs f32 by default (see sbdart_tpu.dtypes).
_jax.config.update("jax_enable_x64", True)

# TPU MXU matmuls default to bfloat16 passes; the solver's small-matrix
# algebra (symmetrized eigensolve, Cholesky, BVP blocks) cancels to ~1e-5
# of the operand scale, which bf16 noise (~1e-3) destroys — near-singular
# Cholesky blocks and NaN eigenvectors.  Full f32 matmul precision costs
# little here (tiny matrices; the hot path is VPU-bound) and restores the
# f32 accuracy budget.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

from sbdart_tpu.config import Config  # noqa: E402
from sbdart_tpu.namelist import load_namelist, loads_namelist  # noqa: E402
from sbdart_tpu.api import run, run_spectrum  # noqa: E402

__all__ = [
    "Config",
    "load_namelist",
    "loads_namelist",
    "run",
    "run_spectrum",
    "__version__",
]
