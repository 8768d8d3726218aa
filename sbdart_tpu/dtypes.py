"""Dtype policy.

The reference is single-precision Fortran (f77 REAL).  On TPU, f64 is
software-emulated and slow, while f32 (with f32 accumulation on the VPU and
MXU) is the native fast path.  Policy:

  - tests / CPU golden comparisons: float64 (beats the f32 Fortran reference
    on accuracy, so the rtol 1e-5 parity gate is comfortable),
  - TPU production runs: float32 by default (the lane-eig + fused-kernel
    f32 path is validated end-to-end against the f64 XLA path in
    tests/test_f32_path.py::test_f32_production_path_matches_f64),
  - overridable via `SBDART_TPU_DTYPE=float32|float64` or per-call.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def default_dtype() -> jnp.dtype:
    env = os.environ.get("SBDART_TPU_DTYPE")
    if env:
        return jnp.dtype(env)
    platform = jax.default_backend()
    if platform in ("cpu",):
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)


def on_tpu() -> bool:
    """True when the default backend executes on TPU hardware.

    Some PJRT plugins report a platform alias rather than 'tpu' (the
    tunneled-TPU plugin used in CI reports 'axon'); both lower the Mosaic
    kernel paths.  Every dispatch site gates on this one predicate so the
    alias list lives in exactly one place.
    """
    return jax.default_backend() in ("tpu", "axon")


def finfo_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)
