"""Lane-resident radiance path (solver/radlane.py) vs the generic path.

The radiance fast path routes ALL Fourier modes through the fused eig+beam
and block-Thomas Pallas kernels in one lane layout (disort.f USRINT/CMPINT
per-mode accumulation — SURVEY.md section 3.2 step 6).  These tests pin its
equivalence to the generic batch-major path in interpret mode (runs
everywhere); the TPU-gated sibling compiles the real kernels at an
unaligned batch size (the round-2 Mosaic trap shape).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sbdart_tpu.solver.disort import solve_rte

FIELDS = ("rfldir", "rfldn", "flup", "dfdt", "uavg", "uu")


def _radiance_problem(nstr, nlyr, nbc, planck=False, beam=True, seed=1):
    rng = np.random.default_rng(seed)
    dtype = jnp.float32
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, (nbc, nlyr)), dtype)
    ssalb = jnp.asarray(rng.uniform(0.05, 0.999, (nbc, nlyr)), dtype)
    g = rng.uniform(0.0, 0.85, (nbc, nlyr))
    pmom = jnp.asarray(g[..., None] ** np.arange(nstr + 1), dtype)
    fbeam = jnp.asarray(
        np.where(rng.uniform(size=nbc) < 0.8, 1.0, 0.0)
        * (1.0 if beam else 0.0), dtype
    )
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (nbc,)), dtype)
    albedo = jnp.asarray(rng.uniform(0.0, 0.8, (nbc,)), dtype)
    umu = np.array([0.35, 0.95, -0.5, -0.9])
    phi = np.array([0.0, 120.0, 240.0])
    # fisot > 0 keeps the beamless case nontrivial (isotropic top boundary)
    kw = dict(nstr=nstr, fbeam=fbeam, umu0=umu0, albedo=albedo,
              onlyfl=False, umu=umu, phi=phi, dtype=dtype, phi0=10.0,
              fisot=0.2)
    if planck:
        temper = jnp.asarray(
            np.linspace(250, 290, nlyr + 1)[None].repeat(nbc, 0), dtype
        )
        kw.update(planck=True, temper=temper, wvnlo=800.0, wvnhi=900.0,
                  btemp=290.0, temis=0.1, ttemp=210.0)
    return (dtau, ssalb, pmom), kw


def _compare(o_a, o_b, tol):
    for nm in FIELDS:
        a = np.asarray(getattr(o_a, nm))
        b = np.asarray(getattr(o_b, nm))
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert err < tol, (nm, err)


@pytest.mark.parametrize(
    "nstr,planck,beam",
    [(4, False, True), (4, True, True), (16, False, True),
     (16, True, True), (8, False, False)],
)
def test_radlane_matches_generic(nstr, planck, beam):
    """Interpret-mode lane radiance == generic path: solar, thermal,
    beamless-isotropic, and both kernel specializations (n=2 closed form,
    n=8 Jacobi).  Small shapes — the Pallas interpreter is ~10^3x slower
    than compiled and this check pins MATH equivalence only."""
    args, kw = _radiance_problem(nstr, 6, 8, planck=planck, beam=beam)
    o_lan = solve_rte(*args, eig_method="fused_interpret", **kw)
    o_gen = solve_rte(*args, eig_method="lane", **kw)
    _compare(o_lan, o_gen, 5e-4)


def test_radlane_corint_off_matches_generic():
    """corint=False (no TMS/IMS) exercises the pure Fourier-sum output."""
    args, kw = _radiance_problem(16, 5, 4)
    o_lan = solve_rte(*args, eig_method="fused_interpret", corint=False, **kw)
    o_gen = solve_rte(*args, eig_method="lane", corint=False, **kw)
    _compare(o_lan, o_gen, 5e-4)


def test_radlane_upward_only_angles():
    """umu all positive: the downward scan branch is absent (static)."""
    args, kw = _radiance_problem(4, 5, 4)
    kw["umu"] = np.array([0.4, 0.8])
    o_lan = solve_rte(*args, eig_method="fused_interpret", **kw)
    o_gen = solve_rte(*args, eig_method="lane", **kw)
    _compare(o_lan, o_gen, 5e-4)


@pytest.mark.tpu
@pytest.mark.parametrize("nbc", [130, 256])
def test_radlane_compiled_on_tpu(nbc):
    """Mosaic-compiled lane radiance path vs generic on real hardware, at
    an unaligned batch (130: pads inside the kernels) and an aligned one."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    args, kw = _radiance_problem(16, 65, nbc)
    o_lan = solve_rte(*args, eig_method="fused", **kw)
    o_gen = solve_rte(*args, eig_method="lane", **kw)
    # two backward-stable f32 paths with different accumulation orders;
    # same bar as test_fused_eig_beam_compiled_on_tpu
    _compare(o_lan, o_gen, 3e-3)
