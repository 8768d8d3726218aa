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
    [
        # fast gate: the two extreme corners (n=2 closed-form solar-only,
        # n=8 Jacobi + thermal); the rest run in the full (slow) suite
        (4, False, True),
        (16, True, True),
        pytest.param(4, True, True, marks=pytest.mark.slow),
        pytest.param(16, False, True, marks=pytest.mark.slow),
        pytest.param(8, False, False, marks=pytest.mark.slow),
    ],
)
def test_radlane_matches_generic(nstr, planck, beam):
    """Interpret-mode lane radiance == generic path: solar, thermal,
    beamless-isotropic, and both kernel specializations (n=2 closed form,
    n=8 Jacobi).  Small shapes — the Pallas interpreter is ~10^3x slower
    than compiled and this check pins MATH equivalence only."""
    args, kw = _radiance_problem(nstr, 5, 3, planck=planck, beam=beam)
    o_lan = solve_rte(*args, eig_method="fused_interpret", **kw)
    o_gen = solve_rte(*args, eig_method="lane", **kw)
    _compare(o_lan, o_gen, 5e-4)


@pytest.mark.parametrize("planck", [False, pytest.param(True,
                                                        marks=pytest.mark.slow)])
def test_radlane_brdf_matches_generic(planck):
    """BRDF (lamber=.false.) radiance through the lane path == generic
    path: per-mode Fourier reflection matrices in the BVP plus the
    azimuth-folded surface radiance start (round 5 — previously BRDF
    radiance silently fell back to the ~5x-slower generic path)."""
    from sbdart_tpu.solver.brdf import HapkeBrdf

    args, kw = _radiance_problem(8, 4, 2, planck=planck)
    brdf = HapkeBrdf(b0=1.0, hh=0.06, w=0.6)
    o_lan = solve_rte(*args, eig_method="fused_interpret", brdf=brdf, **kw)
    o_gen = solve_rte(*args, eig_method="lane", brdf=brdf, **kw)
    _compare(o_lan, o_gen, 5e-4)


def test_radlane_corint_off_matches_generic():
    """corint=False (no TMS/IMS) exercises the pure Fourier-sum output."""
    args, kw = _radiance_problem(16, 4, 2)
    o_lan = solve_rte(*args, eig_method="fused_interpret", corint=False, **kw)
    o_gen = solve_rte(*args, eig_method="lane", corint=False, **kw)
    _compare(o_lan, o_gen, 5e-4)


def test_radlane_upward_only_angles():
    """umu all positive: the downward scan branch is absent (static)."""
    args, kw = _radiance_problem(4, 4, 2)
    kw["umu"] = np.array([0.4, 0.8])
    o_lan = solve_rte(*args, eig_method="fused_interpret", **kw)
    o_gen = solve_rte(*args, eig_method="lane", **kw)
    _compare(o_lan, o_gen, 5e-4)


@pytest.mark.tpu
def test_radlane_compiled_on_tpu_vs_generic():
    """Mosaic-compiled lane radiance path vs the generic path on real
    hardware.  nstr=8/33 layers: the generic lane path's nstr=16/65-layer
    compile alone takes ~10 minutes on the tunneled chip, so the
    cross-path check runs at a smaller shape (same kernels, same
    specializations: n=4 even, streamed BVP) and the production shape is
    covered by the padding-consistency test below plus the interpret-mode
    equivalence suite."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    args, kw = _radiance_problem(8, 33, 128)
    o_lan = solve_rte(*args, eig_method="fused", **kw)
    o_gen = solve_rte(*args, eig_method="lane", **kw)
    # two backward-stable f32 paths with different accumulation orders;
    # same bar as test_fused_eig_beam_compiled_on_tpu
    _compare(o_lan, o_gen, 3e-3)


@pytest.mark.tpu
def test_radlane_compiled_lb_between_128_and_tile():
    """LB = nlyr*bc in (128, 512) and NOT a multiple of 128 (32 layers x 9
    band-columns = 288): the radsrc lane-tile selection used to pick
    tb = LB itself (unaligned) and fail Mosaic compilation.  Compiling and
    matching the aligned-batch slice pins the fix (round-4 advisor item)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    args16, kw = _radiance_problem(8, 32, 16)      # LB = 512 (aligned)
    o16 = solve_rte(*args16, eig_method="fused", **kw)
    args9 = tuple(a[:9] for a in args16)           # LB = 288 (the trap)
    kw9 = dict(kw)
    for k in ("fbeam", "umu0", "albedo"):
        kw9[k] = kw[k][:9]
    o9 = solve_rte(*args9, eig_method="fused", **kw9)
    for nm in FIELDS:
        a = np.asarray(getattr(o9, nm))
        b = np.asarray(getattr(o16, nm))[:9]
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        # a few-ulp bar, not 1e-6: the two batch widths compile different
        # XLA fusion shapes for the glue reductions, so accumulation
        # order differs (measured 2.1e-6 on rfldn) — a real padding bug
        # (lanes bleeding across columns) would be O(1)
        assert err < 5e-6, (nm, err)
        assert np.isfinite(a).all(), nm


@pytest.mark.tpu
def test_radlane_compiled_unaligned_batch_consistent():
    """Production shape (nstr=16, 65 layers) at an UNALIGNED batch (130 —
    the round-2 Mosaic tile trap): the compiled kernels pad lanes
    internally; the first 130 columns of an aligned-batch (256) solve must
    match the 130-column solve bit-for-bit-ish (same kernels, same math;
    only the padding differs)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    args256, kw = _radiance_problem(16, 65, 256)
    o256 = solve_rte(*args256, eig_method="fused", **kw)
    args130 = tuple(a[:130] for a in args256)
    kw130 = dict(kw)
    for k in ("fbeam", "umu0", "albedo"):
        kw130[k] = kw[k][:130]
    o130 = solve_rte(*args130, eig_method="fused", **kw130)
    for nm in FIELDS:
        a = np.asarray(getattr(o130, nm))
        b = np.asarray(getattr(o256, nm))[:130]
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert err < 1e-6, (nm, err)
        assert np.isfinite(a).all(), nm
