"""Pallas kernel vs XLA-fallback equivalence (interpret mode on CPU).

The TPU kernels must match their lax.scan/lane fallbacks bit-for-bit-ish;
interpret=True runs the same kernel logic through the Pallas interpreter so
the equivalence is testable without TPU hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sbdart_tpu.pallas.blocktri import block_thomas, block_thomas_rt
from sbdart_tpu.solver.bvp import assemble_blocks, block_thomas_scan


@pytest.mark.parametrize(
    "nlyr,m,b",
    [(33, 4, 300), (5, 8, 128), (2, 2, 700), (33, 8, 130)],
)
def test_block_thomas_matches_scan(nlyr, m, b):
    rng = np.random.default_rng(11)
    diag = rng.normal(size=(nlyr, m, m, b)) + 4.0 * np.eye(m)[None, :, :, None]
    lower = rng.normal(size=(nlyr, m, m, b)) * 0.3
    upper = rng.normal(size=(nlyr, m, m, b)) * 0.3
    rhs = rng.normal(size=(nlyr, m, b))
    args = [jnp.asarray(x, jnp.float32) for x in (diag, lower, upper, rhs)]
    xs_k = np.asarray(block_thomas(*args, interpret=True))
    xs_s = np.asarray(block_thomas_scan(*args))
    assert np.allclose(xs_k, xs_s, rtol=1e-5, atol=1e-6)


def _rt_problem(nlyr, n, b, *, coupling, seed=7):
    """Random eigen-quantity inputs for the fused RT solve.

    `coupling` scales the off-diagonal strength (gp) and the inter-layer
    transmission ceiling (max ee); small coupling keeps the global system
    condition number low enough that two correct f32 eliminations agree to
    ~eps, large coupling reproduces the near-conservative thick-cloud regime
    where the f32 forward-error floor cond(A)*eps dominates.
    """
    rng = np.random.default_rng(seed)
    gm = rng.normal(size=(nlyr, n, n, b)) * 0.3 + 2.0 * np.eye(n)[None, :, :, None]
    gp = rng.normal(size=(nlyr, n, n, b)) * coupling
    ee = rng.uniform(0.05, min(1.0, 2.0 * coupling), size=(nlyr, n, b))
    refl = rng.uniform(0.0, 0.3, size=(n, n, b))
    rhs = rng.normal(size=(nlyr, 2 * n, b))
    return gp, gm, ee, refl, rhs


@pytest.mark.parametrize(
    "nlyr,n,b,coupling",
    [(33, 2, 300, 0.4), (5, 4, 128, 0.4), (2, 2, 700, 0.4), (65, 8, 130, 0.15)],
)
def test_block_thomas_rt_matches_assembled_scan(nlyr, n, b, coupling):
    """Fused on-the-fly assembly == materialized SETMTX + scan.

    The (65, 8) case — the BASELINE nstr=16 shape — uses weak coupling so the
    system is well-conditioned enough for f32 paths to agree at 1e-6; the
    strong-coupling accuracy statement at that shape is
    test_block_thomas_rt_f32_forward_error_at_conditioning_floor below.
    """
    gp, gm, ee, refl, rhs = (
        jnp.asarray(x, jnp.float32)
        for x in _rt_problem(nlyr, n, b, coupling=coupling)
    )
    xs_k = np.asarray(block_thomas_rt(gp, gm, ee, refl, rhs, interpret=True))
    diag, lower, upper = assemble_blocks(gp, gm, ee, refl)
    xs_s = np.asarray(block_thomas_scan(diag, lower, upper, rhs))
    assert np.allclose(xs_k, xs_s, rtol=1e-5, atol=1e-6), (
        np.abs(xs_k - xs_s).max()
    )


def test_block_thomas_rt_f32_forward_error_at_conditioning_floor():
    """(nlyr=65, n=8) at strong coupling: the f32 accuracy statement.

    With near-unit layer transmissions the global block-tridiag system's
    condition number reaches ~1e4 (||x||_inf ~ 190 from O(1) rhs), so ANY
    backward-stable f32 solve — the fused kernel, the scan fallback, or the
    reference's single-precision LINPACK SGBFA (disort.f:SOLVE0) — carries a
    normwise forward error of order cond(A)*eps_f32 ~ 1e-4.  Two different
    correct eliminations therefore CANNOT agree to 1e-6; the meaningful
    equivalence test is that each sits at the same forward-error floor
    against an f64 ground truth, and that the fused kernel is no less
    accurate than the scan it replaces.

    Measured on CPU (2026-08-20): kernel and scan both 1.34e-3 normwise
    (identical to ~16 digits — the error is dominated by the shared f32
    rounding of the INPUTS, amplified by cond(A), not by either algorithm).
    """
    nlyr, n, b = 65, 8, 130
    gp, gm, ee, refl, rhs = _rt_problem(nlyr, n, b, coupling=0.4)

    d64, l64, u64 = assemble_blocks(
        *(jnp.asarray(x, jnp.float64) for x in (gp, gm, ee, refl))
    )
    truth = np.asarray(
        block_thomas_scan(d64, l64, u64, jnp.asarray(rhs, jnp.float64))
    )
    norm = np.abs(truth).max()

    f32 = [jnp.asarray(x, jnp.float32) for x in (gp, gm, ee, refl, rhs)]
    xs_k = np.asarray(block_thomas_rt(*f32, interpret=True))
    d32, l32, u32 = assemble_blocks(*f32[:4])
    xs_s = np.asarray(block_thomas_scan(d32, l32, u32, f32[4]))

    err_k = np.abs(xs_k - truth).max() / norm
    err_s = np.abs(xs_s - truth).max() / norm
    # both at the conditioning floor, kernel no worse than the scan fallback
    assert err_s < 5e-3, err_s
    assert err_k < 5e-3, err_k
    assert err_k < 2.0 * err_s + 1e-6, (err_k, err_s)


@pytest.mark.tpu
@pytest.mark.parametrize(
    "nlyr,n,b,coupling",
    # batch sweep across lane-aligned and unaligned b at both the nstr=4
    # whole-column-VMEM shape (33, 2) and the nstr=16 streamed shape (65, 8)
    [(33, 2, 130, 0.4), (33, 2, 256, 0.4), (33, 2, 1000, 0.4),
     (33, 2, 6144, 0.4),
     (65, 8, 130, 0.15), (65, 8, 256, 0.15), (65, 8, 1000, 0.15),
     (65, 8, 6144, 0.15)],
)
def test_block_thomas_rt_compiled_on_tpu(nlyr, n, b, coupling):
    """Non-interpret (Mosaic-compiled) kernel vs scan on real TPU hardware.

    Runs only under SBDART_TPU_TESTS=1 with a TPU backend present; verifies
    the compiled kernel — not just the interpreter — matches the XLA scan.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    gp, gm, ee, refl, rhs = (
        jnp.asarray(x, jnp.float32)
        for x in _rt_problem(nlyr, n, b, coupling=coupling)
    )
    xs_k = np.asarray(block_thomas_rt(gp, gm, ee, refl, rhs))
    diag, lower, upper = assemble_blocks(gp, gm, ee, refl)
    xs_s = np.asarray(block_thomas_scan(diag, lower, upper, rhs))
    assert np.allclose(xs_k, xs_s, rtol=1e-4, atol=1e-5), (
        np.abs(xs_k - xs_s).max()
    )


def test_block_thomas_oversize_raises():
    """The materialized-blocks kernel refuses shapes whose whole-column
    working set exceeds VMEM, pointing at block_thomas_rt (which streams)."""
    nlyr, m, b = 65, 16, 130
    z = jnp.zeros((nlyr, m, m, b), jnp.float32)
    r = jnp.zeros((nlyr, m, b), jnp.float32)
    with pytest.raises(ValueError, match="block_thomas_rt"):
        block_thomas(z, z, z, r, interpret=True)


def test_block_thomas_needs_pivoting():
    # zero diagonal pivot in the first block forces a row exchange
    nlyr, m, b = 3, 4, 130
    rng = np.random.default_rng(5)
    diag = rng.normal(size=(nlyr, m, m, b))
    diag[0, 0, 0, :] = 0.0
    diag[0, 1, 0, :] = 3.0   # pivot row below
    lower = np.zeros((nlyr, m, m, b))
    upper = rng.normal(size=(nlyr, m, m, b)) * 0.1
    rhs = rng.normal(size=(nlyr, m, b))
    args = [jnp.asarray(x, jnp.float32) for x in (diag, lower, upper, rhs)]
    xs_k = np.asarray(block_thomas(*args, interpret=True))
    xs_s = np.asarray(block_thomas_scan(*args))
    assert np.isfinite(xs_k).all()
    assert np.allclose(xs_k, xs_s, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused eigensolve chain kernel (pallas/eig.py)
# ---------------------------------------------------------------------------

def _eig_problem(nstr, nlyr, b, seed=3):
    from sbdart_tpu.solver.eig import angular_tables

    tab = angular_tables(nstr, 1)
    rng = np.random.default_rng(seed)
    ssalb = rng.uniform(0.05, 0.999, (b, 1, nlyr))
    g = rng.uniform(0.0, 0.85, (b, 1, nlyr))
    gl = g[..., None] ** np.arange(nstr)
    return tab, ssalb, gl


def test_eig_kernel_satisfies_eigen_relations():
    """Order-independent invariants of the fused kernel's output: with
    X_j = G+_j + G-_j and Y_j = G+_j - G-_j, the homogeneous solutions
    satisfy (alpha-beta) X = -k Y and (alpha+beta) Y = -k X (so
    (a+b)(a-b) X = k^2 X).  These hold for ANY eigenpair ordering — the
    property the round-4 sort-network removal relies on."""
    from sbdart_tpu.solver.eig import (
        angular_tables, scattering_matrices, solve_eigen,
    )
    import jax.numpy as jnp

    nstr, nlyr, b = 8, 5, 16
    tab, ssalb, gl = _eig_problem(nstr, nlyr, b)
    a32 = jnp.asarray(ssalb, jnp.float32), jnp.asarray(gl, jnp.float32)
    e = solve_eigen(*a32, tab, jnp.float32, eig_method="pallas_interpret")
    cpp, cpm = scattering_matrices(*a32, tab, jnp.float64)
    n = nstr // 2
    mu = tab.mu
    w = tab.w
    eye = np.eye(n)
    amb = (1.0 / mu)[:, None] * (eye - np.asarray(cpp + cpm) * w)
    apb = (1.0 / mu)[:, None] * (eye - np.asarray(cpp - cpm) * w)
    x = np.asarray(e.gp, np.float64) + np.asarray(e.gm, np.float64)
    y = np.asarray(e.gp, np.float64) - np.asarray(e.gm, np.float64)
    kk = np.asarray(e.kk, np.float64)
    r1 = np.einsum("...ik,...kj->...ij", amb, x) + kk[..., None, :] * y
    r2 = np.einsum("...ik,...kj->...ij", apb, y) + kk[..., None, :] * x
    # f32 kernel checked against f64 operators: residuals sit at the f32
    # roundoff floor amplified by 1/mu and near-conservative conditioning
    # (measured 2e-5 / 1.8e-4 relative); a real pairing bug is O(1)
    scale = max(np.abs(x).max(), 1.0)
    assert np.abs(r1).max() / scale < 5e-4, np.abs(r1).max()
    assert np.abs(r2).max() / scale < 5e-4, np.abs(r2).max()


def _sorted_by_kk(e):
    """Sort an EigResult's eigenpairs ascending in kk (the fused kernel
    emits them unordered since round 4; consumers are order-invariant)."""
    kk = np.asarray(e.kk)
    gp = np.asarray(e.gp)
    gm = np.asarray(e.gm)
    order = np.argsort(kk, axis=-1)
    kk_s = np.take_along_axis(kk, order, -1)
    gp_s = np.take_along_axis(gp, order[..., None, :], -1)
    gm_s = np.take_along_axis(gm, order[..., None, :], -1)
    return kk_s, gp_s, gm_s


@pytest.mark.parametrize("nstr,nlyr,b", [(4, 5, 7), (8, 3, 130), (16, 9, 13)])
def test_eig_kernel_matches_lane(nstr, nlyr, b):
    """Fused Pallas eigensolve == XLA lane chain (interpret mode).

    Both are backward-stable f32 evaluations of the same chain in different
    op orders; near-conservative layers amplify eigenvector roundoff to the
    shared ~4e-4 f32 floor (measured against an f64 reference: lane 1.5e-4
    / 3.9e-4, kernel 1.9e-4 / 3.9e-4 for gp / gm at nstr=16), so the
    pairwise tolerance is 1e-3 with kk much tighter.
    """
    from sbdart_tpu.solver.eig import solve_eigen
    import jax.numpy as jnp

    tab, ssalb, gl = _eig_problem(nstr, nlyr, b)
    a32 = jnp.asarray(ssalb, jnp.float32), jnp.asarray(gl, jnp.float32)
    e_lane = solve_eigen(*a32, tab, jnp.float32, eig_method="lane")
    e_pal = solve_eigen(*a32, tab, jnp.float32,
                        eig_method="pallas_interpret")
    # the kernel emits UNORDERED eigenpairs (round 4: every consumer sums
    # over the mode index, so the sort network was removed); normalize by
    # sorting both sides on kk before the elementwise comparison
    kk_l, gp_l, gm_l = _sorted_by_kk(e_lane)
    kk_p, gp_p, gm_p = _sorted_by_kk(e_pal)
    assert np.abs(kk_l - kk_p).max() < 5e-5
    for name, a, bb in (("gp", gp_l, gp_p), ("gm", gm_l, gm_p)):
        err = np.abs(a - bb).max()
        assert err < 1e-3, (name, err)


@pytest.mark.tpu
@pytest.mark.parametrize("nstr,b", [(4, 300), (8, 130), (16, 2048)])
def test_eig_kernel_compiled_on_tpu(nstr, b):
    """Mosaic-compiled fused eigensolve vs lane chain on real hardware.

    Eigenvalues must agree tightly; individual EIGENVECTORS may differ at
    isolated near-conservative lanes (near-degenerate k's rotate freely in
    their subspace — measured: 4.5e-5 of gp entries differ > 1e-3 at
    ssalb ~ 0.995, both answers valid), so the vector-level check is the
    PHYSICAL one: end-to-end fluxes through the full solve (measured
    agreement 1.9e-4 relative at (16, 2048)).
    """
    import jax
    import jax.numpy as jnp

    from sbdart_tpu.solver.disort import solve_rte
    from sbdart_tpu.solver.eig import solve_eigen

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    tab, ssalb, gl = _eig_problem(nstr, 9, b)
    a32 = jnp.asarray(ssalb, jnp.float32), jnp.asarray(gl, jnp.float32)
    e_lane = solve_eigen(*a32, tab, jnp.float32, eig_method="lane")
    e_pal = solve_eigen(*a32, tab, jnp.float32, eig_method="pallas")
    kk_l, _, _ = _sorted_by_kk(e_lane)
    kk_p, _, _ = _sorted_by_kk(e_pal)
    # both methods sit at the SAME measured f32 floor vs f64 truth
    # (9.5e-5 abs worst-lane at this problem class, identical for sweep
    # counts 3/4/6 — the error is input rounding, not convergence), but
    # their different rotation orders/sweep counts land on different
    # points within it, so the cross-method bar is ~2x the floor
    assert np.abs(kk_l - kk_p).max() < 3e-4

    nlyr = 33
    rng = np.random.default_rng(5)
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, (b, nlyr)), jnp.float32)
    ssalb2 = jnp.asarray(rng.uniform(0.05, 0.999, (b, nlyr)), jnp.float32)
    g = rng.uniform(0.0, 0.85, (b, nlyr))
    pmom = jnp.asarray(g[..., None] ** np.arange(nstr + 1), jnp.float32)
    fbeam = jnp.ones((b,), jnp.float32)
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (b,)), jnp.float32)
    alb = jnp.asarray(rng.uniform(0.0, 0.8, (b,)), jnp.float32)

    def run(method):
        o = solve_rte(dtau, ssalb2, pmom, nstr=nstr, fbeam=fbeam, umu0=umu0,
                      albedo=alb, onlyfl=True, dtype=jnp.float32,
                      eig_method=method)
        return np.asarray(o.rfldn), np.asarray(o.flup)

    rp, fp = run("pallas")
    rl, fl = run("lane")
    # two correct f32 paths (different sweep counts / accumulation
    # orders): measured 5.3e-4 relative worst-case at sweeps=3 — still
    # 2-6x below either path's own f32-vs-f64 floor (2.4e-3..6e-3,
    # tests/test_f32_path.py)
    assert np.abs(rp - rl).max() < 1e-3 * np.abs(rl).max()
    assert np.abs(fp - fl).max() < 1e-3 * max(np.abs(fl).max(), 1e-6)


def _fused_flux_problem(nstr, nlyr, b, planck, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    dtau = jnp.asarray(rng.uniform(0.001, 0.6, (b, nlyr)), jnp.float32)
    ssalb = jnp.asarray(rng.uniform(0.05, 0.999, (b, nlyr)), jnp.float32)
    g = rng.uniform(0.0, 0.85, (b, nlyr))
    pmom = jnp.asarray(g[..., None] ** np.arange(nstr + 1), jnp.float32)
    fbeam = jnp.asarray(
        np.where(rng.uniform(size=b) < 0.8, 1.0, 0.0), jnp.float32
    )
    umu0 = jnp.asarray(rng.uniform(0.2, 1.0, (b,)), jnp.float32)
    alb = jnp.asarray(rng.uniform(0.0, 0.8, (b,)), jnp.float32)
    kw = dict(nstr=nstr, fbeam=fbeam, umu0=umu0, albedo=alb, onlyfl=True,
              dtype=jnp.float32)
    if planck:
        temper = jnp.asarray(
            np.linspace(250, 290, nlyr + 1)[None].repeat(b, 0), jnp.float32
        )
        kw.update(planck=True, temper=temper, wvnlo=800.0, wvnhi=900.0,
                  btemp=290.0, fisot=0.3)
    return (dtau, ssalb, pmom), kw


@pytest.mark.parametrize("nstr,planck", [(4, False), (16, False), (16, True)])
def test_fused_eig_beam_matches_lane(nstr, planck):
    """solve_rte with the fused eig+beam kernel == the lane path (interpret).

    Covers solar-only and thermal (the fused path materializes cpp/cpm
    lazily for the thermal particular solve).  Sizes are kept small: the
    Pallas interpreter is ~10^3x slower than compiled and this check is
    about MATH equivalence, which 6 layers x 16 columns already pins; the
    compiled TPU-gated sibling runs the production shapes.
    """
    from sbdart_tpu.solver.disort import solve_rte

    args, kw = _fused_flux_problem(nstr, 6, 16, planck)
    o_f = solve_rte(*args, eig_method="fused_interpret", **kw)
    o_l = solve_rte(*args, eig_method="lane", **kw)
    for nm in ("rfldn", "flup", "uavg", "dfdt"):
        a = np.asarray(getattr(o_f, nm))
        bb = np.asarray(getattr(o_l, nm))
        err = np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-9)
        assert err < 5e-4, (nm, err)


def test_fused_eig_beam_matches_lane_brdf():
    """The GENERIC-path fused branch (disort.py solve_eigen_beam_fused) is
    only reachable for non-Lambertian flux runs — the fluxlane fast path
    intercepts every Lambertian one — so pin it with a Hapke BRDF case
    (round-3 advisor: this combination had no coverage)."""
    from sbdart_tpu.solver.brdf import HapkeBrdf
    from sbdart_tpu.solver.disort import solve_rte

    args, kw = _fused_flux_problem(4, 6, 16, planck=False)
    kw.pop("albedo")
    brdf = HapkeBrdf(b0=1.0, hh=0.06, w=0.6)
    o_f = solve_rte(*args, albedo=0.0, brdf=brdf,
                    eig_method="fused_interpret", **kw)
    o_l = solve_rte(*args, albedo=0.0, brdf=brdf, eig_method="lane", **kw)
    for nm in ("rfldn", "flup", "uavg"):
        a = np.asarray(getattr(o_f, nm))
        bb = np.asarray(getattr(o_l, nm))
        err = np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-9)
        assert err < 5e-4, (nm, err)


def test_fused_requires_tpu_clear_error():
    """eig_method='fused' off-TPU must raise a clear ValueError, not an
    obscure Mosaic lowering failure (round-3 advisor)."""
    import jax

    from sbdart_tpu.solver.disort import solve_rte

    if jax.default_backend() == "tpu":
        pytest.skip("only meaningful off-TPU")
    args, kw = _fused_flux_problem(4, 4, 8, planck=False)
    with pytest.raises(ValueError, match="fused_interpret"):
        solve_rte(*args, eig_method="fused", **kw)


@pytest.mark.tpu
@pytest.mark.parametrize("nstr,b", [(4, 1000), (16, 2048)])
def test_fused_eig_beam_compiled_on_tpu(nstr, b):
    """Mosaic-compiled fused eig+beam flux path vs lane on real hardware."""
    import jax

    from sbdart_tpu.solver.disort import solve_rte

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    args, kw = _fused_flux_problem(nstr, 33, b, planck=False)
    o_f = solve_rte(*args, eig_method="fused", **kw)
    o_l = solve_rte(*args, eig_method="lane", **kw)
    for nm in ("rfldn", "flup"):
        a = np.asarray(getattr(o_f, nm))
        bb = np.asarray(getattr(o_l, nm))
        err = np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-9)
        # two backward-stable f32 paths with different accumulation orders:
        # worst lanes (near-conservative, strongly peaked) sit at the
        # conditioning floor — measured 1.45e-3 at (nstr=4, b=1000), well
        # inside the documented f32-path band (test_f32_path.py reaches
        # 2.3e-2 relative on clear-sky rfldn)
        assert err < 3e-3, (nm, err)
