"""DISORT-battery equivalent: the solver vs an INDEPENDENT reference.

The upstream disotest.f battery (SURVEY.md section 5.2) validates DISORT
against ~15 problems with published 6-digit outputs.  Those tables are
unreachable here (no network, /root/reference empty), so this battery keeps
the PROBLEM SET (isotropic / Rayleigh / Henyey-Greenstein / thick-cloud /
thermal / multi-layer, beams at grazing and steep incidence) but anchors it
externally the only honest way available:

  1. an independent adding-doubling solver (tests/doubling_reference.py) —
     a different algorithm end to end (no eigensolves, no BVP), validated
     below against closed forms before it is used as a reference;
  2. Chandrasekhar H-function results for semi-infinite isotropic
     scattering (computed from the H integral equation, a third method);
  3. exact analytic results (conservation, isothermal-slab emissivity via
     exponential integrals, single-scattering limit).

Agreement across methods at 1e-6..1e-4 exercises exactly what SLFTST and
disotest cover: fluxes, uavg, dfdt, radiances, delta-M + TMS/IMS.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import expn

from sbdart_tpu.solver.disort import solve_rte
from doubling_reference import solve_doubling


def hg(g, nmom):
    return g ** np.arange(nmom, dtype=np.float64)


def rayleigh_gl(nmom):
    gl = np.zeros(nmom)
    gl[0] = 1.0
    if nmom > 2:
        gl[2] = 0.1
    return gl


def run_dom(dtau, ssalb, gl, *, nstr, fbeam=0.0, mu0=0.5, albedo=0.0,
            fisot=0.0, umu=None, phi=None, planck=False, temper=None,
            wvn=(800.0, 850.0), btemp=0.0, temis_top=0.0, deltam=True,
            corint=True):
    kw = dict(
        nstr=nstr, fbeam=fbeam, umu0=mu0, phi0=0.0, fisot=fisot,
        albedo=albedo, deltam=deltam, dtype=jnp.float64,
    )
    if planck:
        kw.update(planck=True, temper=np.asarray(temper, np.float64),
                  wvnlo=wvn[0], wvnhi=wvn[1], btemp=btemp, temis=temis_top)
    if umu is not None:
        kw.update(onlyfl=False, umu=tuple(umu), phi=tuple(phi),
                  corint=corint)
    return solve_rte(
        jnp.asarray(dtau, jnp.float64), jnp.asarray(ssalb, jnp.float64),
        jnp.asarray(np.tile(gl, (len(dtau), 1)), jnp.float64), **kw,
    )


# ===========================================================================
# Part A — validate the doubling reference itself against closed forms
# ===========================================================================

class TestDoublingSelfValidation:
    def test_single_scatter_reflection(self):
        """w0 -> 0: reflected radiance == the exact once-scattered integral.

        I(0, +mu) = (w0 F mu0) / (4 pi (mu + mu0)) [1 - e^{-tau (1/mu + 1/mu0)}]
        (isotropic phase function; exact for the single-scattered field).
        """
        w0, tau, mu0 = 1e-4, 0.5, 0.6
        r = solve_doubling(
            np.array([tau]), np.array([w0]), np.ones((1, 1)),
            fbeam=1.0, mu0=mu0, nq=32,
            umu_user=np.array([0.3, 0.8]),
        )
        for k, mu in enumerate([0.3, 0.8]):
            exact = (w0 * mu0) / (4 * np.pi * (mu + mu0)) * (
                1.0 - np.exp(-tau * (1 / mu + 1 / mu0))
            )
            got = r.up[0, 0, 32 + k]
            assert got == pytest.approx(exact, rel=2e-4), (mu, got, exact)

    def test_conservation(self):
        """w0 = 1, black surface: all incident flux comes back out."""
        r = solve_doubling(
            np.array([0.5, 1.5]), np.array([1.0, 1.0]),
            np.tile(hg(0.7, 40), (2, 1)), fbeam=1.0, mu0=0.4, nq=48,
        )
        inc = 0.4
        out = r.flup[0] + r.rfldn[-1] + r.rfldir[-1]
        assert out == pytest.approx(inc, rel=1e-7)

    def test_hfunction_semi_infinite(self):
        """Thick isotropic slab vs Chandrasekhar H-functions (3rd method).

        I(0, mu) = (w0 F mu0) / (4 pi (mu + mu0)) H(mu) H(mu0),
        computed from the stable H integral equation
        1/H(mu) = sqrt(1 - w0) + (w0/2) int_0^1 mu' H(mu') / (mu + mu') dmu'.
        """
        w0, mu0 = 0.9, 0.6
        xg, wg = np.polynomial.legendre.leggauss(64)
        mq = 0.5 * (xg + 1)
        wq = 0.5 * wg
        h = np.ones_like(mq)
        mus = np.array([0.28, 0.75, mu0])
        h_out = np.ones_like(mus)
        for _ in range(400):
            integ = (w0 / 2) * np.array(
                [np.sum(wq * mq * h / (m + mq)) for m in mq]
            )
            h_new = 1.0 / (np.sqrt(1 - w0) + integ)
            if np.abs(h_new - h).max() < 1e-14:
                h = h_new
                break
            h = h_new
        h_out = 1.0 / (
            np.sqrt(1 - w0)
            + (w0 / 2) * np.array([np.sum(wq * mq * h / (m + mq)) for m in mus])
        )
        r = solve_doubling(
            np.array([300.0]), np.array([w0]), np.ones((1, 1)),
            fbeam=1.0, mu0=mu0, nq=48, umu_user=mus[:2],
        )
        for k in range(2):
            exact = w0 * mu0 / (4 * np.pi * (mus[k] + mu0)) * h_out[k] * h_out[2]
            got = r.up[0, 0, 48 + k]
            assert got == pytest.approx(exact, rel=3e-6), (mus[k], got, exact)

    def test_isothermal_emissivity(self):
        """Isothermal absorbing slab: flup(TOA) = pi B (1 - 2 E_3(tau))."""
        tau, b = 0.7, 3.5
        r = solve_doubling(
            np.array([tau]), np.array([0.0]), np.ones((1, 1)),
            planck_layer=np.array([b]), nq=48,
        )
        exact = np.pi * b * (1.0 - 2.0 * expn(3, tau))
        assert r.flup[0] == pytest.approx(exact, rel=1e-7)
        # downward at bottom mirrors it
        assert r.rfldn[-1] == pytest.approx(exact, rel=1e-7)


# ===========================================================================
# Part B — the battery: DOM solver vs the doubling reference
# ===========================================================================

def _flux_compare(dtau, ssalb, gl, *, nstr, mu0, albedo=0.0, fisot=0.0,
                  fbeam=1.0, nq=48, tol=1e-4, uavg_tol=1e-3):
    """Compare DOM fluxes to the doubling reference.

    Default tolerances reflect nstr=16 ANGULAR TRUNCATION of the flux
    quadrature (measured 2026-08-20: grazing-beam thin layers reach
    3.5e-5 of scale at nstr=16 and improve 10-100x at nstr=32 — see
    test_truncation_convergence, which pins that convergence down).
    """
    out = run_dom(dtau, ssalb, gl, nstr=nstr, fbeam=fbeam, mu0=mu0,
                  albedo=albedo, fisot=fisot)
    ref = solve_doubling(dtau, ssalb, np.tile(gl, (len(dtau), 1)),
                         fbeam=fbeam, mu0=mu0, albedo=albedo, fisot=fisot,
                         nq=nq)
    scale = max(abs(fbeam) * mu0, np.pi * fisot, 1e-3)
    for name in ("rfldir", "rfldn", "flup"):
        d = np.abs(np.asarray(getattr(out, name)) - getattr(ref, name)).max()
        assert d < tol * scale, (name, d / scale)
    du = np.abs(np.asarray(out.uavg) - ref.uavg).max()
    assert du < (uavg_tol or tol) * scale, ("uavg", du / scale)
    return out, ref


@pytest.mark.slow
def test_truncation_convergence():
    """Residuals vs doubling must be angular truncation: 10x+ smaller at
    nstr=32 than nstr=16 for the worst case (thin layer, grazing beam)."""
    dtau, ssalb, gl, mu0 = (np.array([0.03125]), np.array([0.9999999]),
                            hg(0.0, 17), 0.1)
    errs = {}
    for nstr in (16, 32):
        out = run_dom(dtau, ssalb, gl, nstr=nstr, fbeam=1.0, mu0=mu0)
        ref = solve_doubling(dtau, ssalb, gl[None], fbeam=1.0, mu0=mu0, nq=64)
        errs[nstr] = max(
            np.abs(np.asarray(getattr(out, n)).ravel() - getattr(ref, n)).max()
            for n in ("rfldn", "flup")
        )
    assert errs[32] < errs[16] / 10.0, errs


class TestBatteryFluxes:
    """disotest-style problems, flux + uavg outputs (mode 0)."""

    @pytest.mark.parametrize("tau,w0,mu0", [
        (0.03125, 0.2, 0.1),       # disotest 1 shape: thin, absorbing, grazing
        (32.0, 0.2, 0.92),         # thick absorbing
        (0.03125, 0.9999999, 0.1),  # thin conservative (dithered w0)
    ])
    def test_isotropic(self, tau, w0, mu0):
        _flux_compare(np.array([tau]), np.array([w0]), hg(0.0, 17),
                      nstr=16, mu0=mu0)

    @pytest.mark.parametrize("w0", [0.5, 0.9999999])
    def test_rayleigh_grazing_beam(self, w0):
        # disotest 2 shape: Rayleigh, tau=0.2, mu0=0.080442
        _flux_compare(np.array([0.2]), np.array([w0]), rayleigh_gl(17),
                      nstr=16, mu0=0.080442)

    @pytest.mark.parametrize("w0", [0.9, 0.9999999])
    def test_henyey_greenstein(self, w0):
        # disotest 3 shape: HG g=0.75, tau=1
        _flux_compare(np.array([1.0]), np.array([w0]), hg(0.75, 65),
                      nstr=32, mu0=0.5, tol=6e-5)

    @pytest.mark.slow
    def test_multilayer_with_surface(self):
        # Rayleigh over HG cloud over absorber, Lambertian albedo 0.3
        dtau = np.array([0.25, 4.0, 1.0])
        ssalb = np.array([0.99, 0.95, 0.4])
        gl = np.zeros((3, 33))
        gl[0] = rayleigh_gl(33)
        gl[1] = hg(0.8, 33)
        gl[2] = hg(0.3, 33)
        out = solve_rte(
            jnp.asarray(dtau), jnp.asarray(ssalb), jnp.asarray(gl),
            nstr=32, fbeam=1.0, umu0=0.7, albedo=0.3, deltam=True,
            dtype=jnp.float64,
        )
        ref = solve_doubling(dtau, ssalb, gl, fbeam=1.0, mu0=0.7,
                             albedo=0.3, nq=48)
        for name in ("rfldir", "rfldn", "flup", "uavg"):
            d = np.abs(np.asarray(getattr(out, name)) - getattr(ref, name)).max()
            assert d < 2e-4 * 0.7, (name, d)

    def test_isotropic_boundary_source(self):
        # fisot illumination, no beam (disotest 7 shape)
        _flux_compare(np.array([1.0]), np.array([0.9]), hg(0.5, 17),
                      nstr=16, mu0=0.5, fbeam=0.0, fisot=1.0)

    @pytest.mark.slow
    def test_thick_cloud_deltam_stress(self):
        # cloud-C1-class stress: g=0.85, tau=64 (delta-M essential)
        _flux_compare(np.array([64.0]), np.array([0.9]), hg(0.85, 65),
                      nstr=32, mu0=0.65, tol=2e-4)


class TestBatteryThermal:
    def test_isothermal_slab_analytic(self):
        """Purely absorbing isothermal slab vs exponential-integral closed
        form — validates the Planck path + thermal particular solution.

        The residual is the flux quadrature's error integrating
        e^{-tau/mu} over the hemisphere (nstr/2 Gauss nodes) — asserted to
        shrink with nstr to show it is angular truncation, not a bug.
        """
        tau, t_iso = 0.7, 280.0
        temper = np.array([t_iso, t_iso])
        from sbdart_tpu.solver.planck import planck_band
        b = float(planck_band(jnp.asarray(800.0), jnp.asarray(850.0),
                              jnp.asarray(t_iso), jnp.float64))
        exact_up_toa = np.pi * b * (1.0 - 2.0 * expn(3, tau))

        errs = {}
        for nstr in (8, 32):
            out = run_dom(np.array([tau]), np.array([0.0]), hg(0.0, 5),
                          nstr=nstr, fbeam=0.0, planck=True, temper=temper,
                          btemp=1e-6)
            errs[nstr] = abs(float(out.flup[..., 0]) / exact_up_toa - 1.0)
            assert float(out.rfldn[..., -1]) == pytest.approx(
                float(out.flup[..., 0]), rel=1e-12
            )
        assert errs[8] < 2e-4
        assert errs[32] < 2e-6
        assert errs[32] < errs[8] / 10.0
        # uavg profile against the doubling reference (nstr=32 run)
        ref = solve_doubling(np.array([tau]), np.array([0.0]), np.ones((1, 1)),
                             planck_layer=np.array([b]), nq=48)
        assert np.abs(np.asarray(out.uavg).ravel() - ref.uavg).max() < 2e-5 * b

    @pytest.mark.slow
    def test_scattering_thermal_multilayer(self):
        """Scattering atmosphere with a piecewise-linear Planck profile vs
        doubling.  The solver's source is linear-in-tau per layer; the
        doubling reference approximates the same profile with nsub
        isothermal sub-layers per layer (2nd-order accurate in 1/nsub)."""
        from sbdart_tpu.solver.planck import planck_band

        dtau = np.array([0.5, 1.0, 2.0])
        ssalb = np.array([0.3, 0.6, 0.2])
        gl = np.zeros((3, 17))
        gl[:, 0] = 1.0
        gl[1] = hg(0.5, 17)
        t_lay = np.array([230.0, 255.0, 285.0])
        # level temps: T levels = [230, (230+255 jump), ...] staircase:
        temper = np.array([230.0, 230.0, 255.0, 285.0])
        # make layers isothermal: temper defines linear-in-tau B between
        # levels; choose equal endpoints per layer via degenerate levels
        # -> instead pass per-layer constant via tiny ramps: use equal
        # level temps within each layer by splitting layers in two
        dtau2 = np.repeat(dtau / 2, 2)
        ssalb2 = np.repeat(ssalb, 2)
        gl2 = np.repeat(gl, 2, axis=0)
        temper2 = np.array([230.0, 230.0, 230.0,   # layer 1 (two halves)
                            255.0, 255.0,          # layer 2
                            285.0, 285.0])
        # that still ramps between layers; accept: doubling gets the same
        # piecewise-linear B by sub-layering each half into isothermal cells
        # nsub convergence measured 2026-08-20 (flup err / bs): nsub=16 ->
        # 4.8e-4, nsub=64 -> 3.0e-5 (2nd order in 1/nsub; independent of
        # nstr) — the residual is the REFERENCE's isothermal sub-layering,
        # not the solver
        nsub = 64
        b_lev = np.array([
            float(planck_band(jnp.asarray(800.0), jnp.asarray(850.0),
                              jnp.asarray(t), jnp.float64))
            for t in temper2
        ])
        dt_sub, w0_sub, gl_sub, b_sub = [], [], [], []
        for k in range(len(dtau2)):
            for s in range(nsub):
                dt_sub.append(dtau2[k] / nsub)
                w0_sub.append(ssalb2[k])
                gl_sub.append(gl2[k])
                f = (s + 0.5) / nsub
                b_sub.append((1 - f) * b_lev[k] + f * b_lev[k + 1])
        bs = float(planck_band(jnp.asarray(800.0), jnp.asarray(850.0),
                               jnp.asarray(295.0), jnp.float64))
        out = solve_rte(
            jnp.asarray(dtau2), jnp.asarray(ssalb2), jnp.asarray(gl2),
            nstr=16, fbeam=0.0, planck=True,
            temper=jnp.asarray(temper2), wvnlo=800.0, wvnhi=850.0,
            btemp=295.0, albedo=0.0, deltam=True, dtype=jnp.float64,
        )
        ref = solve_doubling(
            np.array(dt_sub), np.array(w0_sub), np.array(gl_sub),
            planck_layer=np.array(b_sub), planck_surf=bs, nq=48,
        )
        # compare at the original 7 boundaries (doubling has nsub x layers)
        idx = np.arange(0, len(dt_sub) + 1, nsub)
        for name in ("flup", "rfldn", "uavg"):
            got = np.asarray(getattr(out, name)).ravel()
            want = getattr(ref, name)[idx]
            d = np.abs(got - want).max()
            assert d < 1e-4 * bs, (name, d / bs)


class TestBatteryRadiances:
    """Radiance outputs (all azimuth modes, TMS/IMS corrections active)."""

    @pytest.mark.slow
    def test_isotropic_radiances(self):
        umu = np.array([-0.9, -0.5, 0.5, 0.9])
        phi = np.array([0.0])
        out = run_dom(np.array([1.0]), np.array([0.8]), hg(0.0, 17),
                      nstr=16, fbeam=1.0, mu0=0.6, umu=umu, phi=phi)
        ref = solve_doubling(np.array([1.0]), np.array([0.8]),
                             hg(0.0, 17)[None], fbeam=1.0, mu0=0.6,
                             nq=48, umu_user=np.array([0.5, 0.9]))
        uu = np.asarray(out.uu)            # [..., L+1, numu, nphi]
        # up at TOA: umu = +0.5, +0.9
        for k, iu in enumerate([2, 3]):
            got = float(uu[..., 0, iu, 0])
            want = ref.radiance(48 + k, 0.0, lev=0, up=True)
            assert got == pytest.approx(want, rel=2e-5), (iu, got, want)
        # down at bottom
        for k, iu in enumerate([1, 0]):    # -0.5, -0.9
            got = float(uu[..., -1, iu, 0])
            want = ref.radiance(48 + k, 0.0, lev=1, up=False)
            assert got == pytest.approx(want, rel=2e-5), (iu, got, want)

    @pytest.mark.slow
    def test_rayleigh_azimuthal_radiances(self):
        """Azimuth-dependent Rayleigh radiances (3 Fourier modes live)."""
        umu = np.array([0.35, 0.85])
        phi = np.array([0.0, 90.0, 180.0])
        out = run_dom(np.array([0.5]), np.array([0.95]), rayleigh_gl(17),
                      nstr=16, fbeam=1.0, mu0=0.5, umu=umu, phi=phi)
        ref = solve_doubling(np.array([0.5]), np.array([0.95]),
                             rayleigh_gl(17)[None], fbeam=1.0, mu0=0.5,
                             nq=48, nmodes=3, umu_user=umu)
        uu = np.asarray(out.uu)
        for iu in range(2):
            for ip, ph in enumerate(phi):
                got = float(uu[..., 0, iu, ip])
                want = ref.radiance(48 + iu, ph, lev=0, up=True)
                assert got == pytest.approx(want, rel=5e-5), (iu, ph)

    @pytest.mark.slow
    def test_hg_radiances_with_tms(self):
        """HG g=0.75: delta-M truncation + TMS correction vs full doubling.

        The doubling reference carries the FULL 65-moment phase function
        with no truncation, so agreement here validates the delta-M/TMS
        interplay (SURVEY.md hard part 3).
        """
        umu = np.array([0.2, 0.6, 0.95])
        phi = np.array([0.0, 60.0, 180.0])
        out = run_dom(np.array([1.0]), np.array([0.9]), hg(0.75, 65),
                      nstr=16, fbeam=1.0, mu0=0.5, umu=umu, phi=phi)
        ref = solve_doubling(np.array([1.0]), np.array([0.9]),
                             hg(0.75, 65)[None], fbeam=1.0, mu0=0.5,
                             nq=48, nmodes=32, umu_user=umu)
        uu = np.asarray(out.uu)
        for iu in range(3):
            for ip, ph in enumerate(phi):
                got = float(uu[..., 0, iu, ip])
                want = ref.radiance(48 + iu, ph, lev=0, up=True)
                assert got == pytest.approx(want, rel=3e-3), (iu, ph, got, want)


class TestDfdt:
    @pytest.mark.slow
    def test_dfdt_matches_flux_divergence(self):
        """dfdt == d(net flux)/d(tau) by central differences of the
        doubling reference's net-flux profile (validates the 4 pi (1-w0)
        (uavg - B) convention end to end)."""
        dtau_tot, w0, mu0 = 2.0, 0.7, 0.6
        nfd = 64
        sub = np.full(nfd, dtau_tot / nfd)
        gl = hg(0.4, 17)
        ref = solve_doubling(sub, np.full(nfd, w0), np.tile(gl, (nfd, 1)),
                             fbeam=1.0, mu0=mu0, nq=48)
        net = (ref.rfldir + ref.rfldn) - ref.flup        # [nfd+1]
        # 4th-order centered derivative at interior sub-boundaries
        h = dtau_tot / nfd
        dnet = (-net[4:] + 8 * net[3:-1] - 8 * net[1:-3] + net[:-4]) / (12 * h)
        out = run_dom(sub, np.full(nfd, w0), gl, nstr=16, fbeam=1.0, mu0=mu0)
        dfdt = np.asarray(out.dfdt).ravel()[2:-2]
        # Convention check: our dfdt = 4 pi (1 - w0)(uavg - B) >= 0 for a
        # solar absorbing layer, and energy conservation gives
        # d(net)/dtau = -(absorbed per unit tau), so dfdt == -d(net)/dtau.
        # residual budget: nstr=16 angular truncation of uavg (~1e-4 of
        # scale, see _flux_compare) enters dfdt through 4 pi (1-w0) uavg
        err = np.abs(dfdt + dnet).max()
        assert err < 2e-4, err
        assert (dfdt > 0).all() and (dnet < 0).all()
