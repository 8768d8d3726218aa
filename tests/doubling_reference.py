"""Independent adding-doubling reference solver (pure numpy, f64).

This is the test suite's EXTERNAL ANCHOR for the DISORT-battery problems
(tests/test_disort_battery.py).  The published disotest.f 6-digit tables are
unreachable in this environment (no network; /root/reference is empty), so
correctness is anchored the only honest way available: a completely
independent algorithm.  Adding-doubling (van de Hulst 1963; Hansen & Travis
1974) shares NOTHING with the discrete-ordinates solver under test — no
eigendecompositions, no boundary-value problem, no particular solutions —
it builds reflection/transmission operators of thin layers from the
single-scattering limit and doubles/adds them.  Agreement between the two
methods at 1e-6..1e-4 validates the whole solver chain including the
convention-sensitive outputs (uavg, dfdt, radiance normalization).

Conventions (chosen to match DISORT's documented interface):
  * incident beam of flux FBEAM normal to itself at cosine mu0,
  * intensities are per steradian; fluxes = 2 pi int mu I dmu per hemisphere,
  * azimuth modes I(mu, phi) = sum_m (2 - delta_m0) I^m(mu) cos m(phi - phi0),
  * phase function p(cos T) = sum_l (2l+1) g_l P_l(cos T), g_0 = 1.

Associated Legendre normalization uses scipy.special (independent of the
solver's own recurrences in solver/legendre.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from numpy.polynomial.legendre import leggauss
from scipy.special import gammaln, lpmv


def norm_assoc_legendre(m: int, ls: np.ndarray, mu: np.ndarray) -> np.ndarray:
    """Lambda_l^m(mu) = sqrt((l-m)!/(l+m)!) P_l^m(mu), shape [len(ls), len(mu)]."""
    out = np.zeros((len(ls), len(mu)))
    for i, l in enumerate(ls):
        if l < m:
            continue
        lognorm = 0.5 * (gammaln(l - m + 1) - gammaln(l + m + 1))
        out[i] = np.exp(lognorm) * lpmv(m, l, mu)
    return out


def phase_mode(m: int, gl: np.ndarray, mu_out: np.ndarray,
               mu_in: np.ndarray) -> np.ndarray:
    """p^m(mu_out, mu_in) = sum_l (2l+1) g_l Lam_l^m(mu_out) Lam_l^m(mu_in).

    mu arguments are SIGNED cosines; shape [len(mu_out), len(mu_in)].
    """
    ls = np.arange(len(gl))
    lam_o = norm_assoc_legendre(m, ls, mu_out)      # [L, O]
    lam_i = norm_assoc_legendre(m, ls, mu_in)       # [L, I]
    c = (2 * ls + 1) * gl
    return np.einsum("l,lo,li->oi", c, lam_o, lam_i)


@dataclasses.dataclass
class Slab:
    """Diffuse operators + beam/thermal sources of one homogeneous slab.

    Operators act on intensity vectors at the node set (quadrature nodes
    first, then zero-weight virtual nodes for user angles):
      r[i, j]: upward I at top per unit downward I at top (from above),
      t[i, j]: downward I at bottom per unit downward I at top (incl. the
               attenuated unscattered diag — smooth fields, no delta issue),
      by up/down symmetry of a homogeneous slab, illumination from below
      uses the same r and t.
    Beam (unit flux at slab top, cosine mu0):
      sr[i]: upward diffuse I at top;  st[i]: downward diffuse I at bottom;
      db: direct beam attenuation exp(-tau/mu0).
    Thermal (mode 0 only; isothermal slab):
      eu[i]: upward emitted I at top; ed[i]: downward emitted I at bottom.
    """
    r: np.ndarray
    t: np.ndarray
    sr: np.ndarray
    st: np.ndarray
    db: float
    eu: np.ndarray
    ed: np.ndarray


def _thin_slab(dtau: float, w0: float, gl: np.ndarray, m: int,
               mu: np.ndarray, wvec: np.ndarray, mu0: float,
               planck: float) -> Slab:
    """First-order (single-scattering) operators of an optically thin layer.

    `wvec` holds the Gauss weights at quadrature nodes and ZEROS at the
    virtual (output-only) user-angle nodes, so virtual nodes never
    contribute as sources while still receiving scattered intensity.
    """
    n = len(mu)
    # scattering: source J^m(mu) = (w0/2) int p^m(mu, mu') I(mu') dmu'
    p_pm = phase_mode(m, gl, mu, -mu)        # down (-mu_j) -> up (+mu_i)
    p_pp = phase_mode(m, gl, -mu, -mu)       # down -> down
    r = (0.5 * w0 * dtau) / mu[:, None] * p_pm * wvec[None, :]
    t = (0.5 * w0 * dtau) / mu[:, None] * p_pp * wvec[None, :]
    t = t + np.diag(np.exp(-dtau / mu))
    # beam: incident flux 1 at cosine mu0 => intensity source
    # X^m(mu) = (w0 / 4 pi) p^m(mu, -mu0) (per unit flux)
    pb_up = phase_mode(m, gl, mu, np.array([-mu0]))[:, 0]
    pb_dn = phase_mode(m, gl, -mu, np.array([-mu0]))[:, 0]
    sr = (w0 * dtau) / (4.0 * np.pi * mu) * pb_up
    st = (w0 * dtau) / (4.0 * np.pi * mu) * pb_dn
    db = float(np.exp(-dtau / mu0))
    # thermal: isotropic emission (1 - w0) B dtau / mu (mode 0 only)
    if m == 0 and planck > 0.0:
        e = (1.0 - w0) * planck * dtau / mu
    else:
        e = np.zeros(n)
    return Slab(r, t, sr, st, db, e.copy(), e.copy())


def _double(s: Slab) -> Slab:
    """Combine a homogeneous slab with an identical copy below it."""
    eye = np.eye(s.r.shape[0])
    q = np.linalg.inv(eye - s.r @ s.r)
    # beam-driven interface fields
    d_int = q @ (s.st + s.r @ (s.sr * s.db))
    u_int = s.sr * s.db + s.r @ d_int
    # thermal-driven interface fields
    d_th = q @ (s.ed + s.r @ s.eu)
    u_th = s.eu + s.r @ d_th
    return Slab(
        r=s.r + s.t @ q @ s.r @ s.t,
        t=s.t @ q @ s.t,
        sr=s.sr + s.t @ u_int,
        st=s.t @ d_int + s.st * s.db,
        db=s.db * s.db,
        eu=s.eu + s.t @ u_th,
        ed=s.ed + s.t @ d_th,
    )


def make_layer(dtau: float, w0: float, gl: np.ndarray, m: int,
               mu: np.ndarray, wvec: np.ndarray, mu0: float,
               planck: float = 0.0, dtau0: float = 1e-9) -> Slab:
    """Homogeneous slab of depth dtau by repeated doubling from dtau0."""
    if dtau <= 0.0:
        n = len(mu)
        z = np.zeros(n)
        return Slab(np.zeros((n, n)), np.eye(n), z, z.copy(), 1.0,
                    z.copy(), z.copy())
    ndbl = max(0, int(np.ceil(np.log2(dtau / dtau0))))
    s = _thin_slab(dtau / 2 ** ndbl, w0, gl, m, mu, wvec, mu0, planck)
    for _ in range(ndbl):
        s = _double(s)
    return s


@dataclasses.dataclass
class Stack:
    """Inhomogeneous stack: like Slab but with distinct from-below operators
    (rb, tb) and the beam attenuation to its top recorded by the caller."""
    r: np.ndarray    # reflection, illuminated from above
    t: np.ndarray    # transmission downward
    rb: np.ndarray   # reflection, illuminated from below
    tb: np.ndarray   # transmission upward
    sr: np.ndarray   # beam: upward diffuse at top (unit flux at STACK top)
    st: np.ndarray   # beam: downward diffuse at bottom
    db: float        # beam direct attenuation through the stack
    eu: np.ndarray   # thermal: upward at top
    ed: np.ndarray   # thermal: downward at bottom


def _stack_of(s: Slab) -> Stack:
    return Stack(s.r, s.t, s.r, s.t, s.sr, s.st, s.db, s.eu, s.ed)


def _add(a: Stack, b: Stack) -> Stack:
    """Stack b below stack a (beam enters at a's top with unit flux)."""
    eye = np.eye(a.r.shape[0])
    q = np.linalg.inv(eye - a.rb @ b.r)
    qb = np.linalg.inv(eye - b.r @ a.rb)
    # beam interface fields (downward D, upward U at the a|b interface)
    d_int = q @ (a.st + a.rb @ (b.sr * a.db))
    u_int = b.sr * a.db + b.r @ d_int
    # thermal interface fields
    d_th = q @ (a.ed + a.rb @ b.eu)
    u_th = b.eu + b.r @ d_th
    return Stack(
        r=a.r + a.tb @ qb @ b.r @ a.t,
        t=b.t @ q @ a.t,
        rb=b.rb + b.t @ q @ a.rb @ b.tb,
        tb=a.tb @ qb @ b.tb,
        sr=a.sr + a.tb @ u_int,
        st=b.t @ d_int + b.st * a.db,
        db=a.db * b.db,
        eu=a.eu + a.tb @ u_th,
        ed=b.ed + b.t @ d_th,
    )


def _surface_stack(n: int, mu: np.ndarray, cw: np.ndarray, m: int,
                   albedo: float, emission: float) -> Stack:
    """Lambertian surface as a stack (reflection from above only)."""
    r = np.zeros((n, n))
    if m == 0 and albedo > 0.0:
        # I_up = albedo / pi * F_dn ; F_dn = pi * sum c_j I_j (c = 2 w mu)
        r = albedo * np.ones((n, 1)) @ cw[None, :]
    z = np.zeros(n)
    eu = np.full(n, emission) if m == 0 else z.copy()
    return Stack(r, np.zeros((n, n)), np.zeros((n, n)), np.zeros((n, n)),
                 z.copy(), z.copy(), 0.0, eu, z.copy())


@dataclasses.dataclass
class DoublingResult:
    mu_q: np.ndarray       # [NQ] quadrature cosines
    w_q: np.ndarray        # [NQ]
    mu_all: np.ndarray     # [NQ + NU] incl. virtual user nodes
    up: np.ndarray         # [M, L+1, NQ+NU] upward Fourier intensity modes
    dn: np.ndarray         # [M, L+1, NQ+NU] downward (diffuse)
    rfldir: np.ndarray     # [L+1]
    rfldn: np.ndarray      # [L+1]
    flup: np.ndarray       # [L+1]
    uavg: np.ndarray       # [L+1]

    def radiance(self, iu: int, phi_deg: float, phi0_deg: float = 0.0,
                 lev: int = 0, up: bool = True) -> float:
        """I(mu_user, phi) at a boundary from the Fourier modes."""
        modes = self.up if up else self.dn
        dphi = np.deg2rad(phi_deg - phi0_deg)
        tot = 0.0
        for m in range(modes.shape[0]):
            fac = 1.0 if m == 0 else 2.0
            tot += fac * modes[m, lev, iu] * np.cos(m * dphi)
        return tot


def solve_doubling(
    dtau: np.ndarray,            # [L] per-layer optical depth (TOA-first)
    ssalb: np.ndarray,           # [L]
    gl: np.ndarray,              # [L, nmom] moments g_l (g_0 = 1)
    *,
    fbeam: float = 0.0,
    mu0: float = 0.5,
    albedo: float = 0.0,
    fisot: float = 0.0,
    planck_layer: np.ndarray | None = None,   # [L] isothermal layer B
    planck_surf: float = 0.0,                 # emitted surface radiance eps*B
    nq: int = 48,
    nmodes: int = 1,
    umu_user: np.ndarray | None = None,       # virtual output cosines (> 0)
) -> DoublingResult:
    """Full multi-layer solve; fluxes at every boundary + radiance modes."""
    dtau = np.asarray(dtau, np.float64)
    ssalb = np.asarray(ssalb, np.float64)
    gl = np.asarray(gl, np.float64)
    nlyr = len(dtau)

    x, w = leggauss(nq)
    mu_q = 0.5 * (x + 1.0)
    w_q = 0.5 * w
    if umu_user is not None and len(umu_user):
        mu = np.concatenate([mu_q, np.abs(umu_user)])
        wvec = np.concatenate([w_q, np.zeros(len(umu_user))])
        cw = np.concatenate([2.0 * w_q * mu_q, np.zeros(len(umu_user))])
    else:
        mu = mu_q
        wvec = w_q
        cw = 2.0 * w_q * mu_q
    n = len(mu)

    mu0 = abs(mu0)
    tau_top = np.concatenate([[0.0], np.cumsum(dtau)])   # [L+1]
    beam_at = np.exp(-tau_top / mu0) if fbeam > 0 else np.zeros(nlyr + 1)

    up_modes = np.zeros((nmodes, nlyr + 1, n))
    dn_modes = np.zeros((nmodes, nlyr + 1, n))

    for m in range(nmodes):
        pl = planck_layer if (m == 0 and planck_layer is not None) else None
        layers = [
            make_layer(
                float(dtau[k]), float(ssalb[k]), gl[k], m, mu, wvec, mu0,
                planck=0.0 if pl is None else float(pl[k]),
            )
            for k in range(nlyr)
        ]
        surf = _surface_stack(
            n, mu, cw, m, albedo, planck_surf if m == 0 else 0.0
        )
        # cumulative stacks above each boundary (above[v] = layers 0..v-1)
        above = [None] * (nlyr + 1)
        empty = _stack_of(make_layer(0.0, 0.0, gl[0], m, mu, wvec, mu0))
        above[0] = empty
        for v in range(nlyr):
            above[v + 1] = _add(above[v], _stack_of(layers[v]))
        # cumulative stacks below each boundary (below[v] = layers v.. + surface)
        below = [None] * (nlyr + 1)
        below[nlyr] = surf
        for v in range(nlyr - 1, -1, -1):
            below[v] = _add(_stack_of(layers[v]), below[v + 1])

        iso = fisot if m == 0 else 0.0
        for v in range(nlyr + 1):
            a, b = above[v], below[v]
            eye = np.eye(n)
            q = np.linalg.inv(eye - a.rb @ b.r)
            inc = np.full(n, iso)
            # downward diffuse at boundary v:
            #   transmitted isotropic + a's beam/thermal + reflections
            rhs_d = a.t @ inc + fbeam * a.st + a.ed
            rhs_u = fbeam * (b.sr * a.db) + b.eu
            d = q @ (rhs_d + a.rb @ rhs_u)
            u = rhs_u + b.r @ d
            dn_modes[m, v] = d
            up_modes[m, v] = u

    # fluxes (mode 0; quadrature nodes only)
    cwq = (2.0 * w_q * mu_q)
    fdn_diff = np.pi * dn_modes[0, :, :nq] @ cwq
    flup = np.pi * up_modes[0, :, :nq] @ cwq
    rfldir = fbeam * mu0 * beam_at
    uavg = (
        0.5 * (up_modes[0, :, :nq] + dn_modes[0, :, :nq]) @ w_q
        + fbeam * beam_at / (4.0 * np.pi)
    )
    return DoublingResult(
        mu_q=mu_q, w_q=w_q, mu_all=mu,
        up=up_modes, dn=dn_modes,
        rfldir=rfldir, rfldn=fdn_diff, flup=flup, uavg=uavg,
    )
