"""The spectral pipeline: SBDART's outer wavelength x k-distribution loop.

Replaces the driver loop of sbdart.f (SURVEY.md section 4.1) with a batched
design: the full spectral grid is built up front (optics.build_optical_deck),
then solved in fixed-size wavelength CHUNKS where each chunk is ONE jitted,
batched solve over the (chunk, k) axes — the reference's 10^4 sequential
DISORT calls become a handful of device launches.  k-weighting and spectral
integration happen on the host (outputs.py) where they are cheap.

Thermal handling: mixed SW/LW runs are branchless — every chunk is solved
with the Planck source enabled and a per-sample thermal mask folds the
emission to zero for solar-only wavelengths (temperature -> 0 trick), so one
compiled executable covers the whole spectrum.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from sbdart_tpu.atmosphere import Profile, build_profile
from sbdart_tpu.clouds import apply_cloud_humidity, load_usrcld_dat
from sbdart_tpu.config import Config
from sbdart_tpu.dtypes import default_dtype
from sbdart_tpu.optics import OpticalDeck, build_optical_deck
from sbdart_tpu.solar import (
    filter_function,
    solar_geometry,
    solar_irradiance,
    spectral_grid,
)
from sbdart_tpu.solver.disort import solve_rte
from sbdart_tpu.surface import surface_albedo

THERMAL_WL_UM = 2.0     # nothrm = -1: thermal source on beyond this (rt.doc)
DEFAULT_CHUNK = 48


@dataclasses.dataclass
class SpectralResult:
    """Per-wavelength, level-resolved results (spectral densities, per um)."""
    cfg: Config
    profile: Profile
    wl: np.ndarray            # [nwl]
    dwl: np.ndarray           # [nwl] trapezoid integration weights
    fbeam_toa: np.ndarray     # [nwl] filtered solar irradiance W/m^2/um
    filt: np.ndarray          # [nwl]
    csza: float
    fdir: np.ndarray          # [nwl, nlev]
    fdn: np.ndarray           # [nwl, nlev] diffuse down
    fup: np.ndarray           # [nwl, nlev]
    dfdt: np.ndarray          # [nwl, nlev]
    uavg: np.ndarray          # [nwl, nlev]
    uu: np.ndarray | None     # [nwl, nlev, nzen, nphi]
    umu: np.ndarray | None
    phi: np.ndarray | None

    @property
    def nlev(self) -> int:
        return self.profile.nlev

    def level_index(self, z_km: float) -> int:
        return int(np.argmin(np.abs(self.profile.z - z_km)))


def _band_edges_wavenumber(wl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-sample wavenumber band edges (midpoints of the wl grid)."""
    nu = 1.0e4 / wl
    if len(wl) == 1:
        half = 0.5 * max(nu[0] * 1e-3, 1.0)
        return nu - half, nu + half
    mid = 0.5 * (nu[1:] + nu[:-1])
    # nu is descending if wl ascending; build edges symmetric around samples
    lo_e = np.empty_like(nu)
    hi_e = np.empty_like(nu)
    hi_e[0] = nu[0] + abs(nu[0] - mid[0])
    lo_e[-1] = nu[-1] - abs(mid[-1] - nu[-1])
    lo_e[:-1] = mid
    hi_e[1:] = mid
    lo = np.minimum(lo_e, hi_e)
    hi = np.maximum(lo_e, hi_e)
    return lo, hi


def _trapz_weights(wl: np.ndarray) -> np.ndarray:
    if len(wl) == 1:
        return np.ones(1)
    w = np.zeros_like(wl)
    d = np.diff(wl)
    w[0] = d[0] / 2
    w[-1] = d[-1] / 2
    w[1:-1] = (d[:-1] + d[1:]) / 2
    return w


@functools.lru_cache(maxsize=32)
def _jitted_solver(nstr, onlyfl, planck, deltam, corint, numu, nphi, dtype_name):
    """Compile one chunk solver for a given static configuration."""

    def solve(dtau, ssalb, pmom, fbeam, umu0, phi0, fisot, albedo,
              temper, wvnlo, wvnhi, btemp, ttemp, temis, umu, phi):
        return solve_rte(
            dtau, ssalb, pmom,
            nstr=nstr,
            fbeam=fbeam, umu0=umu0, phi0=phi0, fisot=fisot, albedo=albedo,
            planck=planck, temper=temper, wvnlo=wvnlo, wvnhi=wvnhi,
            btemp=btemp, ttemp=ttemp, temis=temis,
            deltam=deltam, onlyfl=onlyfl,
            umu=None if numu == 0 else umu,
            phi=None if nphi == 0 else phi,
            corint=corint,
            dtype=jnp.dtype(dtype_name),
        )

    if numu:
        return jax.jit(solve, static_argnames=("umu", "phi"))
    return jax.jit(solve)


@dataclasses.dataclass
class AlbTrnResult:
    """ibcnd=1 (disort.f:ALBTRN) results: slab albedo & transmissivity."""
    cfg: Config
    profile: Profile
    wl: np.ndarray        # [nwl]
    umu: np.ndarray       # [numu] incidence cosines
    albmed: np.ndarray    # [nwl, numu]
    trnmed: np.ndarray    # [nwl, numu]


def run_albtrn(
    cfg: Config,
    profile: Profile | None = None,
    dtype=None,
    usrcld: np.ndarray | None = None,
    aer_table=None,
) -> AlbTrnResult:
    """The ibcnd=1 special mode: plane albedo / total transmissivity of the
    whole slab per incidence angle (disort.f:ALBTRN/ALTRIN/SPALTR), batched
    over the spectral grid."""
    from sbdart_tpu.solver.albtrn import slab_albedo_transmission

    dtype = dtype or (jnp.dtype(cfg.dtype) if cfg.dtype else default_dtype())
    if profile is None:
        profile = build_profile(cfg)
    wl = spectral_grid(cfg)
    nzen = int(cfg.nzen)
    if nzen <= 0:
        raise ValueError(
            "ibcnd=1 needs incidence angles: set nzen and uzen (degrees)"
        )
    uzen = np.array(cfg.uzen[:nzen], np.float64)
    umu = np.abs(np.cos(np.deg2rad(uzen)))
    nmom = cfg.nstr + 1
    deck = build_optical_deck(profile, cfg, wl, nmom, usrcld, aer_table)
    # gas k-terms: use the weighted-mean optical depth (ALBTRN is a
    # monochromatic slab property; k-weighting the albedo itself would mix
    # nonlinearly — the reference's mode is likewise gas-free in practice)
    dtau = np.einsum("wk,wkl->wl", deck.wk, deck.dtau)
    ssalb = np.einsum("wk,wkl->wl", deck.wk, deck.ssalb * deck.dtau) / np.maximum(
        dtau, 1e-30
    )
    albmed, trnmed = slab_albedo_transmission(
        jnp.asarray(dtau, dtype),
        jnp.asarray(np.clip(ssalb, 0.0, 1.0), dtype),
        jnp.asarray(deck.pmom, dtype),
        nstr=cfg.nstr,
        umu=jnp.asarray(umu, dtype),
        albedo=cfg.albcon,
        deltam=cfg.deltam,
        dtype=dtype,
    )
    return AlbTrnResult(
        cfg=cfg, profile=profile, wl=wl, umu=umu,
        albmed=np.asarray(albmed), trnmed=np.asarray(trnmed),
    )


def run_pipeline(
    cfg: Config,
    profile: Profile | None = None,
    chunk: int = DEFAULT_CHUNK,
    dtype=None,
    usrcld: np.ndarray | None = None,
    aer_table=None,
    albedo_table=None,
    solar_user=None,
    filter_user=None,
) -> SpectralResult:
    """Run the full spectral pipeline for one configuration/column."""
    if cfg.ibcnd == 1:
        raise ValueError(
            "ibcnd=1 is the albedo/transmission special mode: call "
            "run_albtrn(cfg) (the CLI dispatches automatically)"
        )
    dtype = dtype or (jnp.dtype(cfg.dtype) if cfg.dtype else default_dtype())
    if profile is None:
        profile = build_profile(cfg)
    profile = apply_cloud_humidity(profile, cfg)
    if cfg.tcloud[0] < 0 and usrcld is None:
        usrcld = load_usrcld_dat("usrcld.dat", profile.nlyr)

    wl = spectral_grid(cfg)
    nwl = len(wl)
    nlyr = profile.nlyr

    # radiance request?
    nzen = int(cfg.nzen)
    nphi = int(cfg.nphi)
    want_rad = cfg.iout in (5, 6, 20, 21, 22, 23) and nzen > 0
    onlyfl = not want_rad
    if want_rad and nphi == 0:
        nphi = 1
    uzen = np.array([u for u in cfg.uzen[:nzen]]) if want_rad else None
    phi = (
        np.array([p if p >= 0 else 0.0 for p in cfg.phi[:nphi]])
        if want_rad else None
    )
    umu = None
    if want_rad:
        umu = np.cos(np.deg2rad(uzen))
        umu = np.where(np.abs(umu) < 1e-4, 1e-4, umu)

    nmom = cfg.nstr + 1 if onlyfl else max(cfg.nstr + 1, 65)
    deck = build_optical_deck(profile, cfg, wl, nmom, usrcld, aer_table)
    nk = deck.wk.shape[1]

    # solar + surface spectra
    csza, solfac = solar_geometry(cfg)
    if cfg.nf == -1:
        if solar_user is None:
            d = np.loadtxt("solar.dat")
            solar_user = (d[:, 0], d[:, 1])
        e0 = np.interp(wl, solar_user[0], solar_user[1])
    else:
        e0 = solar_irradiance(wl, cfg.nf)
    filt = filter_function(cfg, wl, filter_user)
    fbeam = e0 * solfac                    # W/m^2/um at TOA
    alb = surface_albedo(cfg, wl, albedo_table)

    # thermal mask
    if cfg.nothrm == 0:
        thermal = np.ones(nwl, bool)
    elif cfg.nothrm == 1:
        thermal = np.zeros(nwl, bool)
    else:
        thermal = wl > THERMAL_WL_UM
    any_thermal = bool(thermal.any())
    wvnlo, wvnhi = _band_edges_wavenumber(wl)
    # band width in um: dlam = 1e4 / nu_lo - 1e4 / nu_hi
    band_dlam = 1.0e4 / wvnlo - 1.0e4 / wvnhi

    temper = profile.t                      # [nlev] TOA-first
    btemp = cfg.btemp if cfg.btemp > 0 else float(temper[-1])
    ttemp = cfg.ttemp if cfg.ttemp > 0 else float(temper[0])
    if cfg.spowder:
        # sub-surface powder slab (optics.py): one extra solver layer at
        # the surface temperature; outputs below the surface are dropped
        temper = np.concatenate([temper, [btemp]])

    solver = _jitted_solver(
        cfg.nstr, onlyfl, any_thermal, cfg.deltam, cfg.corint,
        0 if umu is None else len(umu), 0 if phi is None else len(phi),
        str(jnp.dtype(dtype)),
    )

    # output accumulators
    nlev = nlyr + 1
    fdir = np.zeros((nwl, nlev))
    fdn = np.zeros((nwl, nlev))
    fup = np.zeros((nwl, nlev))
    dfdt = np.zeros((nwl, nlev))
    uavg = np.zeros((nwl, nlev))
    uu = (
        np.zeros((nwl, nlev, len(umu), len(phi))) if want_rad else None
    )

    nchunk = -(-nwl // chunk)
    for ci in range(nchunk):
        s = ci * chunk
        e = min(s + chunk, nwl)
        idx = np.arange(s, e)
        if len(idx) < chunk:  # pad to keep one compiled shape
            idx = np.concatenate([idx, np.full(chunk - len(idx), nwl - 1)])
        sel = lambda a: a[idx]

        tmask = thermal[idx].astype(float)
        # thermal off -> temperatures ~0 => Planck == 0 (branchless mask)
        temper_c = np.where(
            tmask[:, None, None] > 0, temper[None, None, :], 1e-4
        )                                   # [chunk, 1, nlev]
        btemp_c = np.where(tmask > 0, btemp, 1e-4)[:, None]
        ttemp_c = np.where(tmask > 0, ttemp, 1e-4)[:, None]
        # Unit consistency for mixed solar+thermal samples: thermal output is
        # band-integrated, so feed the beam band-integrated too
        # (fbeam * dlam) and convert everything back to per-um at the end.
        fbeam_c = sel(fbeam) * np.where(tmask > 0, sel(band_dlam), 1.0)

        out = solver(
            jnp.asarray(sel(deck.dtau), dtype),
            jnp.asarray(sel(deck.ssalb), dtype),
            jnp.asarray(sel(deck.pmom)[:, None], dtype),
            jnp.asarray(fbeam_c[:, None] * (csza > 0), dtype),
            jnp.asarray(np.full((chunk, 1), csza), dtype),
            jnp.asarray(np.full((chunk, 1), cfg.phi0), dtype),
            jnp.asarray(np.full((chunk, 1), cfg.fisot), dtype),
            jnp.asarray(sel(alb)[:, None], dtype),
            jnp.asarray(temper_c, dtype),
            jnp.asarray(sel(wvnlo)[:, None], dtype),
            jnp.asarray(sel(wvnhi)[:, None], dtype),
            jnp.asarray(btemp_c, dtype),
            jnp.asarray(ttemp_c, dtype),
            jnp.asarray(np.full((chunk, 1), cfg.temis), dtype),
            umu=None if umu is None else tuple(np.round(umu, 10)),
            phi=None if phi is None else tuple(np.round(phi, 10)),
        )

        wk = sel(deck.wk)                  # [chunk, nk]
        # thermal outputs are per band; convert to per-um spectral density
        conv = np.where(tmask > 0, 1.0 / sel(band_dlam), 1.0)[:, None]

        def acc(dst, field):
            v = np.asarray(field)          # [chunk, nk, nlev(+powder)]
            v = np.einsum("ck,ckv->cv", wk, v) * conv
            dst[s:e] = v[: e - s, :nlev]

        acc(fdir, out.rfldir)
        acc(fdn, out.rfldn)
        acc(fup, out.flup)
        acc(dfdt, out.dfdt)
        acc(uavg, out.uavg)
        if want_rad:
            v = np.asarray(out.uu)         # [chunk, nk, nlev, numu, nphi]
            v = np.einsum("ck,ckvup->cvup", wk, v) * conv[..., None, None]
            uu[s:e] = v[: e - s, :nlev]

    return SpectralResult(
        cfg=cfg, profile=profile, wl=wl, dwl=_trapz_weights(wl),
        fbeam_toa=fbeam * filt, filt=filt, csza=csza,
        fdir=fdir, fdn=fdn, fup=fup, dfdt=dfdt, uavg=uavg,
        uu=uu, umu=umu, phi=phi,
    )
