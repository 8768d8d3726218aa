"""Pod-scale batch driver: many columns x solar angles x the full spectrum.

This is the TPU-native replacement for what reference users do with shell
loops over INPUT files (SURVEY.md section 3, parallelism inventory), and the
implementation of BASELINE.json config 5 ("full 0.25-40 um sweep x 32 solar
zeniths x 10^5 perturbed columns, sharded over N hosts").

Design:
  * the nominal column's optical deck is built ONCE (host numpy);
  * per-column physics perturbations are SCALINGS applied inside jit —
    exact for the linear-in-amount parts (gas k-terms scale linearly in
    absorber amount by construction; cloud/aerosol optical depths scale
    linearly in burden);
  * one `shard_map`ped, jitted function runs the whole spectral loop as a
    `lax.scan` over band chunks with the column axis sharded over the mesh
    `data` axis and (optionally) the band-chunk axis over the `band` axis —
    the band-partial spectral integrals are `psum`med over `band`, the only
    collective in the program;
  * the host driver processes the global column set in column-chunks,
    checkpointing each finished chunk to `<ckpt>/cols_<lo>_<hi>.npz` and
    skipping already-present chunks on restart (the checkpoint/resume +
    failure-recovery design of SURVEY.md section 6.3/6.4 — jobs are
    re-runnable and idempotent per shard).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

log = logging.getLogger("sbdart_tpu.batch")

from sbdart_tpu.config import Config
from sbdart_tpu.dtypes import default_dtype
from sbdart_tpu.optics import build_optical_deck
from sbdart_tpu.pipeline import (
    THERMAL_WL_UM,
    _band_edges_wavenumber,
    _trapz_weights,
)
from sbdart_tpu.atmosphere import build_profile
from sbdart_tpu.clouds import apply_cloud_humidity
from sbdart_tpu.sharding import make_mesh, pad_to_multiple
from sbdart_tpu.solar import filter_function, solar_irradiance, spectral_grid
from sbdart_tpu.solver.disort import solve_rte
from sbdart_tpu.surface import surface_albedo


@dataclasses.dataclass
class ColumnBatch:
    """Per-column perturbation parameters (all shape [C])."""
    csza: np.ndarray
    gas_scale: np.ndarray | None = None
    h2o_scale: np.ndarray | None = None   # alias of gas_scale for clarity
    cld_scale: np.ndarray | None = None
    aer_scale: np.ndarray | None = None
    albedo_scale: np.ndarray | None = None

    def __post_init__(self):
        c = len(self.csza)
        ones = np.ones(c)
        if self.gas_scale is None:
            self.gas_scale = (
                self.h2o_scale if self.h2o_scale is not None else ones
            )
        if self.cld_scale is None:
            self.cld_scale = ones
        if self.aer_scale is None:
            self.aer_scale = ones
        if self.albedo_scale is None:
            self.albedo_scale = ones

    def __len__(self) -> int:
        return len(self.csza)

    def slice(self, lo: int, hi: int) -> "ColumnBatch":
        return ColumnBatch(
            csza=self.csza[lo:hi],
            gas_scale=self.gas_scale[lo:hi],
            cld_scale=self.cld_scale[lo:hi],
            aer_scale=self.aer_scale[lo:hi],
            albedo_scale=self.albedo_scale[lo:hi],
        )


@dataclasses.dataclass
class BatchResult:
    """Spectrally integrated fluxes per column [C, nlev]."""
    fdir: np.ndarray
    fdn: np.ndarray
    fup: np.ndarray
    csza: np.ndarray
    z: np.ndarray


def _stack_chunks(arrs: dict, nchunk: int, chunk: int) -> dict:
    """[nwl, ...] -> [nchunk, chunk, ...] with edge padding.

    Padded entries replicate the last band EXCEPT the integration weight
    `w_int`, which is zeroed so padding never contributes to integrals.
    """
    out = {}
    for k, a in arrs.items():
        n = a.shape[0]
        pad = nchunk * chunk - n
        if pad:
            tail = np.repeat(a[-1:], pad, axis=0)
            if k == "w_int":
                tail = np.zeros_like(tail)
            a = np.concatenate([a, tail], axis=0)
        out[k] = a.reshape((nchunk, chunk) + a.shape[1:])
    return out


def build_batch_fn(cfg: Config, *, band_chunk: int = 32, dtype=None,
                   mesh=None, profile=None):
    """Build (jitted_fn, static_data) for the sharded batched spectral solve.

    jitted_fn(params) -> (fdir, fdn, fup) each [C, nlev], spectrally
    integrated with the filter weighting.  `params` is a dict of [C] arrays.
    """
    dtype = dtype or default_dtype()
    if profile is None:
        profile = build_profile(cfg)
    profile = apply_cloud_humidity(profile, cfg)
    wl = spectral_grid(cfg)
    nmom = cfg.nstr + 1
    deck = build_optical_deck(profile, cfg, wl, nmom)

    e0 = solar_irradiance(wl, cfg.nf)
    filt = filter_function(cfg, wl)
    alb = surface_albedo(cfg, wl)
    w_int = filt * _trapz_weights(wl)

    thermal = (
        np.ones_like(wl, bool) if cfg.nothrm == 0
        else np.zeros_like(wl, bool) if cfg.nothrm == 1
        else wl > THERMAL_WL_UM
    )
    any_thermal = bool(thermal.any())
    wvnlo, wvnhi = _band_edges_wavenumber(wl)
    band_dlam = 1.0e4 / wvnlo - 1.0e4 / wvnhi

    # scattering components for in-jit recombination ([nwl, nlyr, nmom])
    from sbdart_tpu.rayleigh import rayleigh_moments
    mom_r = deck.tau_ray[..., None] * rayleigh_moments(nmom)
    # cloud & aerosol moment tensors need (w0, g) — from the producers
    from sbdart_tpu.clouds import cloud_optical_properties
    from sbdart_tpu.aerosols import aerosol_optical_properties
    from sbdart_tpu.optics import component_moments
    tau_c, w0_c, g_c = cloud_optical_properties(profile, cfg, wl)
    tau_a, w0_a, g_a = aerosol_optical_properties(profile, cfg, wl)
    pmaer = np.asarray([p for p in cfg.pmaer], np.float64)
    if cfg.imomc == 4:
        from sbdart_tpu.clouds import cloud_mie_moments

        mom_c = (w0_c * tau_c)[..., None] * cloud_mie_moments(
            profile, cfg, wl, nmom
        )
    else:
        mom_c = (w0_c * tau_c)[..., None] * component_moments(
            g_c, cfg.imomc, nmom
        )
    mom_a = (w0_a * tau_a)[..., None] * component_moments(
        g_a, cfg.imoma, nmom, user_moments=pmaer if pmaer.size else None
    )

    nwl = len(wl)
    nchunk = -(-nwl // band_chunk)
    stacked = _stack_chunks(
        dict(
            tau_ray=deck.tau_ray, tau_gas=deck.tau_gas, wk=deck.wk,
            tau_c=tau_c, scat_c=w0_c * tau_c, mom_c=mom_c,
            tau_a=tau_a, scat_a=w0_a * tau_a, mom_a=mom_a,
            mom_r=mom_r, alb=alb,
            fbeam=e0 * cfg.solfac, w_int=w_int,
            tmask=thermal.astype(np.float64),
            wvnlo=wvnlo, wvnhi=wvnhi, band_dlam=band_dlam,
        ),
        nchunk, band_chunk,
    )
    stacked = {k: jnp.asarray(v, dtype) for k, v in stacked.items()}

    temper = jnp.asarray(profile.t, dtype)
    btemp = cfg.btemp if cfg.btemp > 0 else float(profile.t[-1])
    nlev = profile.nlev

    if mesh is None:
        mesh = make_mesh(1)

    def column_solve(chunks, params):
        """One shard's spectral loop. params: dict of [C_local] arrays."""
        csza = params["csza"][:, None, None]               # [C,1,1]
        gs = params["gas_scale"][:, None, None, None]
        cs = params["cld_scale"][:, None, None]
        as_ = params["aer_scale"][:, None, None]
        albs = params["albedo_scale"][:, None, None]

        def per_chunk(acc, ch):
            # recombine optical properties [C, B, k, L]
            tau_ray = ch["tau_ray"][None, :, None, :]
            tau_gas = gs * ch["tau_gas"][None]
            tau_cld = cs[..., None] * ch["tau_c"][None, :, None, :]
            tau_aer = as_[..., None] * ch["tau_a"][None, :, None, :]
            dtau = tau_ray + tau_gas + tau_cld + tau_aer
            scat = (
                tau_ray
                + cs[..., None] * ch["scat_c"][None, :, None, :]
                + as_[..., None] * ch["scat_a"][None, :, None, :]
            )
            ssalb = jnp.clip(scat / jnp.maximum(dtau, 1e-30), 0.0, 1.0)
            mom = (
                ch["mom_r"][None, :, None]
                + cs[..., None, None] * ch["mom_c"][None, :, None]
                + as_[..., None, None] * ch["mom_a"][None, :, None]
            )
            pmom = mom / jnp.maximum(scat[..., None], 1e-30)
            pmom = pmom.at[..., 0].set(1.0)

            tmask = ch["tmask"][None, :, None]             # [1,B,1]
            fbeam = ch["fbeam"][None, :, None] * jnp.where(
                tmask > 0, ch["band_dlam"][None, :, None], 1.0
            )
            temper_c = jnp.where(tmask[..., None] > 0, temper, 1e-4)
            out = solve_rte(
                dtau, ssalb, pmom,
                nstr=cfg.nstr,
                fbeam=fbeam, umu0=csza, fisot=cfg.fisot,
                # perturbation scalings must not push albedo past 1
                albedo=jnp.clip(albs * ch["alb"][None, :, None], 0.0, 1.0),
                planck=any_thermal,
                temper=temper_c,
                wvnlo=ch["wvnlo"][None, :, None],
                wvnhi=ch["wvnhi"][None, :, None],
                btemp=jnp.where(tmask > 0, btemp, 1e-4),
                deltam=cfg.deltam, onlyfl=True, dtype=dtype,
            )
            conv = jnp.where(tmask > 0, 1.0 / ch["band_dlam"][None, :, None], 1.0)
            w = ch["w_int"][None, :, None] * conv * ch["wk"][None]
            f_dir = jnp.einsum("cbk,cbkv->cv", w, out.rfldir)
            f_dn = jnp.einsum("cbk,cbkv->cv", w, out.rfldn)
            f_up = jnp.einsum("cbk,cbkv->cv", w, out.flup)
            return (acc[0] + f_dir, acc[1] + f_dn, acc[2] + f_up), None

        # zero accumulators DERIVED from operands varying over BOTH mesh
        # axes (data via csza, band via the chunked band tables) so the
        # scan carry's varying-manual-axes check passes (check_vma=True)
        zero_band = (chunks["fbeam"].ravel()[0] * 0.0).astype(dtype)
        zero_cv = (
            (params["csza"][:, None] * 0.0).astype(dtype)
            + jnp.zeros((1, nlev), dtype)
            + zero_band
        )
        acc0 = tuple(zero_cv for _ in range(3))
        acc, _ = jax.lax.scan(per_chunk, acc0, chunks)
        # the only collective: band-partial integrals summed over 'band'
        acc = tuple(jax.lax.psum(a, "band") for a in acc)
        return acc

    names = ["albedo_scale", "aer_scale", "cld_scale", "csza", "gas_scale"]

    def unpack_and_solve(chunks, tree):
        p = {k: tree[i] for i, k in enumerate(names)}
        return column_solve(chunks, p)

    sharded = jax.shard_map(
        unpack_and_solve,
        mesh=mesh,
        in_specs=(P("band"), P(None, "data")),
        out_specs=P("data", None),
    )
    jitted = jax.jit(sharded)

    def prepare_and_run(params_np: dict) -> tuple:
        # stack params into one [P, C] array so the shard_map spec is simple
        tree = np.stack([np.asarray(params_np[k]) for k in names], axis=0)
        if jax.process_count() > 1:
            # multihost: `tree` holds THIS process's columns; assemble the
            # global sharded array from the per-process shards
            from jax.sharding import NamedSharding

            sharding = NamedSharding(mesh, P(None, "data"))
            tree = jax.make_array_from_process_local_data(
                sharding, tree.astype(dtype)
            )
        else:
            tree = jnp.asarray(tree, dtype)
        return jitted(stacked, tree)

    return prepare_and_run, dict(
        profile=profile, wl=wl, mesh=mesh,
        jitted=jitted, stacked=stacked, names=names, nlev=nlev,
    )


def _write_run_metadata(checkpoint_dir: str, cfg: Config, meta: dict,
                        n_cols: int, col_chunk: int) -> None:
    """Run-provenance record next to the checkpoints (aux subsystem 6.5)."""
    mesh = meta["mesh"]
    payload = {
        "started_unix": time.time(),
        "config": dataclasses.asdict(cfg),
        "n_columns": int(n_cols),
        "col_chunk": int(col_chunk),
        "n_wavelengths": int(len(meta["wl"])),
        "nlev": int(meta["profile"].nlev),
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
        "n_processes": jax.process_count(),
        "jax_version": jax.__version__,
    }
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "run_metadata.json"), "w") as fh:
        json.dump(payload, fh, indent=1, default=str)


def run_batch(
    cfg: Config,
    batch: ColumnBatch,
    *,
    mesh=None,
    band_chunk: int = 32,
    col_chunk: int = 1024,
    checkpoint_dir: str | None = None,
    dtype=None,
) -> BatchResult:
    """Run the full spectral sweep for a batch of perturbed columns."""
    if mesh is None:
        mesh = make_mesh(1)
    ndata = mesh.shape["data"]
    fn, meta = build_batch_fn(
        cfg, band_chunk=band_chunk, dtype=dtype, mesh=mesh
    )
    profile = meta["profile"]
    n = len(batch)
    nlev = profile.nlev
    fdir = np.zeros((n, nlev))
    fdn = np.zeros((n, nlev))
    fup = np.zeros((n, nlev))

    if checkpoint_dir and jax.process_index() == 0:
        _write_run_metadata(checkpoint_dir, cfg, meta, n, col_chunk)
    nchunks = -(-n // col_chunk)
    done = 0
    t_start = time.perf_counter()

    for lo in range(0, n, col_chunk):
        hi = min(lo + col_chunk, n)
        ck_path = (
            os.path.join(checkpoint_dir, f"cols_{lo}_{hi}.npz")
            if checkpoint_dir else None
        )
        if ck_path and os.path.exists(ck_path):
            with np.load(ck_path) as z:  # resume: skip finished shards
                fdir[lo:hi], fdn[lo:hi], fup[lo:hi] = z["fdir"], z["fdn"], z["fup"]
            done += 1
            log.info("chunk %d/%d cols %d-%d: restored from checkpoint",
                     done, nchunks, lo, hi)
            continue
        sl = batch.slice(lo, hi)
        params = dict(
            csza=sl.csza, gas_scale=sl.gas_scale, cld_scale=sl.cld_scale,
            aer_scale=sl.aer_scale, albedo_scale=sl.albedo_scale,
        )
        # pad the column axis to the data-mesh multiple
        npad = {k: pad_to_multiple(v, ndata)[0] for k, v in params.items()}
        a_dir, a_dn, a_up = fn(npad)
        m = hi - lo
        fdir[lo:hi] = np.asarray(a_dir)[:m]
        fdn[lo:hi] = np.asarray(a_dn)[:m]
        fup[lo:hi] = np.asarray(a_up)[:m]
        if ck_path:
            os.makedirs(checkpoint_dir, exist_ok=True)
            np.savez(ck_path, fdir=fdir[lo:hi], fdn=fdn[lo:hi], fup=fup[lo:hi])
        done += 1
        rate = (done * col_chunk) / max(time.perf_counter() - t_start, 1e-9)
        log.info("chunk %d/%d cols %d-%d done (%.1f cols/s)",
                 done, nchunks, lo, hi, rate)

    return BatchResult(fdir, fdn, fup, batch.csza, profile.z)
