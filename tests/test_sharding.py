"""Multi-device tests on the 8-way virtual CPU mesh: the sharded batch
driver (config-5 path), the band-axis collective, checkpoint/resume, and
consistency of sharded vs single-device results."""

import os

import numpy as np
import jax
import pytest

from sbdart_tpu.batch import ColumnBatch, run_batch
from sbdart_tpu.config import Config
from sbdart_tpu.pipeline import run_pipeline
from sbdart_tpu.outputs import integrate_spectral
from sbdart_tpu.sharding import make_mesh


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CFG = Config(idatm=2, wlinf=0.4, wlsup=0.7, wlinc=0.05, nstr=4, albcon=0.2)


def small_batch(n=16):
    rng = np.random.default_rng(0)
    return ColumnBatch(
        csza=rng.uniform(0.2, 1.0, n),
        gas_scale=rng.uniform(0.8, 1.2, n),
        albedo_scale=np.ones(n),
    )


class TestShardedBatch:
    def test_matches_pipeline_single_column(self):
        """Batch driver with trivial scales must match the serial pipeline."""
        b = ColumnBatch(csza=np.array([0.5] * 8), gas_scale=np.ones(8))
        res = run_batch(CFG, b, mesh=make_mesh(1), band_chunk=4)
        ref = run_pipeline(CFG.replace(sza=60.0))
        fdn_ref = integrate_spectral(ref, ref.fdir + ref.fdn)
        fdn_b = res.fdir[0] + res.fdn[0]
        np.testing.assert_allclose(fdn_b, fdn_ref, rtol=1e-6)
        np.testing.assert_allclose(
            res.fup[0], integrate_spectral(ref, ref.fup), rtol=1e-6
        )
        # all 8 identical columns agree (cross-device bit wobble allowed)
        assert np.max(np.abs(res.fup - res.fup[:1])) < 1e-9

    def test_band_sharding_matches_data_sharding(self):
        """2D (band x data) mesh with the psum collective == 1D data mesh."""
        b = small_batch(8)
        r1 = run_batch(CFG, b, mesh=make_mesh(1), band_chunk=2)
        r2 = run_batch(CFG, b, mesh=make_mesh(4), band_chunk=2)
        np.testing.assert_allclose(r1.fdn, r2.fdn, rtol=1e-10, atol=1e-9)
        np.testing.assert_allclose(r1.fup, r2.fup, rtol=1e-10, atol=1e-9)

    def test_perturbations_act(self):
        b = ColumnBatch(
            csza=np.array([0.8, 0.8, 0.8, 0.8] * 2),
            gas_scale=np.array([1.0, 3.0, 1.0, 3.0] * 2),
            albedo_scale=np.array([1.0, 1.0, 2.0, 2.0] * 2),
        )
        r = run_batch(CFG, b, mesh=make_mesh(1), band_chunk=4)
        # more gas -> less surface flux; higher albedo -> more upward
        assert r.fdn[1, -1] + r.fdir[1, -1] < r.fdn[0, -1] + r.fdir[0, -1]
        assert r.fup[2, 0] > r.fup[0, 0]

    def test_checkpoint_resume(self, tmp_path):
        b = small_batch(8)
        ck = str(tmp_path / "ck")
        r1 = run_batch(CFG, b, mesh=make_mesh(1), band_chunk=4,
                       col_chunk=4, checkpoint_dir=ck)
        files = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
        assert len(files) == 2
        # observability sidecar (run metadata) must also be written
        assert os.path.exists(os.path.join(ck, "run_metadata.json"))
        # resume must reuse shards (poison one file's values to prove reuse)
        poison = np.load(os.path.join(ck, files[0]))
        np.savez(os.path.join(ck, files[0]),
                 fdir=poison["fdir"] * 0 + 7.0,
                 fdn=poison["fdn"], fup=poison["fup"])
        r2 = run_batch(CFG, b, mesh=make_mesh(1), band_chunk=4,
                       col_chunk=4, checkpoint_dir=ck)
        np.testing.assert_allclose(r2.fdir[:4], 7.0)
        np.testing.assert_allclose(r2.fdn, r1.fdn)
