"""Namelist loader + CLI + output-writer tests (the L5 user surface)."""

import subprocess
import sys

import numpy as np
import pytest

from sbdart_tpu.config import Config
from sbdart_tpu.namelist import loads_namelist


CANONICAL = """
 &INPUT
   idatm = 2
   wlinf = 0.55
   wlsup = 0.55
   sza = 30.0
   nstr = 4
   iout = 1
 /
"""


class TestNamelist:
    def test_canonical_example(self):
        cfg = loads_namelist(CANONICAL)
        assert cfg.idatm == 2 and cfg.sza == 30.0 and cfg.iout == 1
        assert cfg.wlinf == cfg.wlsup == 0.55

    def test_dollar_group_and_comments(self):
        cfg = loads_namelist("""
$INPUT
  idatm=4    ! subarctic summer
  tcloud = 10.0, 0, 0, 0, 0
  zcloud = 5.0 ! cloud at 5 km
$end
""")
        assert cfg.idatm == 4
        assert cfg.tcloud[0] == 10.0 and cfg.tcloud[1] == 0
        assert cfg.zcloud[0] == 5.0

    def test_repeat_counts(self):
        cfg = loads_namelist("&INPUT\n nre = 5*10.0\n/")
        assert cfg.nre == [10.0] * 5

    def test_logicals(self):
        cfg = loads_namelist("&INPUT\n deltam = .false.\n lamber = t\n/")
        assert cfg.deltam is False and cfg.lamber is True

    def test_indexed_assignment(self):
        cfg = loads_namelist("&INPUT\n uzen(2) = 30.0, 45.0\n/")
        assert cfg.uzen[1] == 30.0 and cfg.uzen[2] == 45.0

    def test_fortran_double_exponent(self):
        cfg = loads_namelist("&INPUT\n tbaer = 1.5d-1\n/")
        np.testing.assert_allclose(cfg.tbaer, 0.15)

    def test_unknown_variable_raises(self):
        with pytest.raises(ValueError, match="unknown"):
            loads_namelist("&INPUT\n bogus = 1\n/")

    def test_no_group_raises(self):
        with pytest.raises(ValueError, match="INPUT"):
            loads_namelist("sza = 10")

    def test_multiline_arrays(self):
        cfg = loads_namelist("""
&INPUT
  zcloud = 1.0, 2.0,
           3.0
  nstr = 8
/""")
        assert cfg.zcloud[:3] == [1.0, 2.0, 3.0]
        assert cfg.nstr == 8

    def test_validate(self):
        with pytest.raises(ValueError):
            Config(nstr=5).validate()
        with pytest.raises(ValueError):
            Config(wlinf=1.0, wlsup=0.5).validate()
        with pytest.raises(ValueError):
            Config(idatm=9).validate()


class TestCli:
    def test_cli_runs_canonical_input(self, tmp_path):
        inp = tmp_path / "INPUT"
        inp.write_text(CANONICAL)
        proc = subprocess.run(
            [sys.executable, "-m", "sbdart_tpu.cli", str(inp)],
            capture_output=True, text=True, timeout=560,
            env={
                **__import__("os").environ,
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": __import__("os").path.dirname(
                    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
                ),
            },
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [l for l in proc.stdout.splitlines() if l.strip()]
        # iout=1: header marker + one line per wavelength (one here)
        data = [l for l in lines if not l.startswith('"')]
        assert len(data) == 1
        vals = [float(v) for v in data[0].split()]
        assert len(vals) == 8
        assert vals[0] == 0.55            # wavelength
        assert vals[2] > 0                # topdn

    def test_cli_survives_unknown_platform_name(self, tmp_path):
        """A plugin backend alias that jax.config rejects (e.g. the axon
        PJRT plugin's name under this harness) must not crash the entry
        point: cli._init_backend falls back to automatic selection.  Uses a
        nonexistent platform name so the failure path runs everywhere."""
        inp = tmp_path / "INPUT"
        inp.write_text(CANONICAL)
        import os

        proc = subprocess.run(
            [sys.executable, "-m", "sbdart_tpu.cli", str(inp)],
            capture_output=True, text=True, timeout=560,
            env={
                **os.environ,
                "JAX_PLATFORMS": "definitely_not_a_backend",
                "PYTHONPATH": os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                ),
            },
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        data = [
            l for l in proc.stdout.splitlines() if l.strip()
            and not l.startswith('"')
        ]
        assert len(data) == 1 and float(data[0].split()[2]) > 0
