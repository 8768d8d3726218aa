"""iout output-format surface: every documented selector renders, with the
documented field ordering (SURVEY.md appendix A2; sbdart.f FORMAT blocks).

Byte-level parity with the Fortran FORMAT statements is deferred until the
reference mount is populated (SURVEY.md section 0); what is frozen HERE is
the column/row STRUCTURE: which fields, in which order, at which levels.
Round-3 settlements:
  * iout=5 radiance block is at zout TOP (TOA satellite products) and
    iout=6 at zout BOTTOM — the same top/bottom pairing as 20/21;
  * iout=23 renders the iout=10 line plus radiance blocks at BOTH zout
    levels (bottom, then top) — provisional, completes the 20/21 family.
"""

import numpy as np
import pytest

from sbdart_tpu.config import Config
from sbdart_tpu.outputs import format_iout, heating_rates, summary_fluxes
from sbdart_tpu.pipeline import run_pipeline


@pytest.fixture(scope="module")
def rad_result():
    """Small radiance-enabled spectral run shared across format tests."""
    cfg = Config(idatm=2, wlinf=0.55, wlsup=0.65, wlinc=0.05, nstr=8,
                 sza=30.0, albcon=0.2, nzen=2, uzen=[20.0, 60.0],
                 nphi=2, phi=[0.0, 90.0], iout=20)  # radiance-enabled run
    return run_pipeline(cfg)


def _with_iout(res, iout):
    import dataclasses

    return dataclasses.replace(res, cfg=res.cfg.replace(iout=iout))


def _lines(txt):
    return [ln for ln in txt.splitlines() if ln.strip()]


def test_iout1_fields(rad_result):
    txt = format_iout(_with_iout(rad_result, 1))
    lines = _lines(txt)
    assert lines[0].startswith('"tbf')
    rows = [np.fromstring(ln, sep=" ") for ln in lines[1:]]
    assert len(rows) == len(rad_result.wl)
    s = summary_fluxes(rad_result)
    for i, r in enumerate(rows):
        assert len(r) == 8
        # wl ffv topdn topup topdir botdn botup botdir
        assert r[0] == pytest.approx(rad_result.wl[i], rel=1e-4)
        assert r[2] == pytest.approx(float(s["topdn"][i]), rel=1e-3)
        assert r[6] == pytest.approx(float(s["botup"][i]), rel=1e-3)
        # Lambertian closure in the parsed columns: botup = albcon * botdn
        assert r[6] == pytest.approx(0.2 * r[5], rel=1e-3)


@pytest.mark.parametrize("iout", [5, 6])
def test_iout5_6_radiance_blocks(rad_result, iout):
    txt = format_iout(_with_iout(rad_result, iout))
    lines = _lines(txt)
    nwl = len(rad_result.wl)
    # per wavelength: flux row + (header, phi row, nzen rows)
    assert len(lines) == 1 + nwl * (1 + 1 + 1 + 2)
    hdr = lines[2].split()
    assert [int(hdr[0]), int(hdr[1])] == [2, 2]       # nphi nzen
    phi_row = np.fromstring(lines[3], sep=" ")
    np.testing.assert_allclose(phi_row, [0.0, 90.0])
    zen_row = np.fromstring(lines[4], sep=" ")
    assert zen_row[0] == pytest.approx(20.0, abs=0.1)  # uzen, then radiances
    assert len(zen_row) == 3
    # 5 = top level block, 6 = bottom level block: different radiances
    txt_other = format_iout(_with_iout(rad_result, 11 - iout))
    assert txt != txt_other


def test_iout7_profile_blocks(rad_result):
    txt = format_iout(_with_iout(rad_result, 7))
    lines = _lines(txt)
    nlev = rad_result.nlev
    hdr = lines[0].split()
    assert float(hdr[0]) == pytest.approx(rad_result.wl[0], rel=1e-4)
    assert int(hdr[1]) == nlev
    row = np.fromstring(lines[1], sep=" ")
    # z fdird fdifd flxdn flxup ; TOA first
    assert len(row) == 5
    assert row[0] == pytest.approx(rad_result.profile.z[0])
    assert row[3] == pytest.approx(row[1] + row[2], rel=1e-6)


def test_iout10_line(rad_result):
    txt = format_iout(_with_iout(rad_result, 10))
    row = np.fromstring(_lines(txt)[0], sep=" ")
    assert len(row) == 9
    assert row[0] == pytest.approx(rad_result.cfg.wlinf)
    assert row[1] == pytest.approx(rad_result.cfg.wlsup)
    # integrated Lambertian closure: botup = albcon * botdn
    assert row[7] == pytest.approx(0.2 * row[6], rel=1e-3)


def test_iout11_profile(rad_result):
    txt = format_iout(_with_iout(rad_result, 11))
    lines = _lines(txt)
    nlev = rad_result.nlev
    assert int(lines[0].split()[0]) == nlev
    rows = np.array([np.fromstring(ln, sep=" ") for ln in lines[1:]])
    assert rows.shape == (nlev, 7)
    # z p fxdn fxup fxdir dfdz heat — z TOA-first, p increasing downward
    np.testing.assert_allclose(rows[:, 0], rad_result.profile.z)
    assert (np.diff(rows[:, 1]) > 0).all()
    dfdz, heat = heating_rates(rad_result)
    assert rows[5, 6] == pytest.approx(float(heat[5]), rel=1e-3)


@pytest.mark.parametrize("iout,nblocks", [(20, 1), (21, 1), (23, 2)])
def test_iout20_21_23_blocks(rad_result, iout, nblocks):
    txt = format_iout(_with_iout(rad_result, iout))
    lines = _lines(txt)
    # 1 integrated line + nblocks * (header + phi + 2 zen rows)
    assert len(lines) == 1 + nblocks * 4
    assert len(np.fromstring(lines[0], sep=" ")) == 9
    hdr = lines[1].split()
    assert [int(hdr[0]), int(hdr[1])] == [2, 2]
    if iout == 23:
        # bottom block then top block; both parse and differ
        blk_bot = lines[1:5]
        blk_top = lines[5:9]
        assert blk_bot[1] == blk_top[1]       # same phi row
        assert blk_bot[2] != blk_top[2]       # different radiances
    # 20 (top) and 21 (bottom) render different blocks
    if iout in (20, 21):
        other = format_iout(_with_iout(rad_result, 41 - iout))
        assert txt != other


def test_iout22_per_level_blocks(rad_result):
    txt = format_iout(_with_iout(rad_result, 22))
    lines = _lines(txt)
    nlev = rad_result.nlev
    assert int(lines[0].split()[0]) == nlev
    # profile rows then nlev radiance blocks of 4 lines each
    assert len(lines) == 1 + nlev + nlev * 4


def test_unsupported_iout_raises(rad_result):
    with pytest.raises(ValueError, match="iout"):
        format_iout(_with_iout(rad_result, 99))
