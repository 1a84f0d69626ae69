"""Fused spec->DS kernel (ops/pallas_kernels.spec_ds_fold): channel FMA +
half-spectrum CT inverse + finalize + mask + pyramid + histogram in one
pass. Must match the unfused fold path (itself gated on the f64 oracle)
with only float32 rounding differences; trigger indices exact.

The kernel needs blk_fft >= 16384 (n1 == 128), so chunks here are larger
than the other fold tests'."""
import os

import numpy as np
import pytest

from detex_tpu.ops import ds as dsops
from detex_tpu.parallel import scan as pscan


@pytest.fixture()
def specds_env(monkeypatch):
    """Force the fused routing on CPU (kernels run in interpret mode):
    matmul DFTs + pallas are both off-TPU opt-ins."""
    monkeypatch.setenv("DETEX_TPU_PALLAS", "1")
    monkeypatch.setenv("DETEX_TPU_MATMUL_FFT", "1")
    yield


NC = 3
N = 1680                      # multiplexed template length
LC = 3 * 35000                # chunk length (L_c = 35000 -> blk 16384)
BLK = 16384


def _bank(rng, S, D):
    U_list = []
    for s in range(S):
        d = D if s % 2 == 0 else max(1, D - 1)     # ragged -> d_mask
        A = rng.standard_normal((d, N))
        q, _ = np.linalg.qr(A.T)
        U_list.append(np.ascontiguousarray(q[:, :d].T))
    bank = dsops.build_bank(U_list, NC, LC, prefer_os=True, block_fft=BLK)
    assert bank.get("os") and bank["blk_fft"] == BLK
    return bank, U_list


def _scan_both(bank, X, th, valid_lens=None):
    """scan_chunks with the fused kernel on, then off (same fold path)."""
    fused = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                              max_trig=8, valid_lens=valid_lens)
    os.environ["DETEX_TPU_SPECDS"] = "0"
    try:
        base = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                                 max_trig=8, valid_lens=valid_lens)
    finally:
        os.environ.pop("DETEX_TPU_SPECDS", None)
    return map(np.asarray, fused), map(np.asarray, base)


def _check(fused, base):
    hist_f, maxds_f, tidx_f, tval_f, tcnt_f = fused
    hist_b, maxds_b, tidx_b, tval_b, tcnt_b = base
    # DS values differ ~1e-8 between pipelines: histogram counts may move
    # between adjacent bins for values within an edge ULP (a handful per
    # hundred thousand samples); row totals must be exact
    d = hist_f.astype(np.int64) - hist_b.astype(np.int64)
    # calibration: 18 moves observed across ~8.5M samples with the
    # packed-dot kernels (round 3c; was <= 16 with the unpacked dots)
    assert np.abs(d).sum() <= 40
    assert np.array_equal(hist_f.sum(axis=-1), hist_b.sum(axis=-1))
    assert np.allclose(maxds_f, maxds_b, atol=2e-5)
    assert np.array_equal(tidx_f, tidx_b)
    assert np.array_equal(tcnt_f, tcnt_b)
    m = tidx_f >= 0
    assert np.allclose(tval_f[m], tval_b[m], atol=2e-5)


def test_spec_ds_sub_mode(specds_env):
    """Small bank, B % 8 == 0 -> rows (template, chunk)."""
    rng = np.random.default_rng(7)
    bank, U_list = _bank(rng, S=3, D=4)
    st = pscan._bank_statics(bank, NC)
    assert dsops.spec_ds_mode(8, st["S"], bank["Dmax"], st["n_c"], NC,
                              BLK) == "sub"
    X = rng.standard_normal((8, LC)).astype(np.float32)
    X[1, 5001:5001 + N] += 150.0 * np.asarray(U_list[0][0])
    lens = [LC] * 8
    lens[3] = LC - 3000       # ragged chunk -> pad masking
    X[3, lens[3]:] = 0.0
    th = np.full(3, 0.6, np.float32)
    fused, base = _scan_both(bank, X, th, valid_lens=lens)
    fused = list(fused)
    _check(fused, list(base))
    # trigger actually fired on the planted event, and the f64 oracle
    # agrees with the fused maxds
    assert fused[4][1, 0] >= 1
    ds64 = dsops.ds_numpy(np.asarray(X[0], np.float64), U_list[0], NC)
    assert abs(ds64.max() - fused[1][0, 0]) < 2e-5


def test_spec_ds_net_mode_blocked(specds_env, monkeypatch):
    """Template-blocked bank -> rows (chunk, template) per block."""
    monkeypatch.setattr(pscan, "TEMPLATE_BLOCK", 16)
    rng = np.random.default_rng(8)
    bank, U_list = _bank(rng, S=40, D=2)
    st = pscan._bank_statics(bank, NC)
    assert dsops.spec_ds_mode(8, 16, bank["Dmax"], st["n_c"], NC,
                              BLK) == "net"
    X = rng.standard_normal((8, LC)).astype(np.float32)
    X[0, 9000:9000 + N] += 150.0 * np.asarray(U_list[17][0])
    th = np.full(40, 0.6, np.float32)
    fused, base = _scan_both(bank, X, th)
    fused = list(fused)
    _check(fused, list(base))
    assert fused[4][0, 17] >= 1


def test_spec_ds_net_mode_unblocked(specds_env):
    """S % 8 == 0 small bank -> net mode without blocking."""
    rng = np.random.default_rng(9)
    bank, U_list = _bank(rng, S=8, D=3)
    st = pscan._bank_statics(bank, NC)
    assert dsops.spec_ds_mode(4, st["S"], bank["Dmax"], st["n_c"], NC,
                              BLK) == "net"
    X = rng.standard_normal((4, LC)).astype(np.float32)
    th = np.full(8, 0.6, np.float32)
    fused, base = _scan_both(bank, X, th)
    _check(list(fused), list(base))


def test_spec_ds_summary_only(specds_env):
    """calc_triggers=False on the FUSED path: the VMEM-scratch accumulator
    variant (emit_ds=False — no HBM DS array) must reproduce the fused
    scan's hist/maxds exactly, with zero-capacity trigger outputs."""
    rng = np.random.default_rng(9)
    bank, U_list = _bank(rng, S=3, D=4)
    st = pscan._bank_statics(bank, NC)
    assert dsops.spec_ds_mode(8, st["S"], bank["Dmax"], st["n_c"], NC,
                              BLK) == "sub"
    X = rng.standard_normal((8, LC)).astype(np.float32)
    # plant at a multiple of NC so the event lands channel-aligned
    X[2, 9000:9000 + N] += 150.0 * np.asarray(U_list[1][0])
    th = np.full(3, 0.6, np.float32)
    full = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                             max_trig=8)
    summ = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                             max_trig=8, calc_triggers=False)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(summ[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(summ[1]))
    assert np.asarray(summ[2]).shape[-1] == 0
    # the planted event is visible in maxds (what the engine gates on)
    assert np.asarray(summ[1])[2, 1] > 0.6


def test_spec_ds_summary_only_blocked(specds_env, monkeypatch):
    """Summary-only on the template-BLOCKED fused path."""
    monkeypatch.setattr(pscan, "TEMPLATE_BLOCK", 16)
    rng = np.random.default_rng(10)
    bank, U_list = _bank(rng, S=24, D=2)
    X = rng.standard_normal((8, LC)).astype(np.float32)
    th = np.full(24, 0.6, np.float32)
    full = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                             max_trig=8)
    summ = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                             max_trig=8, calc_triggers=False)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(summ[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(summ[1]))
    assert np.asarray(summ[2]).shape[-1] == 0


@pytest.mark.parametrize("udtype,tol", [("bf16x2", 5e-5), ("bf16", 8e-3)])
def test_spec_ds_udtype_variants(specds_env, monkeypatch, udtype, tol):
    """U-spectra storage experiments (round-4 VERDICT #6): bf16 (half the
    streamed bytes, coarse) and bf16x2 (hi+lo split, ~f32 accuracy, same
    bytes) against the shipped f32 kernel. maxds must track within the
    documented tolerance; bf16x2 must also beat plain bf16 by >10x."""
    rng = np.random.default_rng(11)
    bank, U_list = _bank(rng, S=8, D=3)
    X = rng.standard_normal((4, LC)).astype(np.float32)
    X[1, 6000:6000 + N] += 150.0 * np.asarray(U_list[2][0])
    th = np.full(8, 0.6, np.float32)
    f32 = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                            max_trig=8)
    monkeypatch.setenv("DETEX_TPU_SPEC_UDTYPE", udtype)
    var = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                            max_trig=8)
    m_f = np.asarray(f32[1])
    m_v = np.asarray(var[1])
    err = np.abs(m_v - m_f).max()
    assert err < tol, f"{udtype} maxds err {err}"
    if udtype == "bf16x2":
        monkeypatch.setenv("DETEX_TPU_SPEC_UDTYPE", "bf16")
        coarse = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                                   max_trig=8)
        err_b = np.abs(np.asarray(coarse[1]) - m_f).max()
        assert err < err_b / 10
    # the planted detection survives either storage
    assert m_v[1, 2] > 0.6
