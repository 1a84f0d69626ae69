"""Fused forward-prep kernel (ops/pallas_kernels.fwd_prep_fold): framing +
forward CT block transforms + window stats in ONE Pallas pass, replacing
os_prep_batch_pair's XLA pipeline (whose rolling-stats piece alone measured
109 ms of the 201 ms subspace launch on device, round-4 profile). Must
match the XLA prep up to f32 summation-order differences, and the full
scan through it must match the XLA-prep scan."""
import numpy as np
import pytest

from detex_tpu.ops import ds as dsops
from detex_tpu.parallel import scan as pscan


@pytest.fixture()
def fp_env(monkeypatch):
    """Force the fused routing on CPU (kernels run in interpret mode)."""
    monkeypatch.setenv("DETEX_TPU_PALLAS", "1")
    monkeypatch.setenv("DETEX_TPU_MATMUL_FFT", "1")
    yield


NC = 3
BLK = 16384


def _bank(rng, S=3, D=4, n=1680, Lc=3 * 35000):
    U_list = []
    for s in range(S):
        d = D if s % 2 == 0 else max(1, D - 1)
        A = rng.standard_normal((d, n))
        q, _ = np.linalg.qr(A.T)
        U_list.append(np.ascontiguousarray(q[:, :d].T))
    bank = dsops.build_bank(U_list, NC, Lc, prefer_os=True, block_fft=BLK)
    assert bank.get("os") and bank["blk_fft"] == BLK
    return bank, U_list


def _prep_both(X, n_c):
    from detex_tpu.ops import dft as _dft
    assert dsops.fwd_prep_ok(n_c, NC, BLK)
    Fr_f, Fi_f, a_f, p_f = map(np.asarray, dsops.os_prep_batch_fused(
        X, n_c, NC, BLK))
    Fr_p, Fi_p, a_p, p_p = map(np.asarray, dsops.os_prep_batch_pair(
        X, n_c, NC, BLK))
    Rp = _dft.half_rp(BLK)
    return (Fr_f, Fi_f, a_f, p_f), (Fr_p, Fi_p, a_p, p_p), Rp


def _check_prep(X, n_c):
    B = X.shape[0]
    L_c = X.shape[1] // NC
    out_len, pad0, D0, W, m = dsops._os_geometry(L_c, n_c, BLK)
    (Fr_f, Fi_f, a_f, p_f), (Fr_p, Fi_p, a_p, p_p), Rp = _prep_both(X, n_c)
    # fused prep pads frames up to a multiple of PREP_STF
    assert Fr_f.shape[0] == B * NC and Fr_f.shape[1] >= m * Rp
    assert Fr_f.shape[1] % (Rp * 1) == 0
    # spectra: identical math (same packed CT dots), f32 rounding only
    assert np.allclose(Fr_f[:, :m * Rp], Fr_p, atol=2e-3)
    assert np.allclose(Fi_f[:, :m * Rp], Fi_p, atol=2e-3)
    # stats: tile-local prefix sums vs the global mean-centered cumsum
    assert np.allclose(a_f[:, :out_len], a_p, atol=1e-4)
    assert np.allclose(p_f[:, :out_len], p_p, rtol=1e-4, atol=1e-3)
    # pad region: a = 0, power = 1 (the XLA pad convention), never 0/NaN
    assert np.all(a_f[:, out_len:] == 0.0)
    assert np.all(p_f[:, out_len:] == 1.0)
    assert np.isfinite(a_f).all()


def test_fwd_prep_matches_xla_prep(fp_env):
    rng = np.random.default_rng(3)
    X = rng.standard_normal((2, 3 * 35000)).astype(np.float32)
    _check_prep(X, n_c=560)


def test_fwd_prep_pad0_zero(fp_env):
    """(n_c - 1) % 128 == 0 exercises the pad0 == 0 exclusive-cumsum
    branch of the kernel."""
    rng = np.random.default_rng(4)
    X = rng.standard_normal((1, 3 * 35000)).astype(np.float32)
    _check_prep(X, n_c=129)


def test_fwd_prep_scan_matches(fp_env, monkeypatch):
    """Full fused-kernel scan with the Pallas prep vs the XLA prep:
    hist/maxds/triggers must agree to f32 tolerances."""
    rng = np.random.default_rng(5)
    Lc = 3 * 35000
    bank, U_list = _bank(rng)
    st = pscan._bank_statics(bank, NC)
    assert dsops.spec_ds_mode(8, st["S"], bank["Dmax"], st["n_c"], NC,
                              BLK) == "sub"
    X = rng.standard_normal((8, Lc)).astype(np.float32)
    X[1, 6000:6000 + 1680] += 150.0 * np.asarray(U_list[0][0])
    lens = [Lc] * 8
    lens[3] = Lc - 3000
    X[3, lens[3]:] = 0.0
    th = np.full(3, 0.6, np.float32)
    before = dict(pscan.ROUTE_COUNTS)
    fused = list(map(np.asarray, pscan.scan_chunks(
        X, dict(bank), th, NC, buff_samps=250, max_trig=8,
        valid_lens=lens)))
    grew = {k: v for k, v in pscan.ROUTE_COUNTS.items()
            if v > before.get(k, 0)}
    assert any(k.endswith("+fusedprep") or "+fusedprep+" in k
               for k in grew), grew
    monkeypatch.setenv("DETEX_TPU_FUSED_PREP", "0")
    base = list(map(np.asarray, pscan.scan_chunks(
        X, dict(bank), th, NC, buff_samps=250, max_trig=8,
        valid_lens=lens)))
    hist_f, maxds_f, tidx_f, tval_f, tcnt_f = fused
    hist_b, maxds_b, tidx_b, tval_b, tcnt_b = base
    d = hist_f.astype(np.int64) - hist_b.astype(np.int64)
    assert np.abs(d).sum() <= 60          # edge-ULP bin moves only
    assert np.array_equal(hist_f.sum(axis=-1), hist_b.sum(axis=-1))
    assert np.allclose(maxds_f, maxds_b, atol=2e-5)
    assert np.array_equal(tidx_f, tidx_b)
    assert np.array_equal(tcnt_f, tcnt_b)
    m = tidx_f >= 0
    assert np.allclose(tval_f[m], tval_b[m], atol=2e-5)
    # planted event triggered, and the f64 oracle agrees
    assert tcnt_f[1, 0] >= 1
    ds64 = dsops.ds_numpy(np.asarray(X[1], np.float64), U_list[0], NC)
    assert abs(ds64.max() - maxds_f[1, 0]) < 2e-5


def test_fwd_prep_summary_only(fp_env):
    """calc_triggers=False through the fused prep (the production engine
    configuration: Pallas prep -> summary-only spec->DS kernel)."""
    rng = np.random.default_rng(6)
    bank, _ = _bank(rng)
    X = rng.standard_normal((8, 3 * 35000)).astype(np.float32)
    th = np.full(3, 0.6, np.float32)
    full = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                             max_trig=8)
    summ = pscan.scan_chunks(X, dict(bank), th, NC, buff_samps=250,
                             max_trig=8, calc_triggers=False)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(summ[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(summ[1]))
    assert np.asarray(summ[2]).shape[-1] == 0
