"""Subspace detection-statistic kernel vs float64 oracle + physics checks."""
import numpy as np
import pytest

from detex_tpu.ops import ds as dsops


def _make_case(rng, nc=3, n_per_chan=200, dur_chans=4000, amp=3.0):
    """Continuous multiplexed data with one planted event and an orthonormal
    basis built from noisy copies of the event."""
    n = n_per_chan * nc
    wavelet = np.hanning(n_per_chan) * rng.standard_normal(n_per_chan)
    copies = []
    for _ in range(4):
        chans = [wavelet + 0.05 * rng.standard_normal(n_per_chan)
                 for _ in range(nc)]
        copies.append(np.vstack(chans).flatten(order="F"))
    A = np.vstack([c - c.mean() for c in copies])
    U_full, s, _ = np.linalg.svd(A.T, full_matrices=False)
    U = U_full[:, :2].T  # [2, n]
    data = 0.3 * rng.standard_normal(dur_chans * nc)
    pos = 1500  # per-channel sample position
    chans = data.reshape(dur_chans, nc).T.copy()  # de-multiplex view
    for c in range(nc):
        chans[c, pos:pos + n_per_chan] += amp * wavelet
    x = chans.T.flatten()  # re-multiplex (interleaved)
    return x, U, pos, n


def test_ds_single_matches_numpy_oracle(rng):
    x, U, pos, n = _make_case(rng)
    nc = 3
    nfft = 2 ** int(len(x) + n).bit_length()
    bank = dsops.make_bank([U], nfft)
    got = dsops.run_bank(x, bank, nc, nfft)[0]
    want = dsops.ds_numpy(x, U, nc)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2e-5


def test_ds_peak_at_planted_event(rng):
    x, U, pos, n = _make_case(rng, amp=5.0)
    nc = 3
    got = dsops.ds_numpy(x, U, nc)
    peak = np.argmax(got)
    assert abs(peak - pos) <= 2
    assert got[peak] > 0.8
    # off-peak null values are small
    off = np.delete(got, np.arange(pos - 300, pos + 300))
    assert np.median(off) < 0.1


def test_ds_affine_invariance(rng):
    """DS must be invariant to affine transforms of the data — the property
    the f32 standardization trick relies on."""
    x, U, pos, n = _make_case(rng)
    nc = 3
    nfft = 2 ** int(len(x) + n).bit_length()
    bank = dsops.make_bank([U], nfft)
    a = dsops.run_bank(x, bank, nc, nfft)[0]
    b = dsops.run_bank(x * 1234.5 + 77.7, bank, nc, nfft)[0]
    assert np.abs(a - b).max() < 2e-4


def test_ds_bank_matches_singles(rng):
    x, U1, _, n = _make_case(rng)
    _, U2, _, _ = _make_case(rng, amp=1.0)
    nc = 3
    nfft = 2 ** int(len(x) + n).bit_length()
    bank = dsops.make_bank([U1, U2[:1]], nfft)  # ragged D: 2 and 1
    got = dsops.run_bank(x, bank, nc, nfft)
    w1 = dsops.ds_numpy(x, U1, nc)
    w2 = dsops.ds_numpy(x, U2[:1], nc)
    assert np.abs(got[0] - w1).max() < 2e-5
    assert np.abs(got[1] - w2).max() < 2e-5


def test_ds_padded_equals_unpadded(rng):
    x, U, pos, n = _make_case(rng)
    nc = 3
    pad_len = len(x) + 5000
    nfft = 2 ** int(pad_len + n).bit_length()
    bank = dsops.make_bank([U], nfft)
    padded = dsops.run_bank(x, bank, nc, nfft, pad_len=pad_len)[0]
    plain = dsops.ds_numpy(x, U, nc)
    assert padded.shape == plain.shape
    assert np.abs(padded - plain).max() < 2e-4


def test_ds_demux_matches_oracle_planted(rng):
    """Demuxed (polyphase) kernel vs float64 oracle, with a planted event
    and a ragged (non-pad-length) chunk."""
    x, U, pos, n = _make_case(rng)
    nc = 3
    bank = dsops.build_bank([U], nc, len(x) + 777)
    assert bank.get("demux")
    got = dsops.run_bank(x, bank, nc)[0]
    want = dsops.ds_numpy(x, U, nc)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2e-5
    assert abs(int(np.argmax(got)) - pos) <= 2


def test_ds_upper_bound(rng):
    """With an orthonormal basis, DS stays <= ~1 (n/(n-1) normalization)."""
    x, U, pos, n = _make_case(rng, amp=8.0)
    got = dsops.ds_numpy(x, U, 3)
    assert got.max() <= 1.0 + 1e-6


def test_run_bank_rows_matches_run_bank(rng):
    """run_bank_rows (the engine's triggered-chunk re-verify path: one
    bank compute, row-sized transfers) must match full run_bank rows."""
    x, U, pos, n = _make_case(rng)
    nc = 3
    U2 = rng.standard_normal((1, n))
    U2 = U2 / np.linalg.norm(U2)
    bank = dsops.build_bank([U, U2], nc, len(x) + 777)
    full = dsops.run_bank(x, bank, nc)
    rows = dsops.run_bank_rows(x, bank, nc, [1, 0])
    assert sorted(rows) == [0, 1]
    for si in (0, 1):
        np.testing.assert_array_equal(rows[si], full[si])
    assert dsops.run_bank_rows(x, bank, nc, []) == {}
