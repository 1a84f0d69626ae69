"""Pairwise xcorr kernel vs a float64 numpy oracle implementing the
reference _CCX2 math (construct.py:425-466) with modern pandas rolling."""
import numpy as np
import pandas as pd
import pytest

from detex_tpu.ops import xcorr


def ccx2_oracle(mptd1, mptd2, nc):
    """float64 oracle of the reference _CCX2 normalized xcorr."""
    n = len(mptd1)
    trunc = n // (2 * nc) - 1
    nfft = 2 ** int(2 * n).bit_length()
    mpfd1 = np.fft.fft(mptd1, nfft)
    mpfd2 = np.fft.fft(mptd2, nfft)
    padded = np.pad(mptd2.astype(np.float64), (n - 1, n - 1))
    a = pd.Series(padded).rolling(n).mean().values[n - 1:]
    b = pd.Series(padded).rolling(n).std().values[n - 1:]
    b = b * np.sqrt((n - 1.0) / n)
    c = np.real(np.fft.ifft(np.conj(mpfd1) * mpfd2))
    c1 = np.concatenate([c[-(n - 1):], c[:n]])
    with np.errstate(divide="ignore", invalid="ignore"):
        result = ((c1 - mptd1.sum() * a) / (n * b * np.std(mptd1)))
    result = result[nc - 1::nc]
    result = result[trunc:-trunc]
    maxcc = np.nanmax(result)
    maxind = np.nanargmax(result)
    return maxcc, (maxind + 1 + trunc) * nc - n, result


def _multiplexed_pair(rng, L=3000, nc=3, shift=30):
    """Two multiplexed traces where the second contains the first's signal
    shifted by ``shift`` per-channel samples."""
    sig = rng.standard_normal(L // nc)
    base = np.zeros(L // nc)
    base[200:200 + 400] = np.hanning(400) * sig[:400]
    x1 = np.vstack([base + 0.05 * rng.standard_normal(L // nc)
                    for _ in range(nc)])
    rolled = np.roll(base, shift)
    x2 = np.vstack([rolled + 0.05 * rng.standard_normal(L // nc)
                    for _ in range(nc)])
    return x1.flatten(order="F"), x2.flatten(order="F")


@pytest.mark.parametrize("shift", [-40, 0, 25])
def test_ccx2_matches_oracle(rng, shift):
    mp1, mp2 = _multiplexed_pair(rng, shift=shift)
    cc, lag, sub = xcorr.ccx2(mp1, mp2, 3)
    occ, olag, _ = ccx2_oracle(mp1, mp2, 3)
    assert abs(cc - occ) < 2e-5
    assert lag == olag


def test_ccx2_recovers_planted_shift(rng):
    nc = 3
    shift = 37
    mp1, mp2 = _multiplexed_pair(rng, shift=shift)
    cc, lag, sub = xcorr.ccx2(mp1, mp2, nc)
    assert cc > 0.9
    # multiplexed-lag convention: per-channel shift * nc
    assert lag == shift * nc


def test_all_pairs_consistency(rng):
    nc = 3
    X = []
    mp1, _ = _multiplexed_pair(rng)
    for shift in [0, 10, -15, 33]:
        _, mp2 = _multiplexed_pair(rng, shift=shift)
        X.append(mp2)
    X = np.stack(X)
    cc, lag, sub = xcorr.xcorr_all_pairs(X, nc)
    # pairwise results must match single-pair kernel
    for i in range(4):
        for j in range(i + 1, 4):
            scc, slag, _ = xcorr.ccx2(X[i], X[j], nc)
            assert abs(cc[i, j] - scc) < 1e-6
            assert lag[i, j] == slag
    # lower triangle untouched
    assert np.isnan(cc[2, 1])


def test_normcorr_matches_oracle(rng):
    t = rng.standard_normal(200)
    s = np.concatenate([rng.standard_normal(300), t * 2.5 + 0.1,
                        rng.standard_normal(300)])
    got = xcorr.normcorr(t, s)
    # oracle: reference fast_normcorr (construct.py:469-483)
    n = len(t)
    nt = (t - np.mean(t)) / (np.std(t) * n)
    a = pd.Series(s).rolling(n).mean().values[n - 1:]
    b = pd.Series(s).rolling(n).std().values[n - 1:] * \
        np.sqrt((n - 1.0) / n)
    c = np.convolve(nt[::-1], s, mode="valid")
    want = (c - nt.sum() * a) / b
    assert np.allclose(got, want, atol=2e-5)
    assert np.argmax(got) == 300
    assert got.max() > 0.999


def test_normcorr_bank_matches_single(rng):
    s = rng.standard_normal(2000)
    T = np.stack([s[100:400], s[500:800], rng.standard_normal(300)])
    bank = xcorr.normcorr_bank(T, s)
    for k in range(3):
        single = xcorr.normcorr(T[k], s)
        assert np.allclose(bank[k], single, atol=1e-6)
    assert np.argmax(bank[0]) == 100
    assert np.argmax(bank[1]) == 500
