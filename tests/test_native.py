"""Native C++ host library vs scipy oracles."""
import numpy as np
import pytest
from scipy import signal as sig

from detex_tpu import native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


def test_sosfilt_matches_scipy(have_native, rng):
    x = rng.standard_normal(5000)
    sos = sig.iirfilter(2, [0.05, 0.4], btype="band", ftype="butter",
                        output="sos")
    got = native.sosfilt(sos, x)
    want = sig.sosfilt(sos, x)
    assert np.allclose(got, want, atol=1e-10)


def test_sosfilt_zerophase(have_native, rng):
    x = rng.standard_normal(3000)
    sos = sig.iirfilter(2, [0.05, 0.4], btype="band", ftype="butter",
                        output="sos")
    got = native.sosfilt(sos, x, zerophase=True)
    want = sig.sosfilt(sos, sig.sosfilt(sos, x)[::-1])[::-1]
    assert np.allclose(got, want, atol=1e-10)


def test_detrend_matches_scipy(have_native, rng):
    x = rng.standard_normal(1000) + np.linspace(-5, 13, 1000)
    got = native.detrend_linear(x)
    want = sig.detrend(x, type="linear")
    assert np.allclose(got, want, atol=1e-8)


def test_interleave(have_native, rng):
    chans = rng.standard_normal((3, 100))
    got = native.interleave(chans)
    want = chans.flatten(order="F")
    assert (got == want).all()


def test_prep_chunk_fused(have_native, rng):
    chans = rng.standard_normal((3, 2000)) + 3.0
    sos = sig.iirfilter(2, [0.05, 0.4], btype="band", ftype="butter",
                        output="sos")
    got = native.prep_chunk(chans, sos, zerophase=True)
    want_ch = []
    for c in range(3):
        y = sig.detrend(chans[c], type="linear")
        y = sig.sosfilt(sos, sig.sosfilt(sos, y)[::-1])[::-1]
        want_ch.append(y)
    want = np.vstack(want_ch).flatten(order="F")
    assert np.allclose(got, want, atol=1e-8)


def test_rolling_std(have_native, rng):
    x = rng.standard_normal(500)
    import pandas as pd
    got = native.rolling_std(x, 50)
    want = pd.Series(x).rolling(50).std().values[49:]
    assert np.allclose(got, want, atol=1e-10)
