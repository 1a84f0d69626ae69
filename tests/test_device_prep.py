"""Fused on-device preprocessing vs the host filter + DS oracle path."""
import numpy as np
import pytest

from detex_tpu.core.stream import Stats, Stream, Trace
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.construct import _applyFilter, multiplex
from detex_tpu.ops import ds as dsops
from detex_tpu.ops import prep


@pytest.fixture(scope="module")
def case(rng):
    sr = 25.0
    nc = 3
    dur = 600.0
    n_per = int(dur * sr)
    rng = np.random.default_rng(7)
    chans = rng.standard_normal((nc, n_per)) + 2.0
    # plant a band-limited event
    wav = np.convolve(rng.standard_normal(500), np.hanning(50), "same")
    for c in range(nc):
        chans[c, 5000:5500] += 5 * wav
    # add a linear trend (the detrend must remove it)
    chans += np.linspace(0, 10, n_per)[None, :]
    # template from the planted event (filtered like the host path would)
    filt = [1, 8, 2, True]
    st = Stream([Trace(chans[c].copy(), Stats(dict(
        network="TA", station="S", channel="BH" + "ENZ"[c],
        sampling_rate=sr, starttime=UTCDateTime(0.0))))
        for c in range(nc)])
    stf = _applyFilter(st.copy(), filt)
    mp_host = multiplex(stf, nc)
    tmpl = mp_host[5000 * nc - 150: 5000 * nc + 1350]
    U = (tmpl / np.linalg.norm(tmpl))[None, :]
    return dict(chans=chans, sr=sr, nc=nc, filt=filt, U=U,
                mp_host=mp_host)


def test_device_prep_matches_host_interior(case):
    """DS via fused device prep must match the host-filtered DS in the
    chunk interior (edges differ by circular-vs-linear filter transients)."""
    nc, sr = case["nc"], case["sr"]
    bank = dsops.build_bank([case["U"]], nc, len(case["mp_host"]))
    H = prep.butter_response(case["filt"], sr, bank["nfft2"])
    got = prep.run_bank_raw(case["chans"], bank, nc, H)[0]
    want = dsops.run_bank(case["mp_host"], bank, nc)[0]
    assert got.shape == want.shape
    # compare away from the chunk edges (filter transient region)
    edge = int(20 * sr)
    g = got[edge:-edge]
    w = want[edge:-edge]
    assert np.abs(g - w).max() < 5e-3
    # the planted event is found at the same place with the same DS
    assert abs(int(np.argmax(g)) - int(np.argmax(w))) <= 1
    assert g.max() > 0.8
    assert abs(g.max() - w.max()) < 1e-3


def test_device_prep_ragged_chunk(case):
    """Zero-padded ragged chunks: prep stats must ignore the pad region."""
    nc, sr = case["nc"], case["sr"]
    L_true = case["chans"].shape[1]
    bank = dsops.build_bank([case["U"]], nc, (L_true + 4000) * nc)
    H = prep.butter_response(case["filt"], sr, bank["nfft2"])
    got = prep.run_bank_raw(case["chans"], bank, nc, H)[0]
    want = dsops.run_bank(case["mp_host"], bank, nc)[0]
    assert got.shape[0] == want.shape[0]
    edge = int(20 * sr)
    assert np.abs(got[edge:-edge] - want[edge:-edge]).max() < 5e-3
