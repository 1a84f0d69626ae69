"""Core Trace/Stream containers: trim/merge/split/filter/io."""
import numpy as np

from detex_tpu.core.stream import Stats, Stream, Trace
from detex_tpu.core.utc import UTCDateTime


def _tr(data, t0, sr=10.0, chan="BHZ"):
    return Trace(np.asarray(data, dtype=float),
                 Stats(dict(network="TA", station="S00", channel=chan,
                            sampling_rate=sr, starttime=UTCDateTime(t0))))


def test_utc_parsing():
    a = UTCDateTime("2009-04-01T12-30-05")
    b = UTCDateTime("2009-04-01T12:30:05")
    assert a == b
    assert a.year == 2009 and a.julday == 91 and a.hour == 12
    assert UTCDateTime(a.timestamp) == a
    assert (a + 60).minute == 31
    assert abs((b - a)) < 1e-9
    assert str(a).endswith("Z")


def test_trim_pad_and_slice():
    tr = _tr(np.arange(100), 1000.0)
    t = tr.copy().trim(UTCDateTime(1002.0), UTCDateTime(1004.0))
    assert len(t) == 21
    assert t.stats.starttime == UTCDateTime(1002.0)
    p = tr.copy().trim(UTCDateTime(999.0), UTCDateTime(1001.0), pad=True,
                       fill_value=0.0)
    assert len(p) == 21
    assert (p.data[:10] == 0).all()
    assert p.data[10] == 0  # original first sample is 0 too
    assert p.data[11] == 1


def test_merge_overwrite_and_split():
    a = _tr(np.ones(50), 1000.0)
    b = _tr(np.ones(50) * 2, 1010.0)  # gap of 50 samples (5 s at 10 Hz)
    st = Stream([a, b])
    st.merge(1)
    assert len(st) == 1
    assert np.isnan(st[0].data).sum() == 50
    parts = st.split()
    assert len(parts) == 2
    assert len(parts[0]) == 50 and len(parts[1]) == 50
    assert parts[1].stats.starttime == UTCDateTime(1010.0)


def test_merge_fill_value():
    a = _tr(np.ones(50), 1000.0)
    b = _tr(np.ones(50) * 2, 1010.0)
    st = Stream([a, b]).merge(1, fill_value=0.0)
    assert len(st) == 1
    assert (st[0].data[50:100] == 0).all()


def test_select_and_sort():
    st = Stream([_tr(np.ones(10), 0, chan="BHZ"),
                 _tr(np.ones(10), 0, chan="BHE"),
                 _tr(np.ones(10), 0, chan="BHN")])
    assert len(st.select(channel="BH?")) == 3
    assert len(st.select(component="Z")) == 1
    st.sort()
    assert [t.stats.channel for t in st] == ["BHE", "BHN", "BHZ"]


def test_filter_bandpass_removes_dc_and_high(rng):
    sr = 100.0
    t = np.arange(0, 30, 1 / sr)
    sig = (np.sin(2 * np.pi * 5 * t) + 3.0 +
           np.sin(2 * np.pi * 45 * t))
    tr = _tr(sig, 0.0, sr=sr)
    tr.filter("bandpass", freqmin=2, freqmax=10, corners=2, zerophase=True)
    spec = np.abs(np.fft.rfft(tr.data[500:-500]))
    freqs = np.fft.rfftfreq(len(tr.data[500:-500]), 1 / sr)
    in_band = spec[np.argmin(np.abs(freqs - 5))]
    out_band = spec[np.argmin(np.abs(freqs - 45))]
    dc = spec[0]
    assert in_band > 50 * out_band
    assert in_band > 50 * dc


def test_stream_io_roundtrip(tmp_path, rng):
    st = Stream([_tr(rng.standard_normal(100), 1234.5, chan=c)
                 for c in ("BHE", "BHN", "BHZ")])
    path = str(tmp_path / "wave.npz")
    st.write(path, "npz")
    from detex_tpu.data.waveio import read
    st2 = read(path)
    assert len(st2) == 3
    assert st2[0].stats.channel == "BHE"
    assert np.allclose(st2[2].data, st[2].data)
    assert st2[0].stats.starttime == st[0].stats.starttime


def test_get_gaps():
    a = _tr(np.ones(50), 1000.0)
    b = _tr(np.ones(50), 1010.0)
    gaps = Stream([a, b]).get_gaps()
    assert len(gaps) == 1
    assert abs(gaps[0][6] - 5.1) < 0.2
