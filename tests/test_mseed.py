"""Native miniSEED codec: round-trips, hand-built STEIM2 vectors, gap
splitting, waveio integration (no obspy required)."""
import struct

import numpy as np
import pytest

from detex_tpu import native
from detex_tpu.core.stream import Stream, Trace
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.data import mseed, waveio

pytestmark = pytest.mark.skipif(not mseed.available(),
                                reason="native library unavailable")


def _stream(rng, n=5000, sr=100.0, t0=1262304000.0, kind="int"):
    if kind == "int":
        data = np.cumsum(rng.integers(-300, 300, size=n)).astype(
            np.float64)
    else:
        data = rng.standard_normal(n)
    tr = Trace(data, header=dict(network="TA", station="S01",
                                 location="", channel="BHZ",
                                 sampling_rate=sr,
                                 starttime=UTCDateTime(t0)))
    return Stream(traces=[tr])


@pytest.mark.parametrize("enc", ["STEIM1", "STEIM2", "INT32",
                                 "FLOAT32", "FLOAT64"])
def test_roundtrip(rng, tmp_path, enc):
    st = _stream(rng, kind="int")
    p = str(tmp_path / ("x_%s.msd" % enc))
    mseed.write_mseed(st, p, encoding=enc, reclen=512)
    st2 = mseed.read_mseed(p)
    assert len(st2) == 1
    tr = st2[0]
    assert tr.stats.station == "S01" and tr.stats.channel == "BHZ"
    assert tr.stats.sampling_rate == 100.0
    assert abs(tr.stats.starttime.timestamp - 1262304000.0) < 1e-4
    assert len(tr.data) == len(st[0].data)
    assert np.array_equal(tr.data, st[0].data)


def test_roundtrip_float_lossless(rng, tmp_path):
    st = _stream(rng, kind="float")
    p = str(tmp_path / "f.msd")
    mseed.write_mseed(st, p, encoding="FLOAT64")
    st2 = mseed.read_mseed(p)
    assert np.array_equal(st2[0].data, st[0].data)


def test_big_steim1_multi_record(rng, tmp_path):
    # spans many 4096-byte records, wide dynamic range exercises
    # 8/16/32-bit diff packing
    n = 200000
    data = np.cumsum(rng.integers(-40000, 40000, size=n)).astype(
        np.float64)
    data[1000:1100] += 2 ** 28   # forces 32-bit diffs
    st = Stream(traces=[Trace(data, header=dict(
        network="UU", station="ABCDE", location="01", channel="EHZ",
        sampling_rate=40.0, starttime=UTCDateTime(1400000000.0)))])
    p = str(tmp_path / "big.msd")
    mseed.write_mseed(st, p, encoding="STEIM1")
    st2 = mseed.read_mseed(p)
    assert len(st2) == 1
    assert np.array_equal(st2[0].data, data)
    assert st2[0].stats.location == "01"


def test_big_steim2_multi_record(rng, tmp_path):
    """STEIM2 write support (round-trip through the reference-compatible
    decoder): exercises every packing class (7x4 .. 1x30 bit diffs)."""
    rng2 = np.random.default_rng(77)
    parts = [
        np.cumsum(rng2.integers(-6, 6, size=3000)),       # 4/5/6-bit
        np.cumsum(rng2.integers(-100, 100, size=3000)),   # 8/10-bit
        np.cumsum(rng2.integers(-12000, 12000, size=3000)),  # 15-bit
        np.cumsum(rng2.integers(-2 ** 27, 2 ** 27, size=300)),  # 30-bit
    ]
    data = np.concatenate(parts).astype(np.float64)
    st = Stream(traces=[Trace(data, header=dict(
        network="UU", station="S2", location="", channel="EHZ",
        sampling_rate=40.0, starttime=UTCDateTime(1400000000.0)))])
    p = str(tmp_path / "big2.msd")
    mseed.write_mseed(st, p, encoding="STEIM2", reclen=512)
    st2 = mseed.read_mseed(p)
    assert len(st2) == 1
    assert np.array_equal(st2[0].data, data)


def test_steim2_rejects_oversize_diffs(rng, tmp_path):
    """Diffs beyond STEIM2's 30-bit ceiling must raise, not corrupt."""
    data = np.zeros(100, np.float64)
    data[50] = 2 ** 30 + 5     # diff > 30-bit range
    st = Stream(traces=[Trace(data, header=dict(
        network="UU", station="S3", location="", channel="EHZ",
        sampling_rate=40.0, starttime=UTCDateTime(1400000000.0)))])
    p = str(tmp_path / "bad2.msd")
    with pytest.raises(ValueError):
        mseed.write_mseed(st, p, encoding="STEIM2")


def test_gap_splits_traces(rng, tmp_path):
    st = _stream(rng, n=3000)
    p1 = str(tmp_path / "a.msd")
    mseed.write_mseed(st, p1, encoding="STEIM1", reclen=512)
    # second segment 10 s later, same id
    st2 = _stream(rng, n=2000, t0=1262304000.0 + 3000 / 100.0 + 10.0)
    mseed.write_mseed(st2, str(tmp_path / "b.msd"), encoding="STEIM1",
                      reclen=512)
    buf = open(p1, "rb").read() + \
        open(str(tmp_path / "b.msd"), "rb").read()
    open(p1, "wb").write(buf)
    got = mseed.read_mseed(p1)
    assert len(got) == 2
    assert len(got[0].data) == 3000 and len(got[1].data) == 2000


def test_steim2_handbuilt_vector(tmp_path):
    """Decode a hand-assembled STEIM2 record: one frame with 30-bit,
    2x15-bit, 3x10-bit, 7x4-bit and 4x8-bit diff words."""
    x0 = 1000
    diffs = [0,                  # first diff (discarded, c=2/dnib=1 word)
             -5, 7,              # 2 x 15-bit
             100, -200, 300,     # 3 x 10-bit
             1, -2, 3, -4, 5, -6, 7,   # 7 x 4-bit
             120, -120, 99, -99]  # 4 x 8-bit
    samples = [x0]
    for d in diffs[1:]:
        samples.append(samples[-1] + d)
    words = []
    nibs = []
    # w1, w2: integration constants
    words += [x0 & 0xffffffff, samples[-1] & 0xffffffff]
    nibs += [0, 0]
    # w3: c=2, dnib=1, one 30-bit diff (the discarded first diff)
    words.append((1 << 30) | (diffs[0] & 0x3fffffff))
    nibs.append(2)
    # w4: c=2, dnib=2, two 15-bit
    words.append((2 << 30) | ((diffs[1] & 0x7fff) << 15) |
                 (diffs[2] & 0x7fff))
    nibs.append(2)
    # w5: c=2, dnib=3, three 10-bit
    words.append((3 << 30) | ((diffs[3] & 0x3ff) << 20) |
                 ((diffs[4] & 0x3ff) << 10) | (diffs[5] & 0x3ff))
    nibs.append(2)
    # w6: c=3, dnib=2, seven 4-bit
    w = 2 << 30
    for j, d in enumerate(diffs[6:13]):
        w |= (d & 0xf) << (4 * (6 - j))
    words.append(w)
    nibs.append(3)
    # w7: c=1, four 8-bit
    w = 0
    for d in diffs[13:17]:
        w = (w << 8) | (d & 0xff)
    words.append(w)
    nibs.append(1)
    # frame: w0 nibbles + 15 words
    while len(words) < 15:
        words.append(0)
        nibs.append(0)
    w0 = 0
    for j, c in enumerate(nibs):
        w0 |= c << (2 * (14 - j))
    frame = struct.pack(">16I", w0, *[w & 0xffffffff for w in words])
    hdr = struct.pack(
        ">6scc5s2s3s2sHHBBBxHHhhBBBBlHH",
        b"000001", b"D", b" ", b"TEST ", b"  ", b"BHZ", b"XX",
        2020, 100, 12, 30, 15, 0, len(samples), 50, 1, 0, 0, 0, 1, 0,
        64, 48)
    b1000 = struct.pack(">HHBBBx", 1000, 0, 11, 1, 9)  # STEIM2, 512B
    rec = hdr + b1000 + b"\x00" * (64 - len(hdr) - len(b1000)) + frame
    rec += b"\x00" * (512 - len(rec))
    p = str(tmp_path / "s2.msd")
    open(p, "wb").write(rec)
    st = mseed.read_mseed(p)
    assert len(st) == 1
    assert st[0].stats.station == "TEST"
    assert st[0].stats.sampling_rate == 50.0
    assert np.array_equal(st[0].data, np.asarray(samples, np.float64))


def test_waveio_integration(rng, tmp_path):
    """stream.write(format='mseed') + waveio.read round-trip (the
    reference's archive format, no obspy)."""
    st = _stream(rng, kind="int")
    p = str(tmp_path / "w.msd")
    st.write(p, format="mseed")
    got = waveio.read(p)
    assert got is not None and len(got) == 1
    assert np.array_equal(got[0].data, st[0].data)
    assert got[0].id == st[0].id


def test_mseed_directory_fetcher(rng, tmp_path):
    """An existing Detex-style miniSEED continuous directory indexes and
    serves through DataFetcher('dir') with no obspy — the drop-in
    archive-compatibility claim."""
    from detex_tpu.data import fetcher as getdata

    root = tmp_path / "ContinuousWaveForms" / "TA.S01" / "2010" / "001"
    root.mkdir(parents=True)
    t0 = UTCDateTime("2010-01-01T00:00:00").timestamp
    for h in range(2):          # two hour files x 3 channels
        trs = []
        for chan in ("BHE", "BHN", "BHZ"):
            data = np.cumsum(rng.integers(-50, 50, size=360000)).astype(
                np.float64)
            trs.append(Trace(data, header=dict(
                network="TA", station="S01", location="", channel=chan,
                sampling_rate=100.0,
                starttime=UTCDateTime(t0 + h * 3600.0))))
        mseed.write_mseed(Stream(traces=trs),
                          str(root / ("TA.S01.%03d.msd" % h)),
                          encoding="STEIM1")
    fet = getdata.DataFetcher(
        "dir", directoryName=str(tmp_path / "ContinuousWaveForms"),
        conDatDuration=3600, conBuff=120)
    st = fet.getStream(t0 + 1800, t0 + 5400, "TA", "S01",
                       ["BHE", "BHN", "BHZ"], "*")
    assert st is not None and len(st) == 3
    for tr in st:
        assert abs(tr.stats.starttime.timestamp - (t0 + 1800)) < 0.02
        assert len(tr.data) >= 3600 * 100 - 2


def test_float_write_is_lossless_by_default(rng, tmp_path):
    """Auto encoding must not quantize float waveforms (gain-corrected
    data); integral data still gets STEIM1 compression."""
    data = np.sin(np.arange(4000) * 0.01) * 0.7
    st = Stream(traces=[Trace(data, header=dict(
        network="TA", station="S01", location="", channel="BHZ",
        sampling_rate=100.0, starttime=UTCDateTime(1262304000.0)))])
    p = str(tmp_path / "fl.msd")
    st.write(p, format="mseed")
    got = waveio.read(p)
    assert np.abs(got[0].data - data).max() < 1e-12


def test_fractional_sample_rate_roundtrip(rng, tmp_path):
    """Non-integer rates use the SEED rational factor/multiplier form
    (previously silently written as round(sr), corrupting timing)."""
    st = _stream(rng, n=20000, sr=40.5)
    p = str(tmp_path / "sr.msd")
    mseed.write_mseed(st, p, encoding="STEIM1", reclen=512)
    got = mseed.read_mseed(p)
    assert len(got) == 1
    assert got[0].stats.sampling_rate == 40.5
    with pytest.raises(ValueError):
        mseed._rate_factors(np.pi)


def test_skips_unsupported_records(rng, tmp_path):
    """An ASCII LOG record in the middle of an archive (real data does
    this) must not abort the read."""
    st = _stream(rng, n=2000)
    p = str(tmp_path / "mix.msd")
    mseed.write_mseed(st, p, encoding="STEIM1", reclen=512)
    buf = open(p, "rb").read()
    # craft an ASCII (encoding 0) record and splice after the first one
    hdr = struct.pack(
        ">6scc5s2s3s2sHHBBBxHHhhBBBBlHH",
        b"000099", b"D", b" ", b"S01  ", b"  ", b"LOG", b"TA",
        2010, 1, 0, 0, 0, 0, 20, 0, 0, 0, 0, 0, 1, 0, 64, 48)
    b1000 = struct.pack(">HHBBBx", 1000, 0, 0, 1, 9)   # ASCII, 512B
    logrec = hdr + b1000 + b"\x00" * (64 - len(hdr) - len(b1000))
    logrec += b"detex log line".ljust(448, b"\x00")
    spliced = buf[:512] + logrec + buf[512:]
    open(p, "wb").write(spliced)
    got = mseed.read_mseed(p)
    assert len(got) == 1 and len(got[0].data) == 2000


def test_int16_and_little_endian_records(tmp_path):
    """Hand-built records cover the INT16 decoder and the byte-order
    detection (little-endian fields are legal miniSEED)."""
    samples = [100, -200, 300, -400, 32000, -32000]

    def rec(le):
        e = "<" if le else ">"
        hdr = struct.pack(
            e + "6scc5s2s3s2sHHBBBxHHhhBBBBlHH",
            b"000001", b"D", b" ", b"S02  ", b"  ", b"BHN", b"XX",
            2015, 200, 6, 7, 8, 1234, len(samples), 25, 1,
            0, 0, 0, 1, 0, 64, 48)
        b1000 = struct.pack(e + "HHBBBx", 1000, 0, 1,
                            0 if le else 1, 8)   # INT16, 256 B
        body = struct.pack(e + "%dh" % len(samples), *samples)
        r = hdr + b1000 + b"\x00" * (64 - len(hdr) - len(b1000)) + body
        return r + b"\x00" * (256 - len(r))

    for le in (False, True):
        p = str(tmp_path / ("i16_%d.msd" % le))
        open(p, "wb").write(rec(le))
        st = mseed.read_mseed(p)
        assert len(st) == 1, ("le", le)
        assert np.array_equal(st[0].data,
                              np.asarray(samples, np.float64)), ("le", le)
        assert st[0].stats.sampling_rate == 25.0
        # BTIME fract 1234 = 0.1234 s
        frac = st[0].stats.starttime.timestamp % 1
        assert abs(frac - 0.1234) < 1e-6
