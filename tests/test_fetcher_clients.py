"""
All four network-client loader paths (fdsn/'client', neic, uuss-shaped,
earthworm legacy+modern APIs) execute in CI via injected stand-in clients —
no network, no obspy (capability of reference getdata.py:672-751).
"""
import numpy as np
import pytest

import detex_tpu
from detex_tpu.core.stream import Stats, Stream, Trace
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.data.fetcher import DataFetcher

T0 = UTCDateTime("2009-04-01T00:00:00").timestamp


def _stream(net, sta, chans, start, end, sr=25.0):
    n = int((UTCDateTime(end).timestamp - UTCDateTime(start).timestamp) * sr)
    st = Stream()
    for ch in chans:
        rng = np.random.default_rng(abs(hash((sta, ch))) % (2 ** 31))
        st.append(Trace(rng.standard_normal(n) + 1.0,
                        Stats(dict(network=net, station=sta, channel=ch,
                                   sampling_rate=sr,
                                   starttime=UTCDateTime(start)))))
    return st


class FDSNStub(object):
    """Answers one comma-joined-channel request (fdsn get_waveforms API)."""

    def __init__(self):
        self.calls = []

    def get_waveforms(self, net, sta, loc, chan, t0, t1):
        self.calls.append((net, sta, loc, chan))
        assert "," in chan or "-" not in chan
        return _stream(net, sta, chan.split(","), t0, t1)


class NEICStub(object):
    """Answers one-channel-per-request calls (neic CWB API)."""

    def __init__(self, fail_channel=None):
        self.calls = []
        self.fail_channel = fail_channel

    def get_waveforms(self, net, sta, loc, chan, t0, t1):
        self.calls.append(chan)
        assert "," not in chan and "-" not in chan
        if chan == self.fail_channel:
            raise IOError("CWB down")
        return _stream(net, sta, [chan], t0, t1)


class EarthwormLegacyStub(object):
    """Only exposes the legacy getWaveform API."""

    def __init__(self):
        self.locs = []

    def getWaveform(self, net, sta, loc, chan, t0, t1):
        self.locs.append(loc)
        return _stream(net, sta, [chan], t0, t1)


def _fetch(method, client):
    return DataFetcher(method, client=client, removeResponse=False)


def test_unknown_method_rejected():
    with pytest.raises(detex_tpu.DetexError):
        DataFetcher("carrier-pigeon")


def test_client_methods_require_instance():
    for method in ("client", "neic", "ewave"):
        with pytest.raises(Exception):
            DataFetcher(method)


def test_fdsn_path():
    cli = FDSNStub()
    fet = _fetch("client", cli)
    st = fet.getStream(T0, T0 + 120, "TA", "S00", ["BHE", "BHN", "BHZ"],
                       "??")
    assert st is not None and len(st) == 3
    assert len(cli.calls) == 1
    assert cli.calls[0][3] == "BHE,BHN,BHZ"


def test_fdsn_dash_channel_string():
    cli = FDSNStub()
    fet = _fetch("client", cli)
    st = fet.getStream(T0, T0 + 120, "TA", "S00", "BHE-BHN", "??")
    assert st is not None and len(st) == 2


def test_neic_path_per_channel():
    cli = NEICStub()
    fet = _fetch("neic", cli)
    st = fet.getStream(T0, T0 + 120, "TA", "S00", ["BHE", "BHN", "BHZ"],
                       "??")
    assert st is not None and len(st) == 3
    assert cli.calls == ["BHE", "BHN", "BHZ"]


def test_neic_failure_returns_none():
    fet = _fetch("neic", NEICStub(fail_channel="BHN"))
    st = fet.getStream(T0, T0 + 120, "TA", "S00", ["BHE", "BHN"], "??")
    assert st is None


def test_earthworm_legacy_api_and_blank_loc():
    cli = EarthwormLegacyStub()
    fet = _fetch("ewave", cli)
    st = fet.getStream(T0, T0 + 120, "TA", "S00", ["BHE", "BHZ"], "??")
    assert st is not None and len(st) == 2
    # '*'/'?' location codes map to earthworm's '--'
    assert set(cli.locs) == {"--"}


def test_con_data_generator_through_fake_client(tmp_path):
    """getConData chunking works end to end over a client method."""
    import pandas as pd
    stakey = pd.DataFrame([dict(
        NETWORK="TA", STATION="S00",
        STARTTIME="2009-04-01T00-00-00", ENDTIME="2009-04-01T04-00-00",
        LAT=1, LON=1, ELEVATION=0, CHANNELS="BHE-BHN-BHZ")])
    fet = DataFetcher("client", client=FDSNStub(), removeResponse=False,
                      conDatDuration=3600, conBuff=120)
    chunks = list(fet.getConData(stakey, returnTimes=True))
    assert len(chunks) >= 4
    st, t1, t2 = chunks[0]
    assert len(st) == 3
    assert abs((t2.timestamp - t1.timestamp) - 3720) < 1
