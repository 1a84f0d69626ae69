"""Interactive picker (streamPick) driven headlessly, and the GUI-loop
consumers SubSpace.pickTimes / util.pickPhases with scripted pickers."""
import os

import numpy as np
import pandas as pd
import pytest

from detex_tpu import construct, util
from detex_tpu.data import fetcher as getdata
from detex_tpu.core.stream import Stream, Trace
from detex_tpu.streamPick import Pick, WaveformStreamID, streamPick


def _stream(stations=("S00",), channels=("BHZ", "BHN"), n=500, sr=25.0):
    rng = np.random.default_rng(7)
    trs = []
    for sta in stations:
        for ch in channels:
            d = rng.standard_normal(n)
            d[200:220] += 8.0  # an obvious onset
            trs.append(Trace(d, header=dict(network="TA", station=sta,
                                            channel=ch, sampling_rate=sr,
                                            starttime=1000.0)))
    return Stream(trs)


@pytest.fixture
def pick(tmp_path):
    os.chdir(tmp_path)  # .pick_filters writes land in tmp
    return streamPick(_stream(), show=False)


def test_requires_stream():
    with pytest.raises(ValueError):
        streamPick(Stream([]), show=False)


def test_pick_set_overwrite_and_remove(pick):
    pick.feed_key("q", xdata=200.0, channel="BHZ")
    assert len(pick._picks) == 1
    p = pick._picks[0]
    assert p.phase_hint == "P"
    # pick time = starttime + x * delta, both attr and item access
    assert abs(p.time.timestamp - (1000.0 + 200.0 / 25.0)) < 1e-9
    assert p["waveform_id"]["channel_code"] == "BHZ"
    assert p.waveform_id.station_code == "S00"
    assert p.polarity in ("positive", "negative", "undecideable")
    # same phase+channel overwrites in place (reference :331-340)
    pick.feed_key("q", xdata=100.0, channel="BHZ")
    assert len(pick._picks) == 1
    assert abs(pick._picks[0].time.timestamp - 1004.0) < 1e-9
    # different phase/channel appends
    pick.feed_key("w", xdata=300.0, channel="BHZ")
    pick.feed_key("a", xdata=260.0, channel="BHN")
    pick.feed_key("t", xdata=280.0, channel="BHN")
    assert {p.phase_hint for p in pick._picks} == {"P", "S", "Pend",
                                                   "Custom"}
    # 'r' deletes only the hovered channel's picks
    pick.feed_key("r", channel="BHN")
    assert {p.waveform_id.channel_code for p in pick._picks} == {"BHZ"}


def test_keepgoing_contract(pick):
    assert pick.KeepGoing is False
    pick.feed_key("v")  # finish stream -> caller's loop continues
    assert pick.KeepGoing is True
    assert pick._closed
    p2 = streamPick(_stream(), show=False)
    p2.feed_key("escape")  # abort -> KeepGoing stays False
    assert p2.KeepGoing is False and p2._closed


def test_key_event_through_matplotlib_canvas(pick):
    """End-to-end through the real mpl event pipeline: a KeyEvent placed
    inside the first axes must land a pick on that axes' channel."""
    from matplotlib.backend_bases import KeyEvent
    ax = pick.fig.get_axes()[0]
    x, y = ax.transData.transform((150.0, 0.0))
    KeyEvent("key_press_event", pick.fig.canvas, "q", x, y)._process()
    assert len(pick._picks) == 1
    assert pick._picks[0].waveform_id.channel_code == ax.channel
    assert abs(pick._picks[0].time.timestamp - (1000.0 + 150.0 / 25.0)) < .04


def test_station_cycle_and_display_keys(tmp_path):
    os.chdir(tmp_path)
    pk = streamPick(_stream(stations=("S00", "S01")), show=False,
                    bpfilter=[dict(freqmin=1.0, freqmax=8.0, corners=2,
                                   zerophase=True)])
    assert pk._current_stname == "S00"
    pk.feed_key("q", xdata=50.0, channel="BHZ")
    pk.feed_key("c")  # next station
    assert pk._current_stname == "S01"
    assert pk._getPicks() == []          # S00's pick not shown on S01
    pk.feed_key("q", xdata=60.0, channel="BHZ")
    assert len(pk._picks) == 2
    assert len(pk._getPicks()) == 1
    pk.feed_key("x")  # previous station
    assert pk._current_stname == "S00"
    # display-only keys must not crash or alter picks
    pk.feed_key("f")
    assert pk._filter_index == 0
    pk.feed_key("1")
    pk.feed_key("2")
    pk.feed_key("f")
    assert pk._filter_index is None
    assert len(pk._picks) == 2


class ScriptedPicker:
    """Headless picker stand-in: P at pick_at samples on the first trace,
    Pend 200 samples later."""
    keep_going = True
    pick_at = 104.0

    def __init__(self, st):
        tr = st[0]
        s = tr.stats
        wid = dict(network_code=s.network, station_code=s.station,
                   location_code=s.location, channel_code=s.channel)
        self._picks = [
            Pick(time=s.starttime + self.pick_at * s.delta, phase_hint="P",
                 waveform_id=WaveformStreamID(**wid)),
            Pick(time=s.starttime + (self.pick_at + 200) * s.delta,
                 phase_hint="Pend", waveform_id=WaveformStreamID(**wid)),
        ]
        self.KeepGoing = self.keep_going


def test_subspace_picktimes_scripted(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c.pkl"), saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust,
                                  conDatFetcher=cfetch)
    seen = []

    def factory(st):
        seen.append([tr.stats.channel for tr in st])
        return ScriptedPicker(st)

    ss.pickTimes(duration=20, pickerFactory=factory)
    assert seen, "picker never invoked"
    for sta, df in ss.subspaces.items():
        for _, row in df.iterrows():
            trims = row.SampleTrims
            _, _, Nc, Sr = ss._getStats(row)
            # picker timestamps are multiplexed samples; window snaps to a
            # channel-aligned sample and spans duration (ref :1384-1401)
            start = int(ScriptedPicker.pick_at)
            assert trims["Starttime"] == start - start % Nc
            # the window spans duration, rounded up to the template-
            # length quantum (subspace.TRIM_QUANTUM, round 5)
            from detex_tpu.subspace import TRIM_QUANTUM
            q = TRIM_QUANTUM * Nc
            want = -(-int(20 * Sr * Nc) // q) * q
            assert trims["Endtime"] == trims["Starttime"] + want
            assert trims["DurationSeconds"] == 20
            assert "P" in trims and "Pend" in trims
    # traces shown to the picker are the group events (channel=event name)
    assert all(ch and ch[0].startswith("2") for ch in seen)
    # offsets recomputed after trims attach
    for sta, df in ss.subspaces.items():
        for _, row in df.iterrows():
            assert all(np.isfinite(row.Offsets))


def test_subspace_picktimes_abort(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c2.pkl"), saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust,
                                  conDatFetcher=cfetch)
    calls = []

    def factory(st):
        calls.append(st)
        pk = ScriptedPicker(st)
        pk.KeepGoing = False  # user closed the window without 'v'
        return pk

    ss.pickTimes(duration=20, pickerFactory=factory)
    assert len(calls) == 1  # aborted after the first stream
    # the first group's picks were still saved before the abort
    saved = sum(bool(row.SampleTrims) for df in ss.subspaces.values()
                for _, row in df.iterrows())
    assert saved == 1


def test_pickphases_scripted(synth_case, tmp_path):
    os.chdir(tmp_path)
    out = str(tmp_path / "Picks.csv")
    df = util.pickPhases(fetch=synth_case["eventDir"],
                         templatekey=synth_case["templateKey"],
                         stationkey=synth_case["stationKey"],
                         pickFile=out, pickerFactory=ScriptedPicker)
    temkey = pd.read_csv(synth_case["templateKey"])
    stakey = pd.read_csv(synth_case["stationKey"])
    assert len(df) == 2 * len(temkey) * len(stakey)  # P + Pend each
    assert set(df.Phase) == {"P", "Pend"}
    assert set(df.columns) == {"TimeStamp", "Station", "Event", "Phase",
                               "Channel", "Seconds"}
    assert os.path.exists(out)
    # skipIfExists: a re-run picks nothing new
    df2 = util.pickPhases(fetch=synth_case["eventDir"],
                          templatekey=synth_case["templateKey"],
                          stationkey=synth_case["stationKey"],
                          pickFile=out, pickerFactory=ScriptedPicker)
    assert len(df2) == len(df)
    # pickTimes consumers downstream: the csv attaches as a phase file
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c3.pkl"), saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust,
                                  conDatFetcher=cfetch)
    ss.attachPickTimes(pksFile=out, defaultDuration=20)
    assert any(bool(row.SampleTrims) for df_ in ss.subspaces.values()
               for _, row in df_.iterrows())


def test_pickphases_abort_saves_progress(synth_case, tmp_path):
    os.chdir(tmp_path)
    out = str(tmp_path / "PicksAbort.csv")

    class AbortingPicker(ScriptedPicker):
        keep_going = False

    df = util.pickPhases(fetch=synth_case["eventDir"],
                         templatekey=synth_case["templateKey"],
                         stationkey=synth_case["stationKey"],
                         pickFile=out, pickerFactory=AbortingPicker)
    assert len(df) == 2  # one stream picked, then aborted — but saved
    assert os.path.exists(out)
