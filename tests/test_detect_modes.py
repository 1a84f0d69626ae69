"""Secondary detection modes: classifyEvents, utcSaves, fillZeros,
profiling hooks, threshold override."""
import os

import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import construct, profiling, util
from detex_tpu.data import fetcher as getdata


@pytest.fixture(scope="module")
def small_ss(synth_case, tmp_path_factory):
    """A ready SubSpace (manual thresholds: skips FAS for speed)."""
    wd = tmp_path_factory.mktemp("modes")
    os.chdir(wd)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(wd / "clust.pkl"), saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust,
                                  conDatFetcher=cfetch)
    ss.attachPickTimes(pksFile=synth_case["phaseKey"], defaultDuration=20)
    ss.SVD(selectCriteria=2, selectValue=0.9, threshold=0.5,
           useSingles=True)
    return ss, wd


def test_manual_threshold_applied(small_ss):
    ss, wd = small_ss
    for sta in ss.ssStations:
        assert (ss.subspaces[sta].Threshold == 0.5).all()
    for sta in ss.singStations:
        assert (ss.singles[sta].Threshold == 0.5).all()


def test_classify_events(small_ss, synth_case):
    """classifyEvents mode scans the event waveforms themselves and writes
    per-station EventCors pickles (reference detect.py:52-95)."""
    ss, wd = small_ss
    db = str(wd / "classify.db")
    profiling.reset()
    ss.detex(subspaceDB=db, classifyEvents=synth_case["templateKey"],
             estimateMags=False, useSingles=False)
    pkls = [f for f in os.listdir(".") if f.startswith("EventCors")]
    assert len(pkls) >= 1
    df = pd.read_pickle(pkls[0])
    assert {"Sta", "Name", "DS", "TimeStamp"}.issubset(df.columns)
    # training events projected onto their own subspace -> high DS rows
    assert df.DS.max() > 0.8


def test_utc_saves(small_ss, synth_case):
    ss, wd = small_ss
    cat = synth_case["cat"]
    t = cat.hidden[0]["time"]
    db = str(wd / "utcsave.db")
    if os.path.exists("UTCsaves.pkl"):
        os.remove("UTCsaves.pkl")
    ss.detex(subspaceDB=db, utcSaves=[t], estimateMags=False,
             useSingles=False)
    assert os.path.exists("UTCsaves.pkl")
    df = pd.read_pickle("UTCsaves.pkl")
    assert len(df) >= 1
    assert {"Station", "Name", "Threshold", "MPcon", "SSdetect"}.issubset(
        df.columns)
    # the saved DS vector must cover the requested time
    assert (df.TS1 <= t).all() and (df.TS2 >= t).all()


def test_profiling_hooks(small_ss):
    rep = profiling.report()
    assert len(rep) > 0
    assert "detect.ds_scan" in set(rep.stage)
    assert (rep.total_s >= 0).all()


def test_fas_stalta_fallback(small_ss):
    """An impossible STA/LTA limit rejects every chunk; FAS must drop the
    veto (reference fas.py:64-71) and still fit the null."""
    ss, wd = small_ss
    ss.getFAS(conDatNum=3, staltalimit=1e-9, recalc=True)
    for sta in ss.ssStations:
        for _, row in ss.subspaces[sta].iterrows():
            assert isinstance(row.FAS, dict)
            b = row.FAS["betadist"]
            assert 0 < b[0] and 0 < b[1]
            assert row.FAS["hist"].sum() > 0


def test_trigcon1_stalta_triggering(small_ss, synth_case):
    """trigCon=1 (STA/LTA of the DS) — a detex_tpu extension the reference
    rejects. STA/LTA triggering has its own staltaThreshold parameter (the
    DS Threshold column stays on the DS scale)."""
    ss, wd = small_ss
    db = str(wd / "tc1.db")
    ss.detex(subspaceDB=db, trigCon=1, triggerLTATime=60,
             triggerSTATime=2, estimateMags=False, useSingles=False,
             staltaThreshold=4.0)
    ssdf = util.loadSQLite(db, "ss_df")
    assert ssdf is not None and len(ssdf) >= 2
    # DS_STALTA column carries the trigger statistic
    assert (ssdf.DS_STALTA > 4.0).all()
    # the strongest STA/LTA triggers land on real events (high DS);
    # weaker ones may be relative bumps in quiet noise (expected for
    # STA/LTA triggering)
    assert ssdf.DS.max() > 0.5
    # DS thresholds untouched by the STA/LTA run
    for sta in ss.ssStations:
        assert (ss.subspaces[sta].Threshold == 0.5).all()


def test_trigcon1_requires_stalta_threshold(small_ss):
    ss, wd = small_ss
    with pytest.raises(Exception):
        ss.detex(subspaceDB=str(wd / "bad1.db"), trigCon=1,
                 triggerLTATime=60, triggerSTATime=2, useSingles=False)


def test_multiprocess_rejected(small_ss):
    """multiprocess=True hard-errors (reference subspace.py:1842-1845);
    parallelism is automatic via the device mesh."""
    ss, wd = small_ss
    with pytest.raises(Exception):
        ss.detex(subspaceDB=str(wd / "bad2.db"), multiprocess=True,
                 useSingles=False)


def test_norm_threshold_dist(small_ss):
    """thresholdDist='norm' uses the normal-null isf (legacy matched-filter
    trigCon 2/3 capability)."""
    import scipy.stats
    ss, wd = small_ss
    ss.SVD(selectCriteria=2, selectValue=0.9, conDatNum=3,
           useSingles=False, thresholdDist="norm", staltalimit=None)
    for sta in ss.ssStations:
        for _, row in ss.subspaces[sta].iterrows():
            mu, sigma = row.FAS["normdist"]
            want = scipy.stats.norm.isf(ss.Pf, mu, sigma)
            assert abs(row.Threshold - want) < 1e-9
            assert 0 < row.Threshold < 1


def test_fas_reverse_templates(small_ss):
    """Reverse-template null (Slinkard 2014) produces a comparable null
    distribution."""
    from detex_tpu import fas as _fas
    ss, wd = small_ss
    sta = ss.ssStations[0]
    res = _fas._initFAS(ss.subspaces[sta], 3, ss.clusters, ss.cfetcher,
                        staltalimit=None, reverseTemplates=True)
    assert len(res) == len(ss.subspaces[sta])
    for r in res:
        assert "betadist" in r and r["hist"].sum() > 0


def test_del_old_corrs_append(small_ss):
    """delOldCorrs=False appends to an existing database (reference
    subspace.py:1847-1854)."""
    ss, wd = small_ss
    db = str(wd / "append.db")
    ss.detex(subspaceDB=db, estimateMags=False, useSingles=False)
    n1 = len(util.loadSQLite(db, "ss_df"))
    ss.detex(subspaceDB=db, estimateMags=False, useSingles=False,
             delOldCorrs=False)
    n2 = len(util.loadSQLite(db, "ss_df"))
    assert n2 == 2 * n1
    ss.detex(subspaceDB=db, estimateMags=False, useSingles=False,
             delOldCorrs=True)
    n3 = len(util.loadSQLite(db, "ss_df"))
    assert n3 == n1


def test_subspace_plots_smoke(small_ss):
    ss, wd = small_ss
    assert isinstance(ss.plotFracEnergy(), list)
    assert isinstance(ss.plotAlignedEvents(), list)
    assert isinstance(ss.plotBasisVectors(), list)
    assert isinstance(ss.plotOffsetTimes(), list)
    ss.plotThresholds()  # draws only rows with FAS attached
    ss.printOffsets()


def test_detection_with_fillzeros(small_ss, synth_case):
    """fillZeros mode runs without STA/LTA and still detects."""
    ss, wd = small_ss
    db = str(wd / "fz.db")
    ss.detex(subspaceDB=db, fillZeros=True, estimateMags=True,
             useSingles=False)
    ssdf = util.loadSQLite(db, "ss_df")
    assert ssdf is not None and len(ssdf) > 0
    assert (ssdf.DS_STALTA == 0).all()


def test_classify_conbuff_trim(small_ss, synth_case):
    """classify-mode conBuff trim (reference _getConTrims detect.py:580-597,
    intended semantics): with conBuff shorter than the template duration the
    chunk tail is cut so buffer-region energy is not classified — observable
    through the utcSaves DS-vector length."""
    ss, wd = small_ss
    cat = synth_case["cat"]
    sr = cat.sr
    t = cat.events[0]["time"] + 3  # inside the first event's chunk
    fet = ss.clusters.fetcher
    old = fet.conBuff
    lens = {}
    try:
        # duration=20 s templates (lengthened slightly by the trim
        # quantization — compute the actual duration from SampleTrims):
        # conBuff=1000 -> no trim; conBuff=5 -> (dur - 5) s trimmed off
        # the tail
        row0 = next(iter(ss.subspaces.values())).iloc[0]
        nc_ = len(next(iter(row0.Channels.values())))
        dur = (row0.SampleTrims["Endtime"] -
               row0.SampleTrims["Starttime"]) / (sr * nc_)
        assert dur >= 20.0
        for label, buff in [("full", 1000.0), ("trimmed", 5.0)]:
            fet.conBuff = buff
            if os.path.exists("UTCsaves.pkl"):
                os.remove("UTCsaves.pkl")
            ss.detex(subspaceDB=str(wd / ("ct_%s.db" % label)),
                     classifyEvents=synth_case["templateKey"],
                     utcSaves=[t], estimateMags=False, useSingles=False)
            df = pd.read_pickle("UTCsaves.pkl")
            df = df.sort_values(["Station", "Name"]).reset_index(drop=True)
            lens[label] = len(df.iloc[0].SSdetect)
    finally:
        fet.conBuff = old
    assert lens["full"] - lens["trimmed"] == int((dur - 5.0) * sr)
