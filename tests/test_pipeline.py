"""
Golden end-to-end test — the hermetic analog of the reference's Case1
integration test (tests/test_cases/test_case1.py): synthetic data ->
createCluster -> createSubSpace -> attachPickTimes -> SVD -> detex() ->
detResults, asserting the planted (unlisted) events verify.
"""
import os

import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import construct, results, util
from detex_tpu.data import fetcher as getdata


@pytest.fixture(scope="module")
def pipeline(synth_case, tmp_path_factory):
    """Run the whole pipeline once; tests inspect each stage."""
    wd = tmp_path_factory.mktemp("pipe")
    os.chdir(wd)
    paths = synth_case
    out = {"paths": paths}
    out["clust"] = construct.createCluster(
        CCreq=0.5,
        fetch_arg=paths["eventDir"],
        filt=[1, 8, 2, True],
        stationKey=paths["stationKey"],
        templateKey=paths["templateKey"],
        trim=[10, 60],
        fileName=str(wd / "clust.pkl"),
        saveclust=True)
    cfetcher = getdata.DataFetcher("dir", directoryName=paths["conDir"])
    out["ss"] = construct.createSubSpace(
        Pf=1e-9, clust=out["clust"], minEvents=2, conDatFetcher=cfetcher)
    out["ss"].attachPickTimes(pksFile=paths["phaseKey"],
                              defaultDuration=20)
    out["ss"].SVD(selectCriteria=2, selectValue=0.9, conDatNum=4,
                  useSingles=True, backupThreshold=0.25)
    out["db"] = str(wd / "SubSpace.db")
    out["ss"].detex(subspaceDB=out["db"], useSingles=True,
                    estimateMags=True)
    out["res"] = results.detResults(
        requiredNumStations=2, veriBuffer=4, ssDB=out["db"],
        templateKey=paths["templateKey"], stationKey=paths["stationKey"],
        veriFile=paths["veriFile"], fetch=cfetcher)
    return out


def test_cluster_structure(pipeline):
    clust = pipeline["clust"]
    assert len(clust) == 2  # 2 stations
    for cl in clust.clusters:
        # 2 repeating sources must form 2 clusters; 1 single left over
        assert len(cl.clusts) == 2
        assert all(len(c) == 3 for c in cl.clusts)
        assert len(cl.singles) == 1


def test_cluster_pickle_roundtrip(pipeline):
    clust = pipeline["clust"]
    cl2 = util.loadClusters(clust.filename)
    assert len(cl2) == len(clust)
    assert cl2[0].clusts == clust[0].clusts


def test_update_req_cc(pipeline):
    clust = util.loadClusters(pipeline["clust"].filename)
    clust.updateReqCC(0.98)
    # at near-impossible CC nothing should cluster
    assert all(len(cl.clusts) <= 1 for cl in clust.clusters)


def test_subspace_constructed(pipeline):
    ss = pipeline["ss"]
    assert len(ss.ssStations) == 2
    for sta in ss.ssStations:
        df = ss.subspaces[sta]
        assert len(df) == 2
        for _, row in df.iterrows():
            assert row.SVDdefined
            assert isinstance(row.NumBasis, (int, np.integer))
            assert 0 < row.Threshold < 1
            assert "Starttime" in row.SampleTrims
            # aligned waveforms all share length
            lens = {len(v) for v in row.AlignedTD.values()}
            assert len(lens) == 1


def test_singles_have_thresholds(pipeline):
    ss = pipeline["ss"]
    for sta in ss.singStations:
        for _, row in ss.singles[sta].iterrows():
            assert 0 < row.Threshold < 1


def test_detection_db_schema(pipeline):
    db = pipeline["db"]
    assert os.path.exists(db)
    ssdf = util.loadSQLite(db, "ss_df")
    assert ssdf is not None and len(ssdf) > 0
    expected = {"DS", "DS_STALTA", "STMP", "Name", "Sta", "MSTAMPmin",
                "MSTAMPmax", "Mag", "SNR", "ProEnMag"}
    assert expected.issubset(ssdf.columns)
    assert (ssdf.DS <= 1.05).all()
    assert (ssdf.DS > 0).all()
    info = util.loadSQLite(db, "ss_info")
    assert {"Name", "Sta", "Events", "Threshold", "NumBasisUsed", "beta1",
            "beta2"}.issubset(info.columns)
    filt = util.loadSQLite(db, "filt_params")
    assert list(filt.iloc[0][["FREQMIN", "FREQMAX"]]) == [1, 8]
    hist = util.loadSQLite(db, "ss_hist")
    assert hist is not None and len(hist) > 1


def test_verified_detections(pipeline):
    """The parity gate: every hidden planted event must be detected and
    verified (analog of reference test_case1.py:474-479)."""
    res = pipeline["res"]
    cat = pipeline["paths"]["cat"]
    assert isinstance(res.Vers, pd.DataFrame)
    assert len(res.Vers) == len(cat.hidden)
    # auto detections: the training events themselves occur in the data
    assert len(res.Autos) >= 1


def test_detection_times_accurate(pipeline):
    """Verified detection windows must bracket the true origin times."""
    res = pipeline["res"]
    cat = pipeline["paths"]["cat"]
    hidden_times = sorted(e["time"] for e in cat.hidden)
    got = res.Vers.sort_values("MSTAMPmin")
    for t, (_, row) in zip(hidden_times, got.iterrows()):
        assert row.MSTAMPmin - 10 <= t <= row.MSTAMPmax + 10


def test_magnitudes_estimated(pipeline):
    res = pipeline["res"]
    mags = pd.to_numeric(res.Vers.Mag, errors="coerce")
    cat = pipeline["paths"]["cat"]
    true_mags = np.array(sorted(e["mag"] for e in cat.hidden))
    assert mags.notna().all()
    # magnitudes within a generous tolerance of planted values
    got = np.sort(mags.values)
    assert np.abs(got - true_mags).max() < 0.6


def test_write_detections(pipeline, tmp_path):
    res = pipeline["res"]
    eventDir = str(tmp_path / "NewEvents")
    tk = str(tmp_path / "NewTemplateKey.csv")
    res.writeDetections(eventDir=eventDir, temkeyPath=tk,
                        waveFormat="npz")
    assert os.path.exists(tk)
    newkey = pd.read_csv(tk)
    assert any(str(n).startswith("d") for n in newkey.NAME)
    assert os.path.exists(eventDir)
