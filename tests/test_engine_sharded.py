"""
The production detection engine (_SSDetex) shards its chunk batches across
all local devices (8 virtual CPU devices here). The resulting SubSpace.db
must be row-identical to a forced single-device run — same detections, same
magnitudes, same histograms.
"""
import os

import pandas as pd
import pytest

from detex_tpu import construct, util
from detex_tpu.data import fetcher as getdata
from detex_tpu.parallel import scan as pscan


@pytest.fixture(scope="module")
def ss(synth_case, tmp_path_factory):
    wd = tmp_path_factory.mktemp("engine_mesh")
    os.chdir(wd)
    paths = synth_case
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=paths["eventDir"], filt=[1, 8, 2, True],
        stationKey=paths["stationKey"], templateKey=paths["templateKey"],
        trim=[10, 60], saveclust=False)
    cfetcher = getdata.DataFetcher("dir", directoryName=paths["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust, minEvents=2,
                                  conDatFetcher=cfetcher)
    ss.attachPickTimes(pksFile=paths["phaseKey"], defaultDuration=20)
    ss.SVD(selectCriteria=2, selectValue=0.9, conDatNum=4, useSingles=True,
           backupThreshold=0.25)
    return ss


def _rows(db, table):
    df = util.loadSQLite(db, table)
    if df is None:
        return pd.DataFrame()
    return df.sort_values(["Sta", "Name", "STMP"]).reset_index(drop=True)


def test_engine_mesh_detected(monkeypatch):
    import jax
    assert len(jax.devices()) >= 8
    monkeypatch.delenv("DETEX_TPU_MESH", raising=False)
    mesh = pscan.engine_mesh()
    assert mesh is not None and mesh.size >= 8
    monkeypatch.setenv("DETEX_TPU_MESH", "0")
    assert pscan.engine_mesh() is None


def test_engine_mesh_equivalence(ss, tmp_path, monkeypatch):
    db_mesh = str(tmp_path / "mesh.db")
    db_single = str(tmp_path / "single.db")
    # default path: engine shards over the 8 virtual devices
    monkeypatch.delenv("DETEX_TPU_MESH", raising=False)
    before = pscan._sharded_scan_fn.cache_info().currsize
    ss.detex(subspaceDB=db_mesh, useSingles=True, estimateMags=True,
             batchSize=8)
    assert pscan._sharded_scan_fn.cache_info().currsize > 0
    assert pscan._sharded_scan_fn.cache_info().currsize >= before
    # forced single-device path
    monkeypatch.setenv("DETEX_TPU_MESH", "0")
    ss.detex(subspaceDB=db_single, useSingles=True, estimateMags=True,
             batchSize=8)
    for table in ("ss_df", "sg_df"):
        a, b = _rows(db_mesh, table), _rows(db_single, table)
        assert len(a) == len(b)
        if len(a):
            pd.testing.assert_frame_equal(a, b)
    assert len(_rows(db_mesh, "ss_df")) > 0
    # histogram tables identical (psum merge == host sum)
    ha = util.loadSQLite(db_mesh, "ss_hist").sort_values(
        ["Sta", "Name"]).reset_index(drop=True)
    hb = util.loadSQLite(db_single, "ss_hist").sort_values(
        ["Sta", "Name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ha, hb)


def test_engine_mesh_odd_batch(ss, tmp_path, monkeypatch):
    """Batch sizes not divisible by the mesh size are padded with masked
    chunks; results must still match."""
    db_mesh = str(tmp_path / "mesh5.db")
    db_single = str(tmp_path / "single5.db")
    monkeypatch.delenv("DETEX_TPU_MESH", raising=False)
    ss.detex(subspaceDB=db_mesh, useSingles=False, estimateMags=False,
             batchSize=5)
    monkeypatch.setenv("DETEX_TPU_MESH", "0")
    ss.detex(subspaceDB=db_single, useSingles=False, estimateMags=False,
             batchSize=5)
    a, b = _rows(db_mesh, "ss_df"), _rows(db_single, "ss_df")
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b)
