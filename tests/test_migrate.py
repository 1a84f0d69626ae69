"""
Reference-pickle migration (reference subspace.py:261-267, 2018-2026;
util.py:934-969): pickles whose classes live under the original package's
paths (detex.subspace.*, detex.getdata.DataFetcher) load through
util.loadClusters/loadSubSpace and convert into working detex_tpu objects.

The fixtures hand-craft such pickles by temporarily registering stand-in
``detex`` modules, dumping reference-shaped instances (protocol 2, the
py2-era default), then unregistering the modules so only the migration
path can load them.
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest

from detex_tpu import construct, util
from detex_tpu.data import fetcher as getdata
from detex_tpu.subspace import ClusterStream, SubSpace


def _fake_detex_modules():
    det = types.ModuleType("detex")
    sub = types.ModuleType("detex.subspace")
    gd = types.ModuleType("detex.getdata")

    for name in ("ClusterStream", "Cluster", "SubSpace"):
        cls = type(name, (object,), {})
        cls.__module__ = "detex.subspace"
        setattr(sub, name, cls)
    DF = type("DataFetcher", (object,), {})
    DF.__module__ = "detex.getdata"
    gd.DataFetcher = DF

    def _loadDirectoryData(*a, **k):  # pickled by reference in fetchers
        return None
    _loadDirectoryData.__module__ = "detex.getdata"
    _loadDirectoryData.__qualname__ = "_loadDirectoryData"
    gd._loadDirectoryData = _loadDirectoryData

    det.subspace, det.getdata = sub, gd
    return {"detex": det, "detex.subspace": sub, "detex.getdata": gd}


def _ref_fetcher(mods, conDir):
    gd = mods["detex.getdata"]
    f = gd.DataFetcher.__new__(gd.DataFetcher)
    f.__dict__.update(dict(
        method="dir", client=None, removeResponse=False, inventoryArg=None,
        directoryName=conDir, opType="VEL", prefilt=[0.05, 0.1, 15, 20],
        conDatDuration=3600, conBuff=120, timeBeforeOrigin=60,
        timeAfterOrigin=240, checkData=True, fillZeros=False,
        _getStream=gd._loadDirectoryData))
    return f


@pytest.fixture(scope="module")
def built(synth_case, tmp_path_factory):
    wd = tmp_path_factory.mktemp("migrate")
    os.chdir(wd)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust, conDatFetcher=cfetch)
    ss.attachPickTimes(pksFile=synth_case["phaseKey"], defaultDuration=20)
    ss.SVD(selectCriteria=2, selectValue=0.9, threshold=0.5,
           useSingles=True)
    return clust, ss, wd


def _dump_reference_cluster(clust, mods, path, conDir):
    sub = mods["detex.subspace"]
    rcs = sub.ClusterStream.__new__(sub.ClusterStream)
    rcs.__dict__.update(dict(
        trdf=clust.trdf, temkey=clust.temkey, stakey=clust.stakey,
        fetcher=_ref_fetcher(mods, conDir), eventList=clust.eventList,
        ccReq=None, filt=clust.filt, decimate=clust.decimate,
        trim=clust.trim, fileName=clust.filename, filename=clust.filename,
        eventsOnAllStations=False, enforceOrigin=False,
        stalist=clust.stalist, stalist2=clust.stalist2))
    rcs.self = rcs  # the reference's locals()-update quirk
    rclusters = []
    for c in clust.clusters:
        rc = sub.Cluster.__new__(sub.Cluster)
        rc.__dict__.update(dict(
            link=c.link, DFcc=c.DFcc, station=c.station, temkey=c.temkey,
            key=list(c.key), trim=c.trim, decimate=c.decimate,
            nonClustColor="0.6", ccReq=c.ccReq, clusts=c.clusts,
            singles=c.singles, clustcount=c.clustcount))
        rclusters.append(rc)
    rcs.clusters = rclusters
    with open(path, "wb") as fh:
        pickle.dump(rcs, fh, protocol=2)
    return rcs


def test_reference_clusterstream_migrates(built, synth_case, tmp_path):
    clust, _ss, _wd = built
    mods = _fake_detex_modules()
    path = str(tmp_path / "ref_clust.pkl")
    sys.modules.update(mods)
    try:
        _dump_reference_cluster(clust, mods, path, synth_case["conDir"])
    finally:
        for k in mods:
            sys.modules.pop(k, None)
    # plain pickle.load must fail (no 'detex' package installed)...
    with pytest.raises((ModuleNotFoundError, ImportError)):
        with open(path, "rb") as fh:
            pickle.load(fh)
    # ...while the loader migrates transparently
    cl2 = util.loadClusters(path)
    assert isinstance(cl2, ClusterStream)
    assert cl2.stalist == clust.stalist
    for a, b in zip(cl2.clusters, clust.clusters):
        assert sorted(map(sorted, a.clusts)) == sorted(map(sorted, b.clusts))
        assert a.singles == b.singles
    # recompute-free re-threshold works on the migrated object
    cl2.updateReqCC(0.98)
    assert all(len(c.clusts) <= 1 for c in cl2.clusters)
    # the directory fetcher re-bound (conDir exists here)
    assert cl2.fetcher is not None
    assert cl2.fetcher.method == "dir"


def test_reference_subspace_migrates_and_detects(built, synth_case,
                                                 tmp_path):
    clust, ss, wd = built
    mods = _fake_detex_modules()
    sub = mods["detex.subspace"]
    path = str(tmp_path / "ref_ss.pkl")
    sys.modules.update(mods)
    try:
        rss = sub.SubSpace.__new__(sub.SubSpace)
        rcs = _dump_reference_cluster(clust, mods,
                                      str(tmp_path / "unused.pkl"),
                                      synth_case["conDir"])
        rss.__dict__.update(dict(
            cfetcher=_ref_fetcher(mods, synth_case["conDir"]),
            clusters=rcs, subspaces=ss.subspaces, singles=ss.singles,
            singletons=ss.singles, dtype=ss.dtype, Pf=ss.Pf,
            ssStations=ss.ssStations, singStations=ss.singStations,
            Stations=ss.Stations))
        with open(path, "wb") as fh:
            pickle.dump(rss, fh, protocol=2)
    finally:
        for k in mods:
            sys.modules.pop(k, None)
    ss2 = util.loadSubSpace(path)
    assert isinstance(ss2, SubSpace)
    assert ss2.ssStations == ss.ssStations
    assert ss2.Pf == ss.Pf
    # the migrated detector RUNS: full detection pass over the synthetic
    # continuous data emits the same rows as the native object
    db2 = str(tmp_path / "migrated.db")
    ss2.detex(subspaceDB=db2, estimateMags=False, useSingles=False)
    got = util.loadSQLite(db2, "ss_df")
    assert got is not None and len(got) > 0
    db1 = str(tmp_path / "native.db")
    ss.detex(subspaceDB=db1, estimateMags=False, useSingles=False)
    want = util.loadSQLite(db1, "ss_df")
    assert len(got) == len(want)
    g = got.sort_values(["Sta", "Name", "STMP"]).reset_index(drop=True)
    w = want.sort_values(["Sta", "Name", "STMP"]).reset_index(drop=True)
    assert np.allclose(g.DS, w.DS)
    assert np.allclose(g.STMP, w.STMP)
