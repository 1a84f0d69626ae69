"""Cluster re-thresholding, hypoDD dt.cc writer, eventsOnAllStations."""
import os

import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import construct, util


def test_write_simple_hypodd_requires_enforce_origin(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c.pkl"), saveclust=False)
    with pytest.raises(detex_tpu.DetexError):
        clust.writeSimpleHypoDDInput(str(tmp_path / "dt.cc"))


def test_write_simple_hypodd_with_enforce_origin(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c2.pkl"), saveclust=False,
        enforceOrigin=True)
    out = str(tmp_path / "dt.cc")
    clust.writeSimpleHypoDDInput(out, minCC=0.5)
    txt = open(out).read()
    assert txt.count("#") >= 1          # at least one event-pair header
    lines = [x for x in txt.split("\n") if x and not x.startswith("#")]
    assert len(lines) >= 1
    parts = lines[0].split()
    assert parts[0].startswith("TA.")   # station
    float(parts[1])                      # lag seconds parses
    cc = float(parts[2])
    assert 0.5 <= cc <= 1.0
    assert parts[3] == "S"


def test_events_on_all_stations(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c3.pkl"), saveclust=False,
        eventsOnAllStations=True)
    # both stations see all events in the synthetic set
    assert len(clust) == 2
    assert len(clust[0].key) == len(clust[1].key)


def test_create_cluster_with_phases(synth_case, tmp_path):
    """phases param: trims reference the first pick instead of the origin
    (reference issue 25 / construct.py:93-97)."""
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[5, 30],
        fileName=str(tmp_path / "cp.pkl"), saveclust=False,
        phases=synth_case["phaseKey"])
    # same cluster structure as the origin-referenced run (arrivals are a
    # constant offset from origins in the synthetic data)
    for cl in clust.clusters:
        assert len(cl.clusts) == 2
        assert all(len(c) == 3 for c in cl.clusts)


def test_dendro_and_simmatrix_plots(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c4.pkl"), saveclust=False)
    f = str(tmp_path / "dend.png")
    clust[0].dendro(show=False, saveName=f)
    assert os.path.exists(f)
    mat = clust[0].simMatrix(returnMat=True)
    m = len(clust[0].key)
    assert mat.shape == (m, m)
    assert np.allclose(np.diag(mat), 1.0)
    assert (mat <= 1.0 + 1e-9).all()
    clust[0].plotEvents(show=False)
    clust.printAtr()


def test_update_req_cc_matches_manual_cover():
    """The fcluster-based re-threshold must produce the same cluster sets
    and ordering as a brute-force walk over the linkage rows (the
    reference's subset-cover semantics)."""
    from scipy.cluster.hierarchy import linkage
    from detex_tpu.subspace import Cluster

    rng = np.random.default_rng(3)
    for trial in range(20):
        m = int(rng.integers(4, 12))
        pts = rng.standard_normal((m, 2))
        # distances scaled into (0, 1) like 1 - CC dissimilarities
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        iu = np.triu_indices(m, 1)
        cond = d[iu] / (d.max() * 1.5)
        link = linkage(cond, method="single")
        ccReq = float(rng.uniform(0.3, 0.9))
        key = ["E%02d" % i for i in range(m)]
        cl = Cluster.__new__(Cluster)
        cl.link = link
        cl.key = key
        cl.station = "TA.TEST"
        cl.updateReqCC(ccReq)

        # brute-force: peel maximal merged sets off in descending top-link
        # height among rows <= 1 - ccReq
        thr = 1 - ccReq
        n = m
        sets = {i: [i] for i in range(m)}
        rows = []
        for i, (a, b, h, _c) in enumerate(link):
            sets[n + i] = sets[int(a)] + sets[int(b)]
            if h <= thr:
                rows.append((h, sorted(sets[n + i])))
        rows.sort(key=lambda r: -r[0])
        want, covered = [], set()
        for h, members in rows:
            if not set(members) <= covered:
                want.append([key[i] for i in sorted(members)])
                covered |= set(members)
        got = [sorted(c) for c in cl.clusts]
        assert got == [sorted(w) for w in want]
        assert sorted(cl.singles) == sorted(
            k for i, k in enumerate(key) if i not in covered)
        assert cl.clustcount == len(covered)


def test_approx_thld_matches_isf():
    """Where beta.isf works, the log-survival bisection agrees with it;
    where the null can't reach Pf, the backup threshold kicks in."""
    import scipy.stats
    from detex_tpu.subspace import SubSpace

    row = pd.Series({"Name": "SS0"})
    ss = SubSpace.__new__(SubSpace)
    for a, b, pf in [(2.0, 120.0, 1e-9), (1.5, 40.0, 1e-12),
                     (3.0, 300.0, 1e-6)]:
        want = scipy.stats.beta.isf(pf, a, b)
        got, pft = ss._approxThld(a, b, "TA.X", row, pf,
                                  backupThreshold=0.9)
        assert abs(got - want) < 1e-6
        assert abs(np.log(pft) - np.log(pf)) < 0.7
    # degenerate fit -> backup
    got, _ = ss._approxThld(np.nan, np.nan, "TA.X", row, 1e-9,
                            backupThreshold=0.42)
    assert got == 0.42
