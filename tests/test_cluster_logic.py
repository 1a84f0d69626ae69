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
