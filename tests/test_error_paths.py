"""Guarded error paths raise informative DetexErrors (the reference's
log-level='error' semantics)."""
import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import construct, streamPick
from detex_tpu.core.stream import Stats, Stream, Trace
from detex_tpu.core.utc import UTCDateTime


def test_check_cluster_inputs():
    with pytest.raises(detex_tpu.DetexError):
        construct._checkClusterInputs([1, 10], "double", [10, 120], None)
    with pytest.raises(detex_tpu.DetexError):
        construct._checkClusterInputs([1, 10, 2, True], "double",
                                      [-50, 20], None)
    with pytest.raises(TypeError):
        construct._checkClusterInputs([1, 10, 2, True], "double",
                                      [10, 120], 2.5)


def test_create_subspace_bad_clust():
    with pytest.raises(ValueError):
        construct.createSubSpace(clust=12345)


def test_multiplex_template_length_error():
    trs = []
    for i, ch in enumerate(["BHE", "BHN", "BHZ"]):
        n = 1000 if ch != "BHZ" else 900  # >15 samples off
        trs.append(Trace(np.zeros(n), Stats(dict(
            network="T", station="S", channel=ch, sampling_rate=10,
            starttime=UTCDateTime(0.0)))))
    with pytest.raises(detex_tpu.DetexError):
        construct.multiplex(Stream(trs), 3, template=True)
    # non-template mode warns and trims instead
    mp = construct.multiplex(Stream(trs), 3)
    assert len(mp) == 900 * 3


def test_detex_requires_svd(synth_case, tmp_path):
    import os
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        fileName=str(tmp_path / "c.pkl"), saveclust=False)
    from detex_tpu.data import fetcher as getdata
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust,
                                  conDatFetcher=cfetch)
    with pytest.raises(detex_tpu.DetexError):
        ss.detex(subspaceDB=str(tmp_path / "x.db"))


def test_svd_bad_selection():
    from detex_tpu.subspace import SubSpace
    ss = SubSpace({}, {}, None, "double", 1e-12, None)
    with pytest.raises(ValueError):
        ss.SVD(selectCriteria=2, selectValue=1.5)
    with pytest.raises(detex_tpu.DetexError):
        ss.SVD(selectCriteria=9)
    with pytest.raises(ValueError):
        ss.SVD(selectCriteria=4, selectValue=0.5)


def test_streampick_requires_stream():
    # reference contract: streamPick(None) raises (streamPick.py:55-57)
    with pytest.raises(ValueError):
        streamPick.streamPick()


def test_results_input_validation(tmp_path):
    from detex_tpu import results
    with pytest.raises(detex_tpu.DetexError):
        results._checkInputs(2, 0, 0, 1, 2)
    with pytest.raises(detex_tpu.DetexError):
        results._checkInputs(0, 5.0, 0, 1, 2)
    with pytest.raises(detex_tpu.DetexError):
        results._checkInputs(0, 0, -1, 1, 2)
    with pytest.raises(detex_tpu.DetexError):
        results._checkInputs(0, 0, 0, -1, 2)
    with pytest.raises(detex_tpu.DetexError):
        results._checkInputs(0, 0, 0, 1, 0)
    with pytest.raises(IOError):
        results.detResults(ssDB=str(tmp_path / "missing.db"))
