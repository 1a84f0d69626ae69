"""Detection without pick trims: arbitrary template lengths exercise the
multiplexed (non-demux) bank fallback through the batched engine."""
import os

import pytest

from detex_tpu import construct, util
from detex_tpu.data import fetcher as getdata


def test_detect_without_picks(synth_case, tmp_path):
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 40],
        fileName=str(tmp_path / "c.pkl"), saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust,
                                  conDatFetcher=cfetch)
    # no attachPickTimes: SVD warns and uses the full aligned waveforms,
    # whose length is set by alignment trims (not a multiple of nc in
    # general)
    ss.SVD(threshold=0.4, useSingles=False)
    for sta in ss.ssStations:
        assert ss.subspaces[sta].SVDdefined.all()
    db = str(tmp_path / "nopicks.db")
    ss.detex(subspaceDB=db, estimateMags=False, useSingles=False)
    ssdf = util.loadSQLite(db, "ss_df")
    # the planted repeats must still be detected
    assert ssdf is not None and len(ssdf) >= 2
    assert (ssdf.DS > 0.4).all()
