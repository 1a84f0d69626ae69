"""Key reading, SQLite persistence, fetcher/index round trips."""
import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import util
from detex_tpu.data import fetcher as getdata
from detex_tpu.data.keys import readKey


def test_readKey_template(synth_case):
    df = readKey(synth_case["templateKey"], "template")
    assert {"TIME", "NAME", "LAT", "LON", "MAG", "DEPTH"}.issubset(df.columns)
    assert len(df) > 0


def test_readKey_station(synth_case):
    df = readKey(synth_case["stationKey"], "station")
    assert all(isinstance(x, str) for x in df.STATION)
    assert len(df) == 2


def test_readKey_bad_type(synth_case):
    with pytest.raises(detex_tpu.DetexError):
        readKey(synth_case["templateKey"], "bogus")


def test_readKey_missing_columns():
    df = pd.DataFrame({"TIME": [1], "NAME": ["a"]})
    with pytest.raises(detex_tpu.DetexError):
        readKey(df, "template")


def test_sqlite_roundtrip(tmp_path):
    db = str(tmp_path / "test.db")
    df = pd.DataFrame({"A": [1.5, 2.5], "B": ["x", "y"], "C": [1, 2]})
    util.saveSQLite(df, db, "tbl")
    util.saveSQLite(df, db, "tbl")  # append
    out = util.loadSQLite(db, "tbl")
    assert len(out) == 4
    assert out.A.dtype.kind == "f"
    sql = 'SELECT * FROM tbl WHERE A > 2'
    out2 = util.loadSQLite(db, "tbl", sql=sql)
    assert len(out2) == 2
    assert util.loadSQLite(db, "nope") is None
    assert util.loadSQLite(str(tmp_path / "no.db"), "tbl") is None


def test_index_and_dir_fetcher(synth_case):
    import os
    conDir = synth_case["conDir"]
    assert os.path.exists(os.path.join(conDir, ".index.db"))
    fet = getdata.DataFetcher("dir", directoryName=conDir)
    stakey = readKey(synth_case["stationKey"], "station")
    cat = synth_case["cat"]
    st = fet.getStream(cat.t0 + 100, cat.t0 + 500, "TA", "S00",
                       ["BHE", "BHN", "BHZ"], "*")
    assert st is not None
    assert len(st) == 3
    dur = st[0].stats.endtime - st[0].stats.starttime
    assert abs(dur - 400) < 1.0


def test_getConData_chunks(synth_case):
    fet = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    stakey = readKey(synth_case["stationKey"], "station")
    chunks = list(fet.getConData(stakey.iloc[0:1], returnTimes=True))
    assert len(chunks) >= 7
    st, t1, t2 = chunks[0]
    assert len(st) == 3


def test_getTemData(synth_case):
    fet = getdata.DataFetcher("dir", directoryName=synth_case["eventDir"])
    temkey = readKey(synth_case["templateKey"], "template")
    stakey = readKey(synth_case["stationKey"], "station")
    out = list(fet.getTemData(temkey, stakey.iloc[0:1], 10, 60,
                              returnName=True))
    assert len(out) == len(temkey)
    st, name = out[0]
    assert name in set(temkey.NAME)
    assert len(st) == 3


def test_quickFetch_errors(tmp_path):
    with pytest.raises(detex_tpu.DetexError):
        getdata.quickFetch(str(tmp_path / "missing_dir"))
    with pytest.raises(detex_tpu.DetexError):
        getdata.quickFetch("dir")


def test_divide_into_chunks_random_deterministic():
    from detex_tpu.core.utc import UTCDateTime
    u1, u2 = UTCDateTime(0.0), UTCDateTime(400 * 3600.0)
    a = [u.timestamp for u in
         getdata._divideIntoChunks(u1, u2, 3600, 10, seed=7)]
    b = [u.timestamp for u in
         getdata._divideIntoChunks(u1, u2, 3600, 10, seed=7)]
    assert a == b
    assert len(a) == 10
