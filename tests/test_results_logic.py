"""Association-layer logic on synthetic detection tables: dedup, station
requirements, Pf re-threshold, exceptionalThreshold, auto vs new split."""
import os

import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import results, util

T0 = 1238544000.0  # 2009-04-01


def _mkdb(path, rows, info=None, table="ss_df"):
    cols = ["DS", "DS_STALTA", "STMP", "Name", "Sta", "MSTAMPmin",
            "MSTAMPmax", "Mag", "SNR", "ProEnMag"]
    df = pd.DataFrame(rows, columns=cols)
    util.saveSQLite(df, path, table)
    if info is not None:
        util.saveSQLite(info, path, "ss_info")
    return df


def _row(ds, t, name="SS0", sta="TA.S00", mag=1.0):
    return [ds, 1.0, t, name, sta, t - 3.0, t - 2.0, mag, 5.0, mag + 0.1]


@pytest.fixture()
def keys(tmp_path):
    temkey = pd.DataFrame([dict(
        TIME="2009-04-01T10-00-00", NAME="2009-04-01T10-00-00", LAT=40.0,
        LON=-111.0, MAG=1.0, DEPTH=5.0)])
    stakey = pd.DataFrame([
        dict(NETWORK="TA", STATION="S00", STARTTIME="2009-04-01T00-00-00",
             ENDTIME="2009-04-02T00-00-00", LAT=40, LON=-111, ELEVATION=0,
             CHANNELS="BHZ"),
        dict(NETWORK="TA", STATION="S01", STARTTIME="2009-04-01T00-00-00",
             ENDTIME="2009-04-02T00-00-00", LAT=40, LON=-111, ELEVATION=0,
             CHANNELS="BHZ")])
    tk = str(tmp_path / "tk.csv")
    sk = str(tmp_path / "sk.csv")
    temkey.to_csv(tk, index=False)
    stakey.to_csv(sk, index=False)
    return tk, sk, tmp_path


def test_dedup_keeps_max_ds(keys):
    tk, sk, tmp = keys
    db = str(tmp / "a.db")
    t = T0 + 7200
    _mkdb(db, [_row(0.5, t), _row(0.9, t + 0.5), _row(0.6, t + 1.0),
               _row(0.7, t + 500)])
    res = results.detResults(requiredNumStations=1, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None)
    # overlapping triple collapses to the 0.9 row; far row separate
    assert len(res.Dets) == 2
    assert abs(res.Dets.DSmax.max() - 0.9) < 1e-6


def test_required_num_stations(keys):
    tk, sk, tmp = keys
    db = str(tmp / "b.db")
    t = T0 + 7200
    _mkdb(db, [_row(0.8, t, sta="TA.S00"), _row(0.7, t + 0.2, sta="TA.S01"),
               _row(0.6, t + 5000, sta="TA.S00")])
    res = results.detResults(requiredNumStations=2, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None)
    assert len(res.Dets) == 1  # only the 2-station group survives
    assert res.Dets.iloc[0].NumStations == 2


def test_exceptional_threshold(keys):
    tk, sk, tmp = keys
    db = str(tmp / "c.db")
    t = T0 + 7200
    _mkdb(db, [_row(0.95, t, sta="TA.S00"), _row(0.4, t + 5000,
                                                 sta="TA.S00")])
    res = results.detResults(requiredNumStations=2, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None,
                             exceptionalThreshold=0.9)
    assert len(res.Dets) == 1
    assert abs(res.Dets.iloc[0].DSmax - 0.95) < 1e-6


def test_autodetection_classification(keys):
    tk, sk, tmp = keys
    db = str(tmp / "d.db")
    t_tem = T0 + 10 * 3600  # template origin 10:00
    _mkdb(db, [_row(0.99, t_tem + 2.5)])
    res = results.detResults(requiredNumStations=1, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None)
    assert len(res.Autos) == 1
    assert len(res.Dets) == 0
    assert res.Autos.iloc[0].Event == "2009-04-01T10-00-00"


def test_pf_rethreshold(keys):
    tk, sk, tmp = keys
    db = str(tmp / "e.db")
    t = T0 + 7200
    info = pd.DataFrame([dict(Name="SS0", Sta="TA.S00",
                              Events="a,b", Threshold=0.2,
                              NumBasisUsed=2, beta1=4.0, beta2=60.0)])
    _mkdb(db, [_row(0.15, t), _row(0.6, t + 5000)], info=info)
    # with a strict Pf the low-DS detection is filtered on load
    res = results.detResults(requiredNumStations=1, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None, Pf=1e-8)
    assert len(res.Dets) == 1
    assert abs(res.Dets.iloc[0].DSmax - 0.6) < 1e-6


def test_starttime_endtime_filters(keys):
    tk, sk, tmp = keys
    db = str(tmp / "f.db")
    _mkdb(db, [_row(0.8, T0 + 3600), _row(0.8, T0 + 50000)])
    res = results.detResults(requiredNumStations=1, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None,
                             starttime=T0, endtime=T0 + 10000)
    assert len(res.Dets) == 1


def test_singleton_table_routing_with_pf(keys):
    """Pf keys with 'SG' names must route to sg_df (reference
    results.py:347)."""
    tk, sk, tmp = keys
    db = str(tmp / "h.db")
    t = T0 + 7200
    _mkdb(db, [_row(0.7, t, name="SG0")], table="sg_df")
    info = pd.DataFrame([dict(Name="SG0", Sta="TA.S00", Events="a",
                              Threshold=0.2, beta1=4.0, beta2=60.0)])
    util.saveSQLite(info, db, "sg_info")
    res = results.detResults(requiredNumStations=1, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None, Pf=1e-8,
                             sg_associateBuffer=1)
    assert len(res.Dets) == 1
    assert abs(res.Dets.iloc[0].DSmax - 0.7) < 1e-6


def test_trigparameter_filter(keys):
    tk, sk, tmp = keys
    db = str(tmp / "g.db")
    _mkdb(db, [_row(0.3, T0 + 3600), _row(0.8, T0 + 50000)])
    res = results.detResults(requiredNumStations=1, ssDB=db, templateKey=tk,
                             stationKey=sk, fetch=None, trigParameter=0.5)
    assert len(res.Dets) == 1
    assert abs(res.Dets.iloc[0].DSmax - 0.8) < 1e-6
