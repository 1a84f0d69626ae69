"""
Utilities: SQLite persistence, object save/load, key re-exports, log reading,
and location-program writers (hypoDD, hypoInverse, NonLinLoc, KML).

SQLite schema and semantics mirror the reference (detex/util.py:870-931 and
detex/pandas_dbms.py) so downstream tooling written against Detex's
SubSpace.db keeps working.
"""
from __future__ import annotations

import os
import pickle
import sqlite3

import numpy as np
import pandas as pd

import detex_tpu
from detex_tpu.data.keys import readKey, req_columns  # noqa: F401  (re-export)
from detex_tpu.interop import (  # noqa: F401  (re-exports, ref util.py API)
    ANF2TemplateKey, EQSearch2TemplateKey, catalog2Templatekey,
    inventory2StationKey, makeHypoInversePhaseFile,
    makeHypoInverseStationFile, readANF, readHypo2000Sum, readHypo71Sum,
    templateKey2Catalog, writeHypoDDEventInput, writeHypoDDStationInput,
    writeKMLFromArcDF, writeKMLFromDF, writeKMLFromEQSearchSum,
    writeKMLFromHypDD, writeKMLFromHypInv, writeKMLFromStationKey,
    writeKMLFromTemplateKey, writeKMLfromHYPInput, writePhaseNLL)

# ---------------------------------------------------------------------------
# SQLite persistence (reference util.py:870-931)
# ---------------------------------------------------------------------------


def _sqlite_type(dtype):
    try:
        if np.issubdtype(dtype, np.integer):
            return "INTEGER"
        if np.issubdtype(dtype, np.floating):
            return "REAL"
    except TypeError:
        pass  # pandas extension dtypes (StringDtype etc.) -> TEXT
    return "TEXT"


def saveSQLite(df, dbPath, tableName, silent=True):
    """
    Append a DataFrame to a table of an SQLite database, creating the table
    if needed (reference util.py:870-894).
    """
    if df is None or len(df) == 0:
        return
    df = df.copy()
    # normalize non-numeric columns to str for storage
    for col in df.columns:
        if not pd.api.types.is_numeric_dtype(df[col]):
            df[col] = df[col].astype(str)
    con = sqlite3.connect(dbPath)
    try:
        cols = ", ".join('"%s" %s' % (c, _sqlite_type(df[c].dtype))
                         for c in df.columns)
        con.execute('CREATE TABLE IF NOT EXISTS "%s" (%s)' % (tableName, cols))
        placeholders = ", ".join(["?"] * len(df.columns))
        colnames = ", ".join('"%s"' % c for c in df.columns)
        rows = [tuple(_py(v) for v in row)
                for row in df.itertuples(index=False, name=None)]
        con.executemany('INSERT INTO "%s" (%s) VALUES (%s)'
                        % (tableName, colnames, placeholders), rows)
        con.commit()
    finally:
        con.close()


def _py(v):
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v


def loadSQLite(dbPath, tableName, sql=None, convertNumeric=True,
               silent=True):
    """
    Load a table (or the result of ``sql``) from an SQLite database into a
    DataFrame; returns None if the table/db does not exist
    (reference util.py:896-931).
    """
    if not os.path.exists(dbPath):
        if not silent:
            detex_tpu.log(__name__, "%s does not exist" % dbPath,
                          level="warning")
        return None
    if sql is None:
        sql = 'SELECT * FROM "%s"' % tableName
    con = sqlite3.connect(dbPath)
    try:
        try:
            df = pd.read_sql(sql, con)
        except Exception:
            if not silent:
                detex_tpu.log(__name__, "could not load table %s from %s"
                              % (tableName, dbPath), level="warning")
            return None
    finally:
        con.close()
    if convertNumeric:
        for col in df.columns:
            converted = pd.to_numeric(df[col], errors="coerce")
            if not converted.isna().all() and converted.notna().equals(
                    df[col].notna()):
                df[col] = converted
    return df


# ---------------------------------------------------------------------------
# Object save/load (reference util.py:934-969)
# ---------------------------------------------------------------------------


def _load_pickle(filename):
    """Load a detex_tpu pickle; pickles written by the original Detex
    package (class paths detex.subspace.* — reference subspace.py:261-267,
    2018-2026) are migrated via detex_tpu.migrate."""
    try:
        with open(filename, "rb") as fh:
            return pickle.load(fh)
    except (ModuleNotFoundError, ImportError, AttributeError,
            UnicodeDecodeError):
        from detex_tpu import migrate
        return migrate.load(filename)


def loadClusters(filename="clust.pkl"):
    """Load a pickled ClusterStream instance (reference pickles are
    auto-migrated)."""
    return _load_pickle(filename)


def loadSubSpace(filename="subspace.pkl"):
    """Load a pickled SubSpace instance (reference pickles are
    auto-migrated)."""
    return _load_pickle(filename)


def saveObject(obj, filename):
    with open(filename, "wb") as fh:
        pickle.dump(obj, fh)


# ---------------------------------------------------------------------------
# Phase picking (file-based; replaces the reference's PyQt4 GUI workflow,
# util.py:1006-1101 + streamPick.py)
# ---------------------------------------------------------------------------


def get_number_channels(st):
    """Number of unique channels in a single-station stream (reference
    util.py:992-1002)."""
    if len({tr.stats.station for tr in st}) > 1:
        detex_tpu.log(__name__, "function only takes streams with exactly "
                      "1 station", level="error")
    return len({tr.stats.channel for tr in st})


def seeWaveFroms(fetch="ContinuousWaveForms", templatekey="TemplateKey.csv",
                 stationkey="StationKey.csv", outFile="PhasePicks.csv",
                 **kwargs):
    """The reference's template browser over continuous data
    (util.py:1104-1190 — shipped non-functional: it reads undefined
    ``stationkey``/``pickFile`` variables). detex_tpu implements the
    intent: the same pick-GUI loop as :func:`pickPhases` fed from the
    continuous-data directory."""
    return pickPhases(fetch=fetch, templatekey=templatekey,
                      stationkey=stationkey, pickFile=outFile, **kwargs)


def pickPhases(fetch="EventWaveForms", templatekey="TemplateKey.csv",
               stationkey="StationKey.csv", pickFile="PhasePicks.csv",
               skipIfExists=True, pickerFactory=None, **kwargs):
    """
    Interactive phase picking over the template waveforms (reference
    util.py:1007-1101): each station/event stream opens in the matplotlib
    picker (detex_tpu.streamPick — q/a/w/s pick P/Pend/S/Send at the
    cursor, 'v' advances, escape aborts saving progress); picks append to
    ``pickFile`` (columns TimeStamp, Station, Event, Phase, Channel,
    Seconds), saved every 10 events and on abort.

    ``pickerFactory`` injects a scripted picker (callable ``stream ->
    obj`` with ``._picks``/``.KeepGoing``) for headless runs; the
    automatic alternative is :func:`autoPickPhases`.
    kwargs pass to ``quickFetch``.
    """
    from detex_tpu.data import fetcher as getdata
    if pickerFactory is None:
        from detex_tpu.streamPick import streamPick as pickerFactory
    temkey = readKey(templatekey, key_type="template")
    stakey = readKey(stationkey, key_type="station")
    cols = ["TimeStamp", "Station", "Event", "Phase", "Channel", "Seconds"]
    fetcher = getdata.quickFetch(fetch, **kwargs)
    ets = {}  # already-picked (station -> events) to skip
    rows = []
    if os.path.exists(pickFile):
        old = pd.read_csv(pickFile)
        if len(old) < 1:
            os.remove(pickFile)
        else:
            rows = old.to_dict("records")
            if skipIfExists:
                for _, r in old.iterrows():
                    ets.setdefault(r.Station, []).append(r.Event)

    def _save():
        df = pd.DataFrame(rows, columns=cols)
        df = df.sort_values(by=["Station", "Event"]).reset_index(drop=True)
        df.to_csv(pickFile, index=False)
        return df

    count = 0
    for st, event in fetcher.getTemData(temkey, stakey, skipDict=ets,
                                        returnName=True):
        if st is None or len(st) < 1:
            continue
        count += 1
        pks = pickerFactory(st)
        sta = "%s.%s" % (st[0].stats.network, st[0].stats.station)
        for b in pks._picks:
            if not b:
                continue
            tstamp = b["time"].timestamp
            rows.append({"TimeStamp": tstamp, "Station": sta,
                         "Event": event, "Phase": b.phase_hint,
                         "Channel": b["waveform_id"]["channel_code"],
                         "Seconds": "%3.5f" % tstamp})
        if not pks.KeepGoing:
            detex_tpu.log(__name__, "Exiting picking GUI, progress saved "
                          "in %s" % pickFile, level="info", pri=True)
            return _save()
        if count % 10 == 0:
            _save()
    return _save()


def autoPickPhases(templateKey="TemplateKey.csv", stationKey="StationKey.csv",
                   fetch="EventWaveForms", fileName="PhasePicks.csv",
                   staTime=0.5, ltaTime=5.0, threshold=3.0,
                   filt=(1, 10, 2, True), tb4=10, taft=120, phase="P"):
    """
    Automatic phase picker (detex_tpu extension standing in for the GUI
    workflow): for each station/event pair, bandpass the vertical (or first)
    channel, run a classic STA/LTA, and record the first onset above
    ``threshold`` to the standard picks csv (TimeStamp, Station, Event,
    Phase). Saves incrementally every 10 events like the reference GUI
    (util.py:1095).
    """
    import numpy as np
    from detex_tpu.data import fetcher as getdata
    from detex_tpu.ops.stalta import classic_sta_lta
    temkey = readKey(templateKey, "template")
    stakey = readKey(stationKey, "station")
    fetcher = getdata.quickFetch(fetch)
    rows = []
    count = 0
    for _, srow in stakey.iterrows():
        gen = fetcher.getTemData(temkey, stakey[stakey.STATION ==
                                                srow.STATION],
                                 tb4, taft, returnName=True)
        for st, name in gen:
            if filt is not None:
                st.filter("bandpass", freqmin=filt[0], freqmax=filt[1],
                          corners=filt[2], zerophase=filt[3])
            stz = st.select(component="Z")
            tr = stz[0] if len(stz) else st[0]
            sr = tr.stats.sampling_rate
            cft = classic_sta_lta(tr.data, staTime * sr, ltaTime * sr)
            above = np.flatnonzero(cft >= threshold)
            if len(above) == 0:
                continue
            tpick = tr.stats.starttime.timestamp + above[0] / sr
            rows.append(dict(TimeStamp=tpick,
                             Station="%s.%s" % (srow.NETWORK, srow.STATION),
                             Event=name, Phase=phase))
            count += 1
            if count % 10 == 0:
                pd.DataFrame(rows).to_csv(fileName, index=False)
    df = pd.DataFrame(rows)
    df.to_csv(fileName, index=False)
    return df


# ---------------------------------------------------------------------------
# Log reading (reference util.py:972-987)
# ---------------------------------------------------------------------------


def readLog(logpath="detex_tpu.log"):
    """Read the detex_tpu log into a DataFrame."""
    cols = ["Time", "Mod", "Level", "Msg"]
    rows = []
    with open(logpath) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 4:
                rows.append(parts[:3] + ["\t".join(parts[3:])])
    return pd.DataFrame(rows, columns=cols)
