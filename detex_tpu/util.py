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


def seeWaveFroms(*args, **kwargs):
    """The reference's GUI template browser/picker (util.py:1104-1190,
    PyQt4-bound and non-functional as shipped); not supported in detex_tpu.
    Use autoPickPhases for the same PhasePicks.csv output."""
    detex_tpu.log(__name__, "interactive seeWaveFroms GUI is not supported "
                  "in detex_tpu; use detex_tpu.util.autoPickPhases",
                  level="error", e=NotImplementedError)


def pickPhases(*args, **kwargs):
    """The reference's interactive PyQt4 pick GUI is not supported; use
    autoPickPhases for an automatic STA/LTA picker writing the same
    PhasePicks.csv format, or supply your own picks file."""
    detex_tpu.log(__name__, "interactive pickPhases GUI is not supported in "
                  "detex_tpu; use detex_tpu.util.autoPickPhases or provide "
                  "a picks csv (TimeStamp, Station, Event, Phase)",
                  level="error", e=NotImplementedError)


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
