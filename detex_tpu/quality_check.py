"""
Continuous-data quality audit (the reference's detex/quality_check.py,
an explicitly incomplete module — completed here): scans an indexed
waveform directory, reports per-file gap/duration/channel statistics, and
optionally flags or quarantines files that fail the checks.
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

import detex_tpu
from detex_tpu.data import fetcher as getdata


def check_data_quality(directory=getdata.conDirDefault, min_duration=0.9,
                       max_gap_ratio=0.1, expected_nc=None,
                       move_bad=False, badDir=None, reindex=False):
    """
    Audit every file in a waveform directory.

    Parameters
    ----------
    directory : str
        Path to the (indexed) continuous or event waveform directory.
    min_duration : float
        Minimum fraction of the directory's median file duration a file
        must span.
    max_gap_ratio : float
        Maximum total gap time as a fraction of file duration.
    expected_nc : int or None
        If set, files must carry exactly this many channels.
    move_bad : bool
        If True move failing files into ``badDir`` (default
        ``<directory>_bad``) and reindex.
    reindex : bool
        Force a reindex before auditing.

    Returns
    -------
    DataFrame with one row per file: Path, FileName, Station, Duration,
    Gaps, Nc, Nt plus boolean columns duration_ok, gaps_ok, nc_ok, ok.
    """
    from detex_tpu import util
    dbPath = os.path.join(directory, ".index.db")
    if reindex or not os.path.exists(dbPath):
        getdata.indexDirectory(directory)
    df = util.loadSQLite(dbPath, "ind")
    if df is None or len(df) < 1:
        detex_tpu.log(__name__, "no indexed files in %s" % directory,
                      level="error")
    key = util.loadSQLite(dbPath, "indkey", convertNumeric=False)
    order = sorted(key.columns, key=lambda c: int(str(c).split("_")[1]))
    vocab = key[order].values
    df["Path"] = [getdata._decodePath(x, vocab) for x in df["Path"]]

    med_dur = float(np.median(df.Duration))
    df["duration_ok"] = df.Duration >= min_duration * med_dur
    with np.errstate(divide="ignore", invalid="ignore"):
        gap_ratio = df.Gaps / df.Duration.replace(0, np.nan)
    df["gaps_ok"] = gap_ratio.fillna(1.0) <= max_gap_ratio
    if expected_nc is not None:
        df["nc_ok"] = df.Nc == expected_nc
    else:
        df["nc_ok"] = df.Nc == int(df.Nc.mode().iloc[0])
    df["ok"] = df.duration_ok & df.gaps_ok & df.nc_ok

    nbad = int((~df.ok).sum())
    detex_tpu.log(__name__, "%d of %d files fail quality checks in %s"
                  % (nbad, len(df), directory), pri=True)
    if move_bad and nbad:
        badDir = badDir or (directory.rstrip(os.sep) + "_bad")
        os.makedirs(badDir, exist_ok=True)
        for _, row in df[~df.ok].iterrows():
            src = os.path.join(row.Path, row.FileName)
            if os.path.exists(src):
                shutil.move(src, os.path.join(badDir, row.FileName))
        getdata.indexDirectory(directory)
    return df


def checkQuality(stPath):
    """Quality stats of a single waveform file (gaps, duration, channels);
    None if unreadable (reference quality_check.checkQuality)."""
    return getdata._checkQuality(stPath)


def divideIntoHours(utc1, utc2):
    """Yield hour-boundary UTCDateTimes between utc1 and utc2 (reference
    quality_check.divideIntoHours)."""
    from detex_tpu.core.utc import UTCDateTime
    return getdata._divideIntoChunks(UTCDateTime(utc1), UTCDateTime(utc2),
                                     3600, None)
