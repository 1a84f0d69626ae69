"""
Waveform file IO.

Native format is ``npz`` (numpy archive + JSON header) — hermetic, fast, no
external deps. miniSEED is read/written NATIVELY via the C++ host library
(data/mseed.py: STEIM1/2 + int/float encodings — the reference's archive
format, getdata.py:33-47, without needing obspy). If obspy is installed,
SAC/pickle and anything else obspy reads are transparently supported too.
"""
from __future__ import annotations

import json
import os

import numpy as np

import detex_tpu
from detex_tpu.core.stream import Stats, Stream, Trace
from detex_tpu.core.utc import UTCDateTime

# file extension per format (reference getdata formatKey)
formatKey = {"mseed": "msd", "pickle": "pkl", "sac": "sac", "Q": "Q",
             "npz": "npz"}

_META_KEYS = ("network", "station", "location", "channel", "sampling_rate")


def _obspy():
    try:
        import obspy
        return obspy
    except ImportError:
        return None


def write_stream(st, path, format="npz"):
    fmt = str(format).lower()
    if fmt == "mseed":
        from detex_tpu.data import mseed as _ms
        if _ms.available():
            return _ms.write_mseed(st, path)
        # fall through to obspy if the native lib could not build
    if fmt == "npz":
        arrays = {}
        meta = []
        for i, tr in enumerate(st):
            arrays["data_%d" % i] = np.asarray(tr.data)
            m = {k: tr.stats.get(k) for k in _META_KEYS}
            m["starttime"] = tr.stats.starttime.timestamp
            meta.append(m)
        arrays["meta"] = np.array(json.dumps(meta))
        d = os.path.dirname(path)
        if d and not os.path.exists(d):
            os.makedirs(d, exist_ok=True)
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
        return path
    ob = _obspy()
    if ob is None:
        detex_tpu.log(__name__, "format %s requires obspy which is not "
                      "installed; use format='npz'" % format, level="error")
    ost = ob.Stream([ob.Trace(
        data=np.asarray(tr.data),
        header={k: tr.stats.get(k) for k in _META_KEYS}) for tr in st])
    for otr, tr in zip(ost, st):
        otr.stats.starttime = ob.UTCDateTime(tr.stats.starttime.timestamp)
    ost.write(path, format=format)
    return path


def read(path):
    """Read a waveform file into a detex_tpu Stream. Returns None on failure
    (mirrors reference getdata.read, getdata.py:33-47)."""
    try:
        return _read(path)
    except Exception:
        try:
            ob = _obspy()
            if ob is not None:
                return _from_obspy(ob.read(path))
        except Exception:
            pass
        detex_tpu.log(__name__, "Cannot read %s" % path, level="warning")
        return None


def _read(path):
    if path.endswith(".npz") or os.path.exists(path + ".npz"):
        p = path if path.endswith(".npz") else path + ".npz"
        with np.load(p, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            st = Stream()
            for i, m in enumerate(meta):
                stats = Stats(m)
                st.append(Trace(z["data_%d" % i], stats))
        return st
    if _looks_mseed(path):
        from detex_tpu.data import mseed as _ms
        if _ms.available():
            return _ms.read_mseed(path)
    ob = _obspy()
    if ob is None:
        raise IOError("cannot read %s without obspy" % path)
    return _from_obspy(ob.read(path))


def _looks_mseed(path):
    """miniSEED sniff: 6-digit sequence + D/R/Q/M quality byte."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(8)
    except OSError:
        return False
    return (len(head) >= 8 and
            all(48 <= b <= 57 or b == 32 for b in head[:6]) and
            head[6:7] in (b"D", b"R", b"Q", b"M"))


def _from_obspy(ost):
    st = Stream()
    for otr in ost:
        h = {k: getattr(otr.stats, k, "") for k in _META_KEYS}
        h["starttime"] = UTCDateTime(float(otr.stats.starttime.timestamp))
        data = otr.data
        if np.ma.isMaskedArray(data):
            data = data.filled(np.nan)
        st.append(Trace(np.asarray(data, dtype=np.float64), h))
    return st


def to_obspy(st):
    ob = _obspy()
    if ob is None:
        detex_tpu.log(__name__, "obspy not installed", level="error",
                      e=ImportError)
    ost = ob.Stream()
    for tr in st:
        otr = ob.Trace(data=np.asarray(tr.data))
        for k in _META_KEYS:
            setattr(otr.stats, k, tr.stats.get(k))
        otr.stats.starttime = ob.UTCDateTime(tr.stats.starttime.timestamp)
        ost += otr
    return ost
