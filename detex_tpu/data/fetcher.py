"""
Unified waveform acquisition (the reference's detex/getdata.py rebuilt).

Methods:
  - "dir"    : local directory indexed by an SQLite ``.index.db`` with the
               same two-table schema as the reference (getdata.py:918-1039),
               so existing Detex data directories are readable as long as the
               waveform files themselves are readable (npz natively, mseed &
               friends when obspy is installed).
  - "iris" / "client" / "uuss" : obspy network clients (optional dependency).

All waveform payloads are detex_tpu.core.Stream objects.
"""
from __future__ import annotations

import glob
import itertools
import json
import os

import numpy as np
import pandas as pd

import detex_tpu
from detex_tpu.core.stream import Stream
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.data import waveio
from detex_tpu.data.keys import readKey
from detex_tpu.data.waveio import formatKey, read  # noqa: F401 (re-export)

conDirDefault = "ContinuousWaveForms"
eveDirDefault = "EventWaveForms"


def quickFetch(fetch_arg, **kwargs):
    """
    Instantiate a DataFetcher from minimal information
    (reference getdata.py:50-95): a DataFetcher passes through, a supported
    method name builds a client fetcher, anything else is treated as a
    directory path.
    """
    if isinstance(fetch_arg, DataFetcher):
        return fetch_arg
    if isinstance(fetch_arg, str):
        if fetch_arg in DataFetcher.supMethods:
            if fetch_arg == "dir":
                detex_tpu.log(__name__, "If using method dir you must pass a "
                              "path to directory", level="error")
            return DataFetcher(fetch_arg, removeResponse=True, **kwargs)
        if not os.path.exists(fetch_arg):
            detex_tpu.log(__name__, "Directory %s does not exist" % fetch_arg,
                          level="error")
        return DataFetcher("dir", directoryName=fetch_arg, **kwargs)
    detex_tpu.log(__name__, "Input not understood, read docs and try again",
                  level="error")


class DataFetcher(object):
    """
    Data acquisition front-end (reference getdata.py:244-609).

    Parameters mirror the reference; see module docstring for methods.
    """

    supMethods = ["dir", "client", "iris", "neic", "uuss", "ewave"]

    def __init__(self, method, client=None, removeResponse=False,
                 inventoryArg=None, directoryName=None, opType="VEL",
                 prefilt=(0.05, 0.1, 15, 20), conDatDuration=3600,
                 conBuff=120, timeBeforeOrigin=60, timeAfterOrigin=240,
                 checkData=True, fillZeros=False, randSeed=42):
        self.method = str(method).lower()
        self.client = client
        self.removeResponse = removeResponse
        self.inventoryArg = inventoryArg
        self.directoryName = directoryName
        self.opType = opType
        self.prefilt = list(prefilt) if prefilt is not None else None
        self.conDatDuration = conDatDuration
        self.conBuff = conBuff
        self.timeBeforeOrigin = timeBeforeOrigin
        self.timeAfterOrigin = timeAfterOrigin
        self.checkData = checkData
        self.fillZeros = fillZeros
        self.randSeed = randSeed  # deterministic random chunk sampling
        self._checkInputs()

    # -- setup ----------------------------------------------------------------
    def _checkInputs(self):
        if self.method not in self.supMethods:
            detex_tpu.log(__name__, "method %s not supported. Options: %s"
                          % (self.method, self.supMethods), level="error")
        if self.method == "dir":
            if self.directoryName is None:
                self.directoryName = conDirDefault
            if not os.path.exists(self.directoryName):
                detex_tpu.log(__name__, "directory %s not found"
                              % self.directoryName, level="error", e=IOError)
            self.directory = self.directoryName
            self._getStream = _loadDirectoryData
        else:
            self._setup_obspy_client()

    def _setup_obspy_client(self):
        """
        Bind the per-client loader (the reference's _assignClientFunction,
        getdata.py:672-751). 'iris' and 'uuss' build their well-known
        clients (needs obspy); 'client'/'neic'/'ewave' take any object with
        the matching waveform API — a real obspy client or an injected
        stand-in (testable without network or obspy).
        """
        if self.method in ("iris", "uuss"):
            try:
                import obspy.clients.fdsn
            except ImportError:
                detex_tpu.log(__name__, "method %s requires obspy, which is "
                              "not installed; use method='dir' with local "
                              "data" % self.method, level="error",
                              e=ImportError)
            if self.method == "iris":
                self.client = obspy.clients.fdsn.Client("IRIS")
            else:
                import obspy.clients.neic
                self.client = obspy.clients.neic.Client("128.110.129.227")
                self.inventoryArg = obspy.clients.fdsn.Client("IRIS")
        elif self.client is None:
            detex_tpu.log(__name__, "method %s requires a client instance "
                          "(obspy fdsn/neic/earthworm client or compatible)"
                          % self.method, level="error")
        loaders = {"iris": _loadFromFDSN, "client": _loadFromFDSN,
                   "uuss": _loadFromNEIC, "neic": _loadFromNEIC,
                   "ewave": _loadFromEarthworm}
        self._getStream = loaders[self.method]

    # -- generators -----------------------------------------------------------
    def getTemData(self, temkey, stakey, tb4=None, taft=None, returnName=True,
                   temDir=None, skipIfExists=False, skipDict=None,
                   returnTimes=False, phases=None):
        """
        Yield event (template) streams for each station/event combination
        (reference getdata.py:351-453).
        """
        if tb4 is None:
            tb4 = self.timeBeforeOrigin
        if taft is None:
            taft = self.timeAfterOrigin
        if skipDict is not None and len(skipDict) < 1:
            skipDict = None
        stakey = readKey(stakey, key_type="station")
        temkey = readKey(temkey, key_type="template")
        if phases is not None:
            phases = readKey(phases, "phases")

        for stain, temin in itertools.product(stakey.index, temkey.index):
            srow = stakey.loc[stain]
            trow = temkey.loc[temin]
            netsta = "%s.%s" % (srow.NETWORK, srow.STATION)
            if skipDict is not None and netsta in skipDict:
                if trow.NAME in skipDict[netsta]:
                    continue
            if skipIfExists and temDir is not None:
                pfile = glob.glob(os.path.join(temDir, trow.NAME,
                                               netsta + "*"))
                if len(pfile) > 0:
                    continue
            t = UTCDateTime(trow.TIME)
            if phases is not None:
                con1 = phases.Event == trow.NAME
                con2 = phases.Station == netsta
                cur = phases[con1 & con2]
                if len(cur) > 0:
                    t = UTCDateTime(min(UTCDateTime(x).timestamp
                                        for x in cur.TimeStamp))
                else:
                    detex_tpu.log(__name__, "%s on %s not in phase file, "
                                  "using origin" % (trow.NAME, srow.STATION))
            start = t - tb4
            end = t + taft
            chan = str(srow.CHANNELS).split("-")
            st = self.getStream(start, end, srow.NETWORK, srow.STATION,
                                chan, "??")
            if st is None:
                continue
            if returnName:
                yield st, trow.NAME
            elif returnTimes:
                yield st, start, end
            else:
                yield st

    def getConData(self, stakey, secBuff=None, returnName=False,
                   returnTimes=False, conDir=None, skipIfExists=False,
                   utcstart=None, utcend=None, duration=None, randSamps=None):
        """
        Yield continuous data chunks over the station key's time range
        (reference getdata.py:455-539).
        """
        stakey = readKey(stakey, "station")
        if secBuff is None:
            secBuff = self.conBuff
        if duration is None:
            duration = self.conDatDuration
        for _, ser in stakey.iterrows():
            netsta = "%s.%s" % (ser.NETWORK, ser.STATION)
            ts1 = UTCDateTime(ser.STARTTIME) if utcstart is None \
                else UTCDateTime(utcstart)
            ts2 = UTCDateTime(ser.ENDTIME) if utcend is None \
                else UTCDateTime(utcend)
            utcs = _divideIntoChunks(ts1, ts2, duration, randSamps,
                                     seed=self.randSeed)
            for utc in utcs:
                if skipIfExists and conDir is not None:
                    path, fil = _makePathFile(conDir, netsta, utc)
                    if len(glob.glob(os.path.join(path, fil + "*"))) > 0:
                        continue
                start = utc
                end = utc + self.conDatDuration + secBuff
                chan = str(ser.CHANNELS).split("-")
                st = self.getStream(start, end, ser.NETWORK, ser.STATION,
                                    chan, "*")
                if st is None or len(st) < 1:
                    continue
                if utcend is not None:
                    if UTCDateTime(utcend).timestamp < \
                            st[0].stats.endtime.timestamp:
                        st.trim(endtime=utcend)
                if len(st) < 1:
                    continue
                if returnName and returnTimes:
                    path, fname = _makePathFile(conDir, netsta, utc)
                    yield st, path, fname, start, end
                elif returnName:
                    path, fname = _makePathFile(conDir, netsta, utc)
                    yield st, path, fname
                elif returnTimes:
                    yield st, start, end
                else:
                    yield st

    def getStream(self, start, end, net, sta, chan="???", loc="??"):
        """Fetch one Stream; returns None if unavailable
        (reference getdata.py:541-609)."""
        start = UTCDateTime(start)
        end = UTCDateTime(end)
        if not isinstance(chan, (list, tuple)):
            chan = [chan]
        st = self._getStream(self, start, end, net, sta, chan, loc)
        if self.checkData:
            st = _dataCheck(st, start, end)
        if st is None or len(st) < 1:
            return None
        if self.removeResponse and self.method != "dir":
            st = _removeInstrumentResponse(self, st)
            if st is None:
                return None
        st.trim(starttime=start, endtime=end)
        st.merge(1)
        st = st.split()
        st.detrend("linear")
        if self.fillZeros:
            st.trim(starttime=start, endtime=end, pad=True, fill_value=0.0)
            st.merge(1, fill_value=0.0)
        return st


# ---------------------------------------------------------------------------
# dir-method loading via .index.db
# ---------------------------------------------------------------------------


def _loadDirectoryData(fet, start, end, net, sta, chan, loc):
    """Load data from an indexed directory (capability of reference
    getdata.py:614-669)."""
    t1 = UTCDateTime(start).timestamp
    t2 = UTCDateTime(end).timestamp
    buf = 3 * fet.conDatDuration
    dfind = _loadIndexDb(fet.directoryName, net + "." + sta,
                         t1 - buf, t2 + buf)
    if dfind is None or len(dfind) < 1:
        detex_tpu.log(__name__, "data from %s to %s on %s not found in %s"
                      % (UTCDateTime(t1), UTCDateTime(t2), sta,
                         fet.directoryName), level="warning", pri=False)
        return None
    # Drop boundary files that barely poke into the request window: a file
    # reaching back before t1 must cover at least 10% of the request past
    # t1 (unless it also spans beyond t2), and a file reaching past t2 must
    # start at least 10% of the request before t2. Interior files always
    # stay, whatever their length.
    span = t2 - t1
    head_sliver = ((dfind.Starttime <= t1) & (dfind.Endtime < t2) &
                   (dfind.Endtime - t1 < 0.1 * span))
    tail_sliver = ((dfind.Endtime >= t2) & (dfind.Starttime > t1) &
                   (t2 - dfind.Starttime < 0.1 * span))
    df = dfind[~(head_sliver | tail_sliver)]
    if len(df) < 1:
        return None
    st = Stream()
    for path, fname in zip(df.Path, df.FileName):
        st1 = read(os.path.join(path, fname))
        if st1 is not None:
            st += st1
    stout = Stream()
    for cha in (chan if isinstance(chan, (list, tuple)) else [chan]):
        stout += st.select(channel=cha)
    loc = "*" if loc in ("???", "??") else loc
    stout = stout.select(location=loc)
    return stout


def _client_times(start, end):
    """Request times for a client call: obspy UTCDateTimes when obspy is
    importable (real clients), else the detex_tpu UTCDateTimes as-is
    (injected stand-in clients)."""
    try:
        import obspy
        return (obspy.UTCDateTime(start.timestamp),
                obspy.UTCDateTime(end.timestamp))
    except ImportError:
        return start, end


def _coerce_stream(obj):
    """Accept either an obspy Stream (real clients) or a detex_tpu Stream
    (stand-in clients) from a client call."""
    if obj is None or isinstance(obj, Stream):
        return obj
    return waveio._from_obspy(obj)


def _chan_list(chan):
    """Normalize a channel spec (list, or 'BHE-BHN'-style string, or a
    list of such strings) into a flat list of channel codes."""
    items = list(chan) if isinstance(chan, (list, tuple)) else [chan]
    out = []
    for item in items:
        out.extend(str(item).split("-"))
    return out


def _loadFromFDSN(fet, start, end, net, sta, chan, loc):
    """FDSN client loader: one request with comma-joined channels
    (capability of reference getdata.py:729-751)."""
    t0, t1 = _client_times(start, end)
    chan = ",".join(_chan_list(chan))
    try:
        st = fet.client.get_waveforms(net, sta, loc, chan, t0, t1)
    except Exception:
        detex_tpu.log(__name__, "Could not fetch data on %s from %s to %s"
                      % (net + "." + sta, start, end), level="warning",
                      pri=False)
        return None
    return _coerce_stream(st)


def _loadFromNEIC(fet, start, end, net, sta, chan, loc):
    """NEIC CWB client loader: one request per channel (capability of
    reference getdata.py:690-708)."""
    t0, t1 = _client_times(start, end)
    out = None
    for cha in _chan_list(chan):
        try:
            part = _coerce_stream(
                fet.client.get_waveforms(net, sta, loc, cha, t0, t1))
        except Exception:
            detex_tpu.log(__name__, "Could not fetch data on %s from %s to "
                          "%s" % (net + "." + sta, start, end),
                          level="warning", pri=False)
            return None
        if part is not None:
            out = part if out is None else out + part
    return out


def _loadFromEarthworm(fet, start, end, net, sta, chan, loc):
    """Earthworm wave-server loader: per-channel requests with the
    earthworm '--' blank location convention; supports both the modern
    get_waveforms and the legacy getWaveform API (capability of reference
    getdata.py:710-727)."""
    t0, t1 = _client_times(start, end)
    if "*" in str(loc) or "?" in str(loc):
        loc = "--"
    fetch = getattr(fet.client, "get_waveforms", None)
    if fetch is None:
        fetch = fet.client.getWaveform
    out = None
    for cha in _chan_list(chan):
        try:
            part = _coerce_stream(fetch(net, sta, loc, cha, t0, t1))
        except Exception:
            detex_tpu.log(__name__, "Could not fetch data on %s from %s to "
                          "%s" % (net + "." + sta, start, end),
                          level="warning", pri=False)
            return None
        if part is not None:
            out = part if out is None else out + part
    return out


def _removeInstrumentResponse(fet, st):
    """Remove instrument response via obspy (client methods only)."""
    try:
        ost = waveio.to_obspy(st)
        ost.detrend("linear")
        ost.remove_response(output=fet.opType, pre_filt=fet.prefilt)
        return waveio._from_obspy(ost)
    except Exception:
        detex_tpu.log(__name__, "RemoveResponse failed, skipping",
                      level="warning", pri=True)
        return None


def _dataCheck(st, start, end):
    """Sanity checks on fetched data (reference getdata.py:801-828)."""
    if st is None or len(st) < 1:
        return None
    netsta = st[0].stats.network + "." + st[0].stats.station
    t = str(st[0].stats.starttime).split(".")[0]
    for tr in st:
        if tr.stats.sampling_rate % 1 != 0:
            tr.stats.sampling_rate = float(np.round(tr.stats.sampling_rate))
            detex_tpu.log(__name__, "Found non-int sampling_rates, rounded "
                          "on %s around %s" % (netsta, t), level="warning")
    if any(not np.any(np.nan_to_num(x.data)) for x in st):
        detex_tpu.log(__name__, "At least one channel is all 0s on %s around"
                      " %s, skipping" % (netsta, t), level="warning",
                      pri=True)
        return None
    return st


def _divideIntoChunks(utc1, utc2, duration, randSamps, seed=42):
    """
    Yield chunk start times between utc1 and utc2 spaced by ``duration``;
    when randSamps is set yield a deterministic random subsample (the
    reference used an unseeded random.sample, getdata.py:869-898 — detex_tpu
    makes this reproducible).
    """
    ts1 = utc1.timestamp - utc1.timestamp % duration
    ts2 = utc2.timestamp - utc2.timestamp % duration
    if randSamps is None:
        t = ts1
        while t <= ts2:
            yield UTCDateTime(t)
            t += duration
    else:
        utcList = np.arange(utc1.timestamp, utc2.timestamp, duration)
        if randSamps > len(utcList) / 4:
            detex_tpu.log(__name__, "Population too small for %d random "
                          "samples, taking %d" % (randSamps, len(utcList)))
            randSamps = len(utcList)
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(utcList), size=int(randSamps), replace=False)
        for i in idx:
            yield UTCDateTime(utcList[i])


def _makePathFile(conDir, netsta, utc):
    """Expected path/filename of a continuous chunk
    (reference getdata.py:901-914)."""
    utc = UTCDateTime(utc)
    year = "%04d" % utc.year
    jd = "%03d" % utc.julday
    hr, mi, se = "%02d" % utc.hour, "%02d" % utc.minute, "%02d" % utc.second
    path = os.path.join(conDir, netsta, year, jd)
    fname = "%s.%s-%sT%s-%s-%s" % (netsta, year, jd, hr, mi, se)
    return path, fname


# ---------------------------------------------------------------------------
# makeDataDirectories
# ---------------------------------------------------------------------------


def makeDataDirectories(templateKey="TemplateKey.csv",
                        stationKey="StationKey.csv", fetch="iris",
                        formatOut="npz", templateDir=eveDirDefault,
                        timeBeforeOrigin=60, timeAfterOrigin=240,
                        conDir=conDirDefault, secBuf=120,
                        conDatDuration=3600, getContinuous=True,
                        getTemplates=True, removeResponse=True,
                        opType="VEL", prefilt=(0.05, 0.1, 15, 20)):
    """
    Download/copy event + continuous data into the detex directory structure
    and index them (reference getdata.py:98-241).
    """
    temkey = readKey(templateKey, "template")
    stakey = readKey(stationKey, "station")
    if formatOut not in formatKey:
        detex_tpu.log(__name__, "%s is not an acceptable format, choices %s"
                      % (formatOut, list(formatKey)), level="error")
    if isinstance(fetch, DataFetcher):
        fetcher = fetch
        fetcher.opType = opType
        fetcher.removeResponse = removeResponse
        fetcher.prefilt = list(prefilt)
    else:
        fetcher = DataFetcher(fetch, removeResponse=removeResponse,
                              opType=opType, prefilt=prefilt,
                              conDatDuration=conDatDuration, conBuff=secBuf)
    if getTemplates:
        detex_tpu.log(__name__, "Getting template waveforms", pri=True)
        gen = fetcher.getTemData(temkey, stakey, timeBeforeOrigin,
                                 timeAfterOrigin, returnName=True,
                                 temDir=templateDir, skipIfExists=True)
        for st, name in gen:
            netsta = st[0].stats.network + "." + st[0].stats.station
            fname = "%s.%s.%s" % (netsta, name, formatKey[formatOut])
            fdir = os.path.join(templateDir, name)
            os.makedirs(fdir, exist_ok=True)
            st.write(os.path.join(fdir, fname), formatOut)
        if not os.path.exists(os.path.join(templateDir, ".index.db")):
            indexDirectory(templateDir)
    if getContinuous:
        detex_tpu.log(__name__, "Getting continuous data", pri=True)
        gen = fetcher.getConData(stakey, secBuf, returnName=True,
                                 conDir=conDir, skipIfExists=True,
                                 duration=conDatDuration)
        for st, path, fname in gen:
            if st is None:
                continue
            os.makedirs(path, exist_ok=True)
            st.write(os.path.join(path, fname + "." + formatKey[formatOut]),
                     formatOut)
        if not os.path.exists(os.path.join(conDir, ".index.db")):
            indexDirectory(conDir)


getAllData = makeDataDirectories  # legacy alias (reference getdata.py:1042)


# ---------------------------------------------------------------------------
# Directory indexing (.index.db) — same schema as reference
# ---------------------------------------------------------------------------


def indexDirectory(dirPath):
    """
    Create ``.index.db`` for a waveform directory — same two-table schema
    as the reference (getdata.py:918-986) so existing Detex directories
    stay readable: 'ind' holds one row per readable file (quality stats +
    the file's path encoded as per-depth integer ids), 'indkey' holds the
    per-depth path-component vocabulary (row = depth, column col_<id>).
    """
    from detex_tpu import util
    detex_tpu.log(__name__, "indexing, or updating index for %s" % dirPath,
                  pri=True)
    vocab = []  # vocab[depth] = {component: id}, insertion-ordered

    def encode(parts):
        ids = []
        for depth, part in enumerate(parts):
            if depth == len(vocab):
                vocab.append({})
            lookup = vocab[depth]
            ids.append(lookup.setdefault(part, len(lookup)))
        return json.dumps(ids)

    rows = []
    for dirpath, _dirnames, filenames in os.walk(dirPath):
        parts = os.path.abspath(dirpath).split(os.path.sep)
        for fname in sorted(filenames):
            if fname.startswith("."):
                continue
            fullpath = os.path.join(os.path.sep.join(parts), fname)
            quality = _checkQuality(fullpath)
            if quality is None:
                detex_tpu.log(__name__, "failed to read %s, skipping"
                              % fullpath, level="warning", pri=True)
                continue
            rows.append(dict(Path=encode(parts), FileName=fname, **quality))
    if not rows:
        detex_tpu.log(__name__, "No readable files found in %s" % dirPath,
                      level="error")
    columns = ["Path", "FileName", "Starttime", "Endtime", "Gaps", "Nc",
               "Nt", "Duration", "Station"]
    df = pd.DataFrame(rows, columns=columns)
    width = max(len(v) for v in vocab)
    key = pd.DataFrame(
        [list(v) + [""] * (width - len(v)) for v in vocab],
        columns=["col_%d" % i for i in range(width)])
    dbPath = os.path.join(dirPath, ".index.db")
    if os.path.exists(dbPath):
        os.remove(dbPath)
    util.saveSQLite(df, dbPath, "ind")
    util.saveSQLite(key, dbPath, "indkey")


def _checkQuality(stPath):
    """Quality stats of one waveform file (reference getdata.py:989-1007)."""
    st = read(stPath)
    if st is None or len(st) < 1:
        return None
    gaps = st.get_gaps()
    gapsum = float(np.sum([x[-2] for x in gaps])) if gaps else 0.0
    starttime = min(x.stats.starttime.timestamp for x in st)
    endtime = max(x.stats.endtime.timestamp for x in st)
    nc = len(set(x.stats.channel for x in st))
    netsta = st[0].stats.network + "." + st[0].stats.station
    return {"Gaps": gapsum, "Starttime": starttime, "Endtime": endtime,
            "Duration": endtime - starttime, "Nc": nc, "Nt": len(st),
            "Station": netsta}


def _loadIndexDb(dirPath, station, t1, t2):
    """Query the 'ind' table for one station/time window and decode each
    row's integer-encoded Path against the 'indkey' vocabulary."""
    from detex_tpu import util
    dbPath = os.path.join(dirPath, ".index.db")
    if not os.path.exists(dbPath):
        detex_tpu.log(__name__, "%s is not currently indexed, indexing now"
                      % dirPath, pri=True)
        indexDirectory(dirPath)
    sql = ('SELECT * FROM ind WHERE Starttime>=%f AND Endtime<=%f AND '
           'Station="%s"' % (t1, t2, station))
    df = util.loadSQLite(dbPath, "ind", sql=sql, silent=False)
    if df is None or len(df) < 1:
        return None
    key = util.loadSQLite(dbPath, "indkey", convertNumeric=False)
    order = sorted(key.columns, key=lambda c: int(c.split("_")[1]))
    vocab = key[order].values  # [depth, id] -> path component
    df["Path"] = [_decodePath(p, vocab) for p in df["Path"]]
    return df.sort_values(by="FileName").reset_index(drop=True)


def _decodePath(encoded, vocab):
    parts = [vocab[depth][i] for depth, i in enumerate(json.loads(encoded))]
    if parts and parts[0] == "":  # absolute path: leading empty component
        return os.path.sep.join(parts)
    return os.path.join(*parts)
