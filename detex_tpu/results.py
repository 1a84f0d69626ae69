"""
Association & results — reference detex/results.py rebuilt on modern pandas.

detResults loads the detection database, dedups per-station detections
(keeping the max-DS member of each overlap group via the cumsum-group
trick), associates detections across stations by predicted-origin-time
overlap, classifies them as auto-detections (known templates) vs new
detections, and optionally verifies against a ground-truth catalog.
"""
from __future__ import annotations

import numbers
import os

import numpy as np
import pandas as pd
import scipy.stats

import detex_tpu
from detex_tpu import util as _util
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.data import fetcher as getdata


def detResults(trigCon=0, trigParameter=0, associateReq=0,
               ss_associateBuffer=1, sg_associateBuffer=2.5,
               requiredNumStations=4, veriBuffer=1, ssDB="SubSpace.db",
               templateKey="TemplateKey.csv", stationKey="StationKey.csv",
               veriFile=None, includeAllVeriColumns=True, reduceDets=True,
               Pf=False, stations=None, starttime=None, endtime=None,
               fetch="ContinuousWaveForms", exceptionalThreshold=None):
    """
    Associate detections into coherent events and return an SSResults
    instance (parameters documented in reference results.py:22-112).
    """
    _checkExistence([ssDB, templateKey, stationKey])
    _checkInputs(trigCon, trigParameter, associateReq, ss_associateBuffer,
                 requiredNumStations)
    if associateReq != 0:
        detex_tpu.log(__name__, "associateReq values other than 0 not yet "
                      "supported", level="error")
    temkey = _util.readKey(templateKey, "template")
    stakey = _util.readKey(stationKey, "station")
    ss_info, sg_info = _loadInfoDataFrames(ssDB)
    try:
        fetcher = getdata.quickFetch(fetch)
    except Exception:
        fetcher = None
    filt = _util.loadSQLite(ssDB, "filt_params")
    ss_PfKey, sg_PfKey = _makePfKey(ss_info, sg_info, Pf)
    if reduceDets:
        ssdf = _deleteDetDups(ssDB, trigCon, trigParameter,
                              ss_associateBuffer, starttime, endtime,
                              stations, "ss_df", PfKey=ss_PfKey)
        sgdf = _deleteDetDups(ssDB, trigCon, trigParameter,
                              sg_associateBuffer, starttime, endtime,
                              stations, "sg_df", PfKey=sg_PfKey)
    else:
        if Pf:
            detex_tpu.log(__name__, "When using the Pf parameter reduceDets "
                          "must be True", level="error")
        ssdf = _util.loadSQLite(ssDB, "ss_df")
        sgdf = _util.loadSQLite(ssDB, "sg_df")
    if ssdf is None and sgdf is None:
        detex_tpu.log(__name__, "No detections found that meet given "
                      "criteria", level="error")
    df = pd.concat([x for x in (ssdf, sgdf) if x is not None],
                   ignore_index=True)
    df = df.reset_index(drop=True)
    if isinstance(stations, (list, tuple)):
        df = df[df.Sta.isin(stations)]
    Dets, Autos = _associateDetections(df, associateReq, requiredNumStations,
                                       ss_associateBuffer, ss_info, temkey,
                                       exceptionalThreshold)
    Vers = _verifyEvents(Dets, Autos, veriFile, veriBuffer,
                         includeAllVeriColumns)
    return SSResults(Dets, Autos, Vers, ss_info, filt, temkey, stakey,
                     templateKey, fetcher)


def _makePfKey(ss_info, sg_info, Pf):
    """Per-detector DS thresholds for a given Pf from the stored beta
    parameters (reference results.py:172-205)."""
    if not Pf:
        return None, None
    out = []
    for info in (ss_info, sg_info):
        if isinstance(info, pd.DataFrame):
            rows = []
            for _, row in info.iterrows():
                TH = scipy.stats.beta.isf(Pf, row.beta1, row.beta2, 0, 1)
                if TH > .94:
                    TH, _pf = _approximateThreshold(row.beta1, row.beta2,
                                                    Pf, 1000, 3)
                rows.append([row.Sta, row.Name, TH,
                             [row.beta1, row.beta2, 0, 1]])
            df = pd.DataFrame(rows, columns=["Sta", "Name", "DS",
                                             "betadist"])
            out.append(df.reset_index(drop=True))
        else:
            out.append(None)
    return out[0], out[1]


def _approximateThreshold(beta_a, beta_b, target, numintervals, numloops):
    """Forward grid search around scipy bug #4677
    (reference results.py:208-229)."""
    startVal, stopVal = 0, 1
    loops = 0
    while loops < numloops:
        Xs = np.linspace(startVal, stopVal, numintervals)
        pfs = scipy.stats.beta.sf(Xs, beta_a, beta_b)
        resids = np.abs(pfs - target)
        minind = int(resids.argmin())
        bestPf = pfs[minind]
        bestX = Xs[minind]
        startVal = Xs[max(minind - 1, 0)]
        stopVal = Xs[min(minind + 1, numintervals - 1)]
        loops += 1
        if minind == 0 or minind == numintervals - 1:
            raise ValueError("Grid search failing, set threshold manually")
    return bestX, bestPf


def _verifyEvents(Dets, Autos, veriFile, veriBuffer, includeAllVeriColumns):
    """Match associated events to a ground-truth catalog
    (reference results.py:232-296)."""
    if veriFile is None:
        return None
    if isinstance(veriFile, str) and not os.path.exists(veriFile):
        detex_tpu.log(__name__, "No veriFile passed or it does not exist, "
                      "skipping verification", level="warning", pri=True)
        return None
    vertem = _readVeriFile(veriFile)
    vertem["STMP"] = [UTCDateTime(x).timestamp for x in vertem["TIME"]]
    verlist = []
    cols = ["TIME", "LAT", "LON", "MAG", "ProEnMag", "DEPTH", "NAME"]
    additionalColumns = list(set(vertem.columns) - set(cols))
    for _, verrow in vertem.iterrows():
        matched = False
        for table in (Dets, Autos):
            if matched or len(table) < 1:
                continue
            con1 = table.MSTAMPmin - veriBuffer / 2.0 < verrow.STMP
            con2 = table.MSTAMPmax + veriBuffer / 2.0 > verrow.STMP
            con3 = ~table.Verified.astype(bool)
            cand = table[con1 & con2 & con3]
            if len(cand) > 0:
                trudet = cand[cand.DSav == cand.DSav.max()].copy()
                table.loc[trudet.index[0], "Verified"] = True
                if includeAllVeriColumns:
                    for col in additionalColumns:
                        if col not in trudet.columns:
                            trudet[col] = verrow[col]
                trudet["VerMag"] = verrow.MAG
                trudet["VerLat"] = verrow.LAT
                trudet["VerLon"] = verrow.LON
                trudet["VerDepth"] = verrow.DEPTH
                trudet["VerName"] = verrow.NAME
                verlist.append(trudet)
                matched = True
    if len(verlist) > 0:
        verifs = pd.concat(verlist, ignore_index=True)
        verifs = verifs.sort_values(by=["Event", "DSav"])
        verifs = verifs.drop_duplicates(subset="Event")
        verifs = verifs.drop("Verified", axis=1)
    else:
        verifs = pd.DataFrame()
    return verifs


def _readVeriFile(veriFile):
    """Read the verification catalog (csv/pickle/sqlite/DataFrame)
    (reference results.py:299-317)."""
    if isinstance(veriFile, pd.DataFrame):
        df = veriFile
    else:
        df = None
        try:
            df = pd.read_csv(veriFile)
        except Exception:
            try:
                df = pd.read_pickle(veriFile)
            except Exception:
                try:
                    df = _util.loadSQLite(veriFile, "verify")
                except Exception:
                    pass
        if df is None:
            detex_tpu.log(__name__, "%s could not be read; must be csv, "
                          "pickled DataFrame or sqlite db" % veriFile,
                          level="error")
    reqcols = ["TIME", "LAT", "LON", "MAG", "DEPTH", "NAME"]
    if not set(reqcols).issubset(df.columns):
        detex_tpu.log(__name__, "%s lacks required columns %s"
                      % (veriFile, reqcols), level="error")
    return df


def _buildSQL(PfKey, trigCon, trigParameter, stations, starttime, endtime,
              tableName):
    """SQL statements for loading detections with filters
    (reference results.py:320-368)."""
    SQL = []
    if not starttime or not endtime:
        starttime = 0.0
        endtime = 4500 * 3600 * 24 * 365.25
    else:
        starttime = UTCDateTime(starttime).timestamp
        endtime = UTCDateTime(endtime).timestamp
    if isinstance(stations, (list, tuple)):
        if isinstance(PfKey, pd.DataFrame):
            PfKey = PfKey[PfKey.Sta.isin(stations)]
    else:
        if isinstance(PfKey, pd.DataFrame):
            stations = PfKey.Sta.values
        else:
            stations = ["*"]
    if isinstance(PfKey, pd.DataFrame):
        for _, row in PfKey.iterrows():
            table = "sg_df" if "SG" in row.Name else "ss_df"
            SQL.append('SELECT * FROM %s WHERE Sta="%s" AND Name="%s" AND '
                       'DS>=%f AND MSTAMPmin>%f AND MSTAMPmin<%f'
                       % (table, row.Sta, row.Name, row.DS, starttime,
                          endtime))
    else:
        cond = "DS" if trigCon == 0 else "DS_STALTA"
        for sta in stations:
            if sta == "*":
                SQL.append('SELECT * FROM %s WHERE %s >= %s AND '
                           'MSTAMPmin>=%f AND MSTAMPmin<=%f'
                           % (tableName, cond, trigParameter, starttime,
                              endtime))
            else:
                SQL.append('SELECT * FROM %s WHERE Sta="%s" AND %s >= %s '
                           'AND MSTAMPmin>=%f AND MSTAMPmin<=%f'
                           % (tableName, sta, cond, trigParameter,
                              starttime, endtime))
    return SQL


def _deleteDetDups(ssDB, trigCon, trigParameter, associateBuffer, starttime,
                   endtime, stations, tableName, PfKey=None):
    """Keep only the max-DS detection of each per-station overlap group
    (reference results.py:371-400)."""
    sslist = []
    for sql in _buildSQL(PfKey, trigCon, trigParameter, stations, starttime,
                         endtime, tableName):
        loaded = _util.loadSQLite(ssDB, tableName, sql=sql)
        if isinstance(loaded, pd.DataFrame):
            sslist.append(loaded)
    if len(sslist) < 1:
        return None
    ssdf = pd.concat(sslist, ignore_index=True)
    ssdf = ssdf.reset_index(drop=True)
    ssdf = ssdf.sort_values(by=["Sta", "MSTAMPmin"])
    con1 = (ssdf.MSTAMPmin - associateBuffer) > ssdf.MSTAMPmax.shift()
    con2 = ssdf.Sta != ssdf.Sta.shift()
    ssdf["Gnum"] = (con1 | con2).cumsum()
    ssdf = ssdf.sort_values(by=["Gnum", "DS"])
    ssdf = ssdf.drop_duplicates(subset="Gnum", keep="last")
    ssdf = ssdf.reset_index(drop=True)
    return ssdf


def _associateDetections(ssdf, associateReq, requiredNumStations,
                         associateBuffer, ss_info, temkey,
                         exceptionalThreshold):
    """Group detections across stations by time overlap
    (reference results.py:403-460)."""
    ssdf = ssdf.sort_values(by="MSTAMPmin").reset_index(drop=True)
    cols = ["Event", "DSav", "DSmax", "NumStations", "DS_STALTA",
            "MSTAMPmin", "MSTAMPmax", "Mag", "ProEnMag", "Verified", "Dets"]
    gs = (ssdf.MSTAMPmin - associateBuffer > ssdf.MSTAMPmax.shift()).cumsum()
    groups = ssdf.groupby(gs)
    autolist = [pd.DataFrame(columns=cols)]
    detlist = [pd.DataFrame(columns=cols)]
    temkey = temkey.copy()
    temkey["STMP"] = np.array([UTCDateTime(x).timestamp
                               for x in temkey.TIME])
    for _, g in groups:
        con1 = len(set(g.Sta)) >= requiredNumStations
        if not con1 and isinstance(exceptionalThreshold, float):
            con1 = con1 or (g.DS.max() >= exceptionalThreshold)
        elif not con1 and isinstance(exceptionalThreshold, dict):
            con1 = con1 or _check_if_exceptional(g, exceptionalThreshold)
        if con1:
            if len(set(g.Sta)) < len(g.Sta):
                g = g.sort_values(by="DS").drop_duplicates(
                    subset="Sta", keep="last").sort_values("MSTAMPmin")
            isauto, autoDF = _createAutoTable(g, temkey, cols,
                                              associateBuffer)
            if isauto:
                autolist.append(autoDF)
            else:
                detlist.append(_createDetTable(g, cols))
    detTable = pd.concat(detlist, ignore_index=True)
    autoTable = pd.concat(autolist, ignore_index=True)
    return [detTable, autoTable]


def _check_if_exceptional(g, exth):
    """Per-station exceptional-threshold gate (reference
    results.py:463-467)."""
    ex = np.array([exth.get(x.Sta, 100) for _, x in g.iterrows()])
    return bool(np.any((g["DS"].values >= ex) & (g["DS"].values <= 1.01)))


def _createDetTable(g, cols):
    mag, proEnMag = _getMagnitudes(g)
    utc = UTCDateTime(np.mean([g.MSTAMPmin.mean(), g.MSTAMPmax.mean()]))
    event = str(utc).replace(":", "-").split(".")[0]
    data = [event, g.DS.mean(), g.DS.max(), len(g), g.DS_STALTA.mean(),
            g.MSTAMPmin.min(), g.MSTAMPmax.max(), mag, proEnMag, False, g]
    return pd.DataFrame([data], columns=cols)


def _createAutoTable(g, temkey, cols, associateBuffer):
    isauto = False
    event = None
    for _, row in g.iterrows():
        con1 = temkey.STMP + associateBuffer > row.MSTAMPmin
        con2 = temkey.STMP - associateBuffer < row.MSTAMPmax
        temtemkey = temkey[con1 & con2]
        if len(temtemkey) > 0:
            isauto = True
            event = temtemkey.iloc[0].NAME
    if isauto:
        mag, proEnMag = _getMagnitudes(g)
        data = [event, g.DS.mean(), g.DS.max(), len(g), g.DS_STALTA.mean(),
                g.MSTAMPmin.min(), g.MSTAMPmax.max(), mag, proEnMag, False,
                g]
        return isauto, pd.DataFrame([data], columns=cols)
    return isauto, pd.DataFrame()


def _getMagnitudes(g):
    mags = pd.to_numeric(g.Mag, errors="coerce")
    pemags = pd.to_numeric(g.ProEnMag, errors="coerce")
    mag = np.nanmedian(mags) if mags.notna().any() else np.nan
    PEmag = np.nanmedian(pemags) if pemags.notna().any() else np.nan
    return mag, PEmag


def _loadSSdb(ssDB, trigCon, trigParameter, sta=None):
    """Load detections from a subspace database with an optional station
    and trigger filter (reference results.py:517-533)."""
    cond = "DS" if trigCon == 0 else "DS_STALTA"
    if sta:
        sql = ('SELECT * FROM ss_df WHERE Sta="%s" AND %s > %s'
               % (sta, cond, trigParameter))
    else:
        sql = "SELECT * FROM ss_df WHERE %s > %s" % (cond, trigParameter)
    return _util.loadSQLite(ssDB, "ss_df", sql=sql)


def _checkInputs(trigCon, trigParameter, associateReq, associateBuffer,
                 requiredNumStations):
    """(reference results.py:536-568)"""
    if not isinstance(trigCon, int) or trigCon not in (0, 1):
        detex_tpu.log(__name__, "trigcon must be an int, either 0 or 1",
                      level="error")
    if trigCon == 0:
        if not isinstance(trigParameter, numbers.Real) or \
                trigParameter > 1 or trigParameter < 0:
            detex_tpu.log(__name__, "When trigCon==0 trigParameter must be "
                          "between 0 and 1", level="error")
    elif trigCon == 1:
        if not isinstance(trigParameter, numbers.Real) or \
                (trigParameter < 1 and trigParameter != 0):
            detex_tpu.log(__name__, "When trigCon==1 trigParameter must be "
                          "greater than 1 (or 0 for all)", level="error")
    if not isinstance(associateReq, int) or associateReq < 0:
        detex_tpu.log(__name__, "associateReq must be an integer >= 0",
                      level="error")
    if not isinstance(associateBuffer, numbers.Real) or associateBuffer < 0:
        detex_tpu.log(__name__, "associateBuffer must be a real number "
                      ">= 0", level="error")
    if not isinstance(requiredNumStations, int) or requiredNumStations < 1:
        detex_tpu.log(__name__, "requiredNumStations must be an integer "
                      ">= 1", level="error")


def _checkExistence(existList):
    for fil in existList:
        if isinstance(fil, str) and not os.path.exists(fil):
            raise IOError("%s does not exist" % fil)


def _loadInfoDataFrames(ssDB):
    """(reference results.py:577-585)"""
    ss_info = _util.loadSQLite(ssDB, "ss_info")
    if isinstance(ss_info, pd.DataFrame):
        ss_info["NumEvents"] = [len(row.Events.split(","))
                                for _, row in ss_info.iterrows()]
    sg_info = _util.loadSQLite(ssDB, "sg_info")
    if isinstance(sg_info, pd.DataFrame):
        sg_info["NumEvents"] = 1
    return ss_info, sg_info


class SSResults(object):
    """Associated detection results (reference results.py:588-698)."""

    def __init__(self, Dets, Autos, Vers, ss_info, ss_filt, temkey, stakey,
                 templateKey, fetcher):
        self.Autos = Autos
        self.Dets = Dets
        self.NumVerified = len(Vers) if isinstance(Vers, pd.DataFrame) \
            else "N/A"
        self.Vers = Vers
        self.info = ss_info
        self.filt = ss_filt
        self.StationKey = stakey
        self.TemplateKey = temkey
        self.TemKeyPath = templateKey
        self.fetcher = fetcher

    def writeDetections(self, onlyVerified=False, minDS=False, minMag=False,
                        eventDir="EventWaveForms", updateTemKey=True,
                        temkeyPath=None, timeBeforeOrigin=60,
                        timeAfterOrigin=240, waveFormat="npz"):
        """
        Extract waveforms of the new detections into the event directory and
        append them to the template key with a "d"-prefixed name
        (reference results.py:603-692).
        """
        dets = self.Dets.copy()
        if onlyVerified:
            dets = dets[dets.Verified]
        if minDS:
            dets = dets[dets.DSav >= minDS]
        if minMag:
            dets = dets[pd.to_numeric(dets.Mag, errors="coerce") >= minMag]
        if temkeyPath is None:
            temkeyPath = self.TemKeyPath
        temkey = self.TemplateKey.copy()
        newrows = []
        for _, row in dets.iterrows():
            origin = UTCDateTime(np.mean([row.MSTAMPmax, row.MSTAMPmin]))
            eveDirName = "d" + row.Event
            evedir = os.path.join(eventDir, eveDirName)
            os.makedirs(evedir, exist_ok=True)
            index_path = os.path.join(eventDir, ".index.db")
            if os.path.exists(index_path):
                os.remove(index_path)
            for _, starow in self.StationKey.iterrows():
                net, sta = starow.NETWORK, starow.STATION
                start = origin - timeBeforeOrigin
                stop = origin + timeAfterOrigin
                ext = getdata.formatKey[waveFormat]
                fname = ".".join([net, sta, row.Event, ext])
                try:
                    st = self.fetcher.getStream(start, stop, net, sta)
                    st.write(os.path.join(evedir, fname), waveFormat)
                except Exception:
                    detex_tpu.log(__name__, "Could not write and save %s "
                                  "for station %s" % (row.Event, sta),
                                  level="warning", pri=True)
            time = str(UTCDateTime(origin.timestamp))
            newrows.append(dict(
                NAME=eveDirName,
                TIME=time.replace(":", "-").replace("Z", ""),
                MAG=row.Mag, LAT=np.nan, LON=np.nan, DEPTH=np.nan))
        if updateTemKey and newrows:
            temkeyNew = pd.concat([temkey, pd.DataFrame(newrows)],
                                  ignore_index=True)
            temkeyNew.to_csv(temkeyPath, index=False)

    def __repr__(self):
        return ("SSResults instance with %d autodetections and %d new "
                "detections, %s are verified"
                % (len(self.Autos), len(self.Dets), str(self.NumVerified)))
