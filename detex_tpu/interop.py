"""
Interop with location programs and external catalogs — the reference's
util.py:28-560 and 699-867 capabilities, dependency-free where possible:
KML files are written as plain XML (no simplekml), hypoDD/hypoInverse/
NonLinLoc writers and sum-file readers need only pandas, and obspy Catalog /
Inventory conversion is gated on obspy being installed.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

import detex_tpu
from detex_tpu.core.utc import UTCDateTime
from detex_tpu.data.keys import readKey

# ---------------------------------------------------------------------------
# KML (reference util.py:28-201, written without simplekml)
# ---------------------------------------------------------------------------

_KML_HEAD = ('<?xml version="1.0" encoding="UTF-8"?>\n'
             '<kml xmlns="http://www.opengis.net/kml/2.2">\n<Document>\n')
_KML_TAIL = "</Document>\n</kml>\n"


def _write_kml(points, outname):
    """points: iterable of (name, lon, lat)."""
    with open(outname, "w") as fh:
        fh.write(_KML_HEAD)
        for name, lon, lat in points:
            fh.write("<Placemark><name>%s</name><Point><coordinates>"
                     "%f,%f</coordinates></Point></Placemark>\n"
                     % (name, float(lon), float(lat)))
        fh.write(_KML_TAIL)
    return outname


def writeKMLFromTemplateKey(df="TemplateKey.csv", outname="templates.kml"):
    """KML of template (event) locations (reference util.py:43-67)."""
    if isinstance(df, str):
        df = pd.read_csv(df)
    return _write_kml([(r.NAME, r.LON, r.LAT) for _, r in df.iterrows()],
                      outname)


def writeKMLFromStationKey(df="StationKey.csv", outname="stations.kml"):
    """KML of station locations (reference util.py:70-94)."""
    if isinstance(df, str):
        df = pd.read_csv(df)
    return _write_kml([(r.STATION, r.LON, r.LAT) for _, r in df.iterrows()],
                      outname)


def writeKMLFromDF(DF, outname="map.kml"):
    """KML from a readSum-style DataFrame (reference util.py:30-40)."""
    return _write_kml([(r.DateString, r.Lon, r.Lat)
                       for _, r in DF.iterrows()], outname)


def writeKMLFromHypDD(hypreloc="hypoDD.reloc", outname="hypo.kml"):
    """KML from hypoDD relocations (reference util.py:149-160)."""
    points = np.atleast_2d(np.genfromtxt(hypreloc))
    return _write_kml([(str(int(a[0])), a[2], a[1]) for a in points],
                      outname)


def writeKMLFromEQSearchSum(eqsum="eqsrchsum", outname="eqsearch.kml"):
    """KML from a UUSS EQsearch summary file (reference util.py:163-201)."""
    df = _readEQSearchSum(eqsum)
    return _write_kml([(r.TIME, r.LON, r.LAT) for _, r in df.iterrows()],
                      outname)


def writeKMLFromHypInv(hypout="sum2000", outname="hypoInv.kml"):
    """KML from a hypoInverse-2000 summary file (capability of reference
    util.py:97-118; point names are the yyyymmddhh origin stamp)."""
    df = readHypo2000Sum(hypout)
    pts = [("".join(c for c in r.DateString if c.isdigit())[:10],
            r.Lon, r.Lat) for _, r in df.iterrows()]
    return _write_kml(pts, outname)


def writeKMLFromArcDF(df, outname="Arc.kml"):
    """KML from a readArc-style verified-location DataFrame (capability of
    reference util.py:120-126): one point per row at (verlon, verlat)."""
    pts = [(str(int(ind)), row["verlon"], row["verlat"])
           for ind, row in df.iterrows()]
    return _write_kml(pts, outname)


def writeKMLfromHYPInput(hypin="test.pha", outname="hypoInInv.kml"):
    """KML from a hypoInverse phase-input file (capability of reference
    util.py:129-147): terminator lines carry the trial origin in
    degrees + decimal-minutes fixed-width fields (W hemisphere assumed)."""
    pts = []
    with open(hypin) as fh:
        for line in fh:
            # blank trailing fields mean zero in this fixed-width format,
            # so pad short terminator lines rather than dropping them
            if not line.startswith(" " * 6) or len(line.rstrip("\n")) < 16:
                continue
            z = line.rstrip("\n").ljust(29).replace(" ", "0")
            lat = (float(z[14:16]) +
                   (float(z[17:19]) + float(z[19:21]) / 100.0) / 60.0)
            lon = -(float(z[21:24]) +
                    (float(z[25:27]) + float(z[27:29]) / 100.0) / 60.0)
            pts.append((str(len(pts) + 1), lon, lat))
    return _write_kml(pts, outname)


# ---------------------------------------------------------------------------
# hypoDD (reference util.py:206-260)
# ---------------------------------------------------------------------------


def writeHypoDDStationInput(stakey, fileName="station.dat",
                            useElevations=True, inFt=False):
    """Write the hypoDD station.dat file (reference util.py:206-232)."""
    stakey = readKey(stakey, key_type="station")
    conFact = 0.3048 if inFt else 1.0
    lines = []
    for _, row in stakey.iterrows():
        line = "%s %.6f %.6f" % (row.NETWORK + "." + row.STATION, row.LAT,
                                 row.LON)
        if useElevations:
            line += " %.2f" % (row.ELEVATION * conFact)
        lines.append(line)
    with open(fileName, "w") as fil:
        fil.write("\n".join(lines) + "\n")
    return fileName


def writeHypoDDEventInput(temkey, fileName="event.dat"):
    """Write the hypoDD event.dat file (reference util.py:235-260)."""
    temkey = readKey(temkey, key_type="template")
    reqZeros = int(np.ceil(np.log10(max(len(temkey), 2))))
    fmt = "{:0%dd}" % reqZeros
    lines = []
    for num, row in temkey.iterrows():
        utc = UTCDateTime(row.TIME)
        DATE = "%04d%02d%02d" % (utc.year, utc.month, utc.day)
        TIME = "%02d%02d%04d" % (utc.hour, utc.minute,
                                 int(utc.second * 100))
        mag = row.MAG if row.MAG > -20 else 0.0
        lines.append("%s, %s, %04f, %04f, %02f, %02f, 0.0, 0.0, 0.0, %s"
                     % (DATE, TIME, row.LAT, row.LON, row.DEPTH, mag,
                        fmt.format(num)))
    with open(fileName, "w") as fil:
        fil.write("\n".join(lines) + "\n")
    return fileName


# ---------------------------------------------------------------------------
# hypoInverse (reference util.py:264-488)
# ---------------------------------------------------------------------------


def _returnLat(lat, degPre=2):
    deg = int(abs(lat))
    minutes = (abs(lat) - deg) * 60
    char = "S" if lat < 0 else " "
    return ("%0*d" % (degPre, deg), "%5.2f" % minutes, char)


def _returnLon(lon, degPre=3):
    deg = int(abs(lon))
    minutes = (abs(lon) - deg) * 60
    char = "E" if lon > 0 else " "
    return ("%0*d" % (degPre, deg), "%5.2f" % minutes, char)


def makeHypoInversePhaseFile(phases, evekey, outname, fix=0,
                             usePhases=("P",), fixFirstStation=False):
    """
    Write a hypoinverse y2k phase file (manual v1.39 p.113) from a detex
    phase-pick file (reference util.py:264-318). The phases frame may carry
    a Channel column; 'ZENZ'-style defaults are used otherwise.
    """
    phases = readKey(phases, key_type="phases")
    evekey = readKey(evekey, key_type="template")
    out = ["\n"]
    for _, everow in evekey.iterrows():
        phas = phases[phases.Event == everow.NAME]
        if len(phas) < 1:
            continue
        pha = None
        for _, pha in phas.iterrows():
            phase = str(pha.Phase).upper()
            if phase not in usePhases:
                continue
            net, sta = str(pha.Station).split(".")[:2]
            chan = getattr(pha, "Channel", "EHZ")
            _checkLens(net, chan, sta)
            out.append(_makeSHypStationLine(sta, chan, net, pha.TimeStamp,
                                            phase))
        out.append(_makeHypTermLine(everow, fix, fixFirstStation))
        out.append("\n")
    with open(outname, "w") as fh:
        fh.write("".join(out))
    return outname


def _checkLens(net, chan, sta):
    if len(net) > 2:
        detex_tpu.log(__name__, "network code must be <= 2 characters: %s"
                      % net, level="error")
    if len(chan) > 3:
        detex_tpu.log(__name__, "channel code must be <= 3 characters: %s"
                      % chan, level="error")
    if len(sta) > 5:
        detex_tpu.log(__name__, "station code must be <= 5 characters: %s"
                      % sta, level="error")


def _dateDigits(utc):
    """YYYYMMDDHHMMSS.ss digit string of a UTCDateTime."""
    return ("%04d%02d%02d%02d%02d%05.2f"
            % (utc.year, utc.month, utc.day, utc.hour, utc.minute,
               utc.second + utc.microsecond / 1e6))


def _makeSHypStationLine(sta, cha, net, ts, pha):
    utc = UTCDateTime(ts)
    ds = _dateDigits(utc)
    yyyymmddhhmm = ds[0:12]
    ssss = "%5.2f" % float(ds[12:])
    ty = "%s 0" % pha
    return "{:<5}{:<4}{:<5}{:<3}{:<12}{:<80}{:<2}\n".format(
        sta, net, cha, ty, yyyymmddhhmm, ssss, "01")


def _makeHypTermLine(everow, fix, fixFirstStation):
    fixchar = {0: " ", 1: "-", 2: "X", 3: "O"}[fix]
    utc = UTCDateTime(everow.TIME)
    hhmmssss = _dateDigits(utc)[8:16]
    if fixFirstStation:
        lat = latmin = latchar = " "
        lon = lonmin = lonchar = " "
        dep = " "
    else:
        lat, latmin, latchar = _returnLat(everow.LAT)
        lon, lonmin, lonchar = _returnLon(everow.LON)
        dep = "%05.2f" % everow.DEPTH
    return "{:<6}{:<8}{:<3}{:<4}{:<4}{:<4}{:<5}{:<1}\n".format(
        " ", hhmmssss, lat + latchar, latmin, lon + lonchar, lonmin, dep,
        fixchar)


def makeHypoInverseStationFile(stationKey, outname):
    """Hypoinverse station file, data format #2 (reference
    util.py:375-409)."""
    stakey = readKey(stationKey, key_type="station")
    lines = []
    for _, srow in stakey.iterrows():
        latd, latm, latc = _returnLat(srow.LAT, degPre=4)
        lond, lonm, lonc = _returnLon(srow.LON, degPre=4)
        ele = "%4d" % srow.ELEVATION
        for chan in str(srow.CHANNELS).split("-"):
            fstr = "{:<6}{:<3}{:<1}{:<5}{:<3}{:<7}{:<1}{:<4}{:<7}{:<1}{:<4}"
            sto = fstr.format(srow.STATION, srow.NETWORK, " ", chan, latd,
                              latm, latc, lond, lonm, lonc, ele)
            ends = "5.0  P  0.00  0.00  0.00  0.00 0  0.00--"
            lines.append("{:<86}".format(sto + ends))
    with open(outname, "w") as fh:
        fh.write(os.linesep.join(lines) + os.linesep)
    return outname


def readHypo2000Sum(sumfile):
    """Read a hyp2000 summary file into a DataFrame (reference
    util.py:412-453; assumes western hemisphere)."""
    lines = [line.rstrip("\n") for line in open(sumfile)]
    rows = []
    for l in lines:
        if len(l) < 93:
            continue
        rows.append(dict(
            Lat=float(l[16:18]) + (float(l[19:21].replace(" ", "0")) +
                                   float(l[21:23].replace(" ", "0")) / 100)
            / 60,
            Lon=-float(l[23:26]) - (float(l[27:29].replace(" ", "0")) +
                                    float(l[29:31].replace(" ", "0")) / 100)
            / 60,
            DateString=(l[0:4] + "-" + l[4:6] + "-" + l[6:8] + "T" +
                        l[8:10] + "-" + l[10:12] + "-" + l[12:14] + "." +
                        l[14:16]),
            Dep=float(l[31:34].replace(" ", "0").replace("-", "0")) +
            float(l[34:36].replace(" ", "0")) / 100,
            RMS=float(l[48:50].replace(" ", "0")) +
            float(l[50:52].replace(" ", "0")) / 100,
            HozError=float(l[85:87].replace(" ", "0")) +
            float(l[87:89].replace(" ", "0")) / 100.0,
            VertError=float(l[89:91].replace(" ", "0")) +
            float(l[91:93].replace(" ", "0")) / 100.0))
    return pd.DataFrame(rows)


def readHypo71Sum(sumfile):
    """Read a y2k hypo71-format summary file (reference util.py:456-488)."""
    fw = [(0, 20), (19, 22), (22, 23), (23, 28), (28, 32), (32, 33),
          (33, 38), (38, 45), (52, 55), (55, 59), (59, 64), (64, 69),
          (69, 74), (74, 79)]
    cols = ["ds", "latd", "latc", "latm", "lond", "lonc", "lonm", "depth",
            "numphase", "azgap", "stadist", "rms", "horerr", "vererr"]
    df = pd.read_fwf(sumfile, colspecs=fw, names=cols)
    latmul = [1 if x else -1 for x in df["latc"].isnull()]
    df["lat"] = (df["latd"] + df["latm"] / 60.) * latmul
    lonmul = [1 if x else -1 for x in df["lonc"].isnull()]
    df["lon"] = (df["lond"] + df["lonm"] / 60.) * lonmul
    utcs = [UTCDateTime(str(x).replace(" ", "")) for x in df.ds]
    df["times"] = [x.timestamp for x in utcs]
    df["names"] = [str(x).split(".")[0].replace(":", "-") for x in utcs]
    return df.drop(["ds", "latd", "latc", "latm", "lond", "lonc", "lonm"],
                   axis=1)


# ---------------------------------------------------------------------------
# NonLinLoc (reference util.py:493-560)
# ---------------------------------------------------------------------------


def writePhaseNLL(phases, evekey, NLLoc_dir, useP=True, useS=True):
    """
    Write NonLinLoc phase files, one per event (reference util.py:493-560).
    ``phases`` is the standard detex phase-picks frame (TimeStamp, Station,
    Event, Phase).
    """
    phases = readKey(phases, key_type="phases")
    evekey = readKey(evekey, key_type="template")
    os.makedirs(NLLoc_dir, exist_ok=True)
    written = []
    for _, everow in evekey.iterrows():
        phas = phases[phases.Event == everow.NAME]
        if len(phas) < 1:
            continue
        on = (str(everow.NAME).split(".")[0].replace("-", "")
              .replace("T", "") + ".p")
        outpath = os.path.join(NLLoc_dir, on)
        with open(outpath, "w") as fh:
            for _, pha in phas.iterrows():
                p = str(pha.Phase).upper()
                if (p == "P" and useP) or (p == "S" and useS):
                    fh.write(_makeNLLine(pha, p))
            fh.write("\n")
        written.append(outpath)
    return written


def _makeNLLine(pha, phase):
    utc = UTCDateTime(pha.TimeStamp)
    parts = ["%-6s" % pha.Station.split(".")[-1], "%-4s" % "?",
             "%-4s" % "?", "%-1s" % "?", "%-6s" % phase, "%-1s" % "?",
             "%04d%02d%02d" % (utc.year, utc.month, utc.day),
             "%02d%02d" % (utc.hour, utc.minute),
             "%07.4f" % (utc.second + utc.microsecond / 1e6),
             "%-3s" % "GAU", "%-9s" % ".01", "%9.2e" % -1, "%9.2e" % -1,
             "%9.2e" % -1]
    return " ".join(parts) + "\n"


# ---------------------------------------------------------------------------
# Catalog interop (reference util.py:699-867; obspy parts gated)
# ---------------------------------------------------------------------------


def _readEQSearchSum(eq):
    clspecs = [(0, 2), (2, 4), (4, 6), (7, 9), (9, 11), (12, 17), (18, 20),
               (21, 26), (27, 30), (31, 36), (37, 43), (45, 50)]
    names = ["year", "mo", "day", "hr", "min", "sec", "latdeg", "latmin",
             "londeg", "lonmin", "dep", "mag"]
    df = pd.read_fwf(eq, colspecs=clspecs, header=None, names=names)
    year = ["19%02d" % x if x > 50 else "20%02d" % x for x in df["year"]]
    TIME = ["%s-%02d-%02dT%02d-%02d-%05.2f"
            % (y, mo, d, h, m, s) for y, mo, d, h, m, s in zip(
                year, df["mo"], df["day"], df["hr"], df["min"], df["sec"])]
    out = pd.DataFrame()
    out["TIME"] = TIME
    out["NAME"] = TIME
    out["LAT"] = df["latdeg"].values + df["latmin"].values / 60.0
    out["LON"] = -df["londeg"].values - df["lonmin"].values / 60.0
    out["MAG"] = df["mag"]
    out["DEPTH"] = df["dep"]
    return out


def EQSearch2TemplateKey(eq="eqsrchsum", oname="eqTemplateKey.csv"):
    """Template key from a UUSS EQsearch summary file (reference
    util.py:767-809; assumes years >50 are 19xx)."""
    DF = _readEQSearchSum(eq)
    if oname:
        DF.to_csv(oname, index=False)
    return DF


def templateKey2Catalog(temkey="TemplateKey.csv", picks=None):
    """Template key (+ optional picks) -> obspy Catalog (reference
    util.py:699-764). Requires obspy."""
    try:
        import obspy.core.event as oce
        import obspy
    except ImportError:
        detex_tpu.log(__name__, "templateKey2Catalog requires obspy",
                      level="error", e=ImportError)
    temkey = readKey(temkey, "template")
    if picks is not None:
        picks = readKey(picks, "phases")
    cat = oce.Catalog()
    for _, row in temkey.iterrows():
        eve = oce.Event()
        mag = oce.Magnitude()
        mag.mag = row.MAG
        if "MTYPE" in row.index:
            mag.magnitude_type = row.MTYPE
        eve.magnitudes = [mag]
        ori = oce.Origin()
        ori.latitude = row.LAT
        ori.longitude = row.LON
        ori.depth = row.DEPTH
        ori.time = obspy.UTCDateTime(UTCDateTime(row.TIME).timestamp)
        eve.origins = [ori]
        if picks is not None:
            phs = picks[picks.Event == row.NAME]
            eve.picks = [_obspy_pick(ph) for _, ph in phs.iterrows()]
        cat.events.append(eve)
    return cat


def _obspy_pick(ph):
    import obspy
    import obspy.core.event as oce
    pick = oce.Pick()
    pick.time = obspy.UTCDateTime(float(ph.TimeStamp))
    pick.phase_hint = ph.Phase
    return pick


def catalog2Templatekey(cat, fileName=None):
    """obspy Catalog -> template key DataFrame (reference
    util.py:812-867). Requires obspy."""
    try:
        import obspy
    except ImportError:
        detex_tpu.log(__name__, "catalog2Templatekey requires obspy",
                      level="error", e=ImportError)
    if not isinstance(cat, obspy.core.event.Catalog):
        detex_tpu.log(__name__, "input is not an obspy catalog object",
                      level="error")
    rows = []
    for event in cat:
        if not event.origins:
            detex_tpu.log(__name__, "Event %s has no origin"
                          % str(event.resource_id), level="debug")
            continue
        origin = event.preferred_origin() or event.origins[0]
        magnitude = (event.preferred_magnitude() or
                     (event.magnitudes[0] if event.magnitudes else None))
        time = str(origin.time).replace(":", "-")
        rows.append(dict(
            NAME=str(origin.time).split(".")[0].replace(":", "-"),
            TIME=time, LAT=origin.latitude, LON=origin.longitude,
            DEPTH=(origin.depth or 0) / 1000.0,
            MAG=magnitude.mag if magnitude else np.nan,
            MTYPE=magnitude.magnitude_type if magnitude else "",
            CONTRIBUTOR=getattr(origin.creation_info, "author", "")
            if origin.creation_info else ""))
    df = pd.DataFrame(rows)
    if isinstance(fileName, str):
        df.to_csv(fileName, index=False)
    return df


def inventory2StationKey(inv, starttime, endtime, fileName=None):
    """obspy Inventory -> station key (reference util.py:630-696).
    Requires obspy."""
    rows = []
    stime = str(UTCDateTime(starttime)).split(".")[0].replace(":", "-")
    etime = str(UTCDateTime(endtime)).split(".")[0].replace(":", "-")
    if UTCDateTime(starttime) >= UTCDateTime(endtime):
        detex_tpu.log(__name__, "starttime must be less than endtime",
                      level="error")
    for net in inv:
        for sta in net:
            chanlist = sorted(set(chan.code for chan in sta.channels))
            if not chanlist:
                continue
            rows.append(dict(NETWORK=net.code, STATION=sta.code,
                             STARTTIME=stime, ENDTIME=etime,
                             LAT=sta.latitude, LON=sta.longitude,
                             ELEVATION=sta.elevation,
                             CHANNELS="-".join(chanlist)))
    df = pd.DataFrame(rows)
    if isinstance(fileName, str):
        df.to_csv(fileName, index=False)
    return df


# ---------------------------------------------------------------------------
# ANF / hypoinverse-arc catalog readers (reference extras/ANF.py, arc.py)
# ---------------------------------------------------------------------------


def readANF(anfdir, lon1=-180, lon2=180, lat1=-90, lat2=90, getPhases=False,
            UTC1="1960-01-01", UTC2="3000-01-01", Pcodes=("P", "Pg"),
            Scodes=("S", "Sg")):
    """
    Read ANF (Array Network Facility) origin (.origin) files under a
    directory into a DataFrame, optionally with arrival (.arrival/.assoc)
    phases (reference extras/ANF.py:16-120 behavior).
    """
    import glob as _glob
    rows = []
    for f in sorted(_glob.glob(os.path.join(anfdir, "**", "*.origin"),
                               recursive=True)):
        for line in open(f):
            try:
                lat = float(line[0:9])
                lon = float(line[9:20])
                dep = float(line[20:29])
                ts = float(line[29:46])
                mb = float(line[128:135])
                ml = float(line[143:150])
            except (ValueError, IndexError):
                continue
            if not (lon1 <= lon <= lon2 and lat1 <= lat <= lat2):
                continue
            if not (UTCDateTime(UTC1).timestamp <= ts <=
                    UTCDateTime(UTC2).timestamp):
                continue
            mag = ml if ml > -900 else mb
            name = str(UTCDateTime(ts)).split(".")[0].replace(":", "-")
            rows.append(dict(TIME=name, NAME=name, LAT=lat, LON=lon,
                             MAG=mag, DEPTH=dep))
    return pd.DataFrame(rows)


def ANF2TemplateKey(anfdir, fileName="TemplateKey.csv", **kwargs):
    """Write a template key from an ANF catalog directory."""
    df = readANF(anfdir, **kwargs)
    if fileName:
        df.to_csv(fileName, index=False)
    return df


def readArc(arcfile):
    """
    Parse a hypoinverse archive ('arc') file into origin and phase
    DataFrames (reference extras/arc.py behavior: event summary lines
    followed by station phase lines, '$' shadow lines skipped).

    Returns (events_df, phases_df).
    """
    events = []
    phases = []
    cur_event = None
    for line in open(arcfile):
        if not line.strip() or line.startswith("$"):
            continue
        # summary lines start with a 12+ digit date string
        head = line[:14].replace(" ", "")
        if len(line) > 45 and head[:8].isdigit() and len(head) >= 12:
            try:
                year, month, day = int(line[0:4]), int(line[4:6]), \
                    int(line[6:8])
                hour, minute = int(line[8:10]), int(line[10:12])
                sec = float(line[12:16].replace(" ", "0")) / 100.0
                lat = float(line[16:18]) + \
                    float(line[19:23].replace(" ", "0")) / 100.0 / 60.0
                lon = -(float(line[23:26]) +
                        float(line[27:31].replace(" ", "0")) / 100.0 / 60.0)
                dep = float(line[31:36].replace(" ", "0")) / 100.0
                t = UTCDateTime(year, month, day, hour, minute, 0) + sec
                cur_event = str(t).split(".")[0].replace(":", "-")
                events.append(dict(NAME=cur_event, TIME=cur_event, LAT=lat,
                                   LON=lon, DEPTH=dep, MAG=np.nan))
                continue
            except (ValueError, IndexError):
                pass
        # phase lines: 5-char station + 2-char net at fixed columns
        if cur_event is not None and len(line) > 30 and line[0:5].strip():
            sta = line[0:5].strip()
            net = line[5:7].strip()
            pha = line[14:15].strip() or "P"
            phases.append(dict(Event=cur_event,
                               Station="%s.%s" % (net, sta), Phase=pha,
                               TimeStamp=np.nan))
    return pd.DataFrame(events), pd.DataFrame(phases)
