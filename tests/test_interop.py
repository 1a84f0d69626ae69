"""Interop writers/readers: KML, hypoDD, hypoInverse, NLL, EQSearch, picks,
quality check."""
import os

import numpy as np
import pandas as pd
import pytest

import detex_tpu
from detex_tpu import interop, quality_check, util


def test_kml_from_keys(synth_case, tmp_path):
    out = interop.writeKMLFromTemplateKey(synth_case["templateKey"],
                                          str(tmp_path / "t.kml"))
    txt = open(out).read()
    assert txt.startswith("<?xml")
    assert txt.count("<Placemark>") == len(
        pd.read_csv(synth_case["templateKey"]))
    out2 = interop.writeKMLFromStationKey(synth_case["stationKey"],
                                          str(tmp_path / "s.kml"))
    assert open(out2).read().count("<Placemark>") == 2


def test_hypodd_inputs(synth_case, tmp_path):
    f1 = interop.writeHypoDDStationInput(synth_case["stationKey"],
                                         str(tmp_path / "station.dat"))
    lines = open(f1).read().strip().split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("TA.S00 ")
    f2 = interop.writeHypoDDEventInput(synth_case["templateKey"],
                                       str(tmp_path / "event.dat"))
    lines = open(f2).read().strip().split("\n")
    assert len(lines) == len(pd.read_csv(synth_case["templateKey"]))
    assert all(len(ln.split(", ")) == 10 for ln in lines)


def test_hypoinverse_phase_and_station(synth_case, tmp_path):
    f = interop.makeHypoInversePhaseFile(
        synth_case["phaseKey"], synth_case["templateKey"],
        str(tmp_path / "test.pha"))
    txt = open(f).read()
    assert "P 0" in txt
    f2 = interop.makeHypoInverseStationFile(synth_case["stationKey"],
                                            str(tmp_path / "sta.txt"))
    lines = [x for x in open(f2).read().split(os.linesep) if x]
    # 2 stations x 3 channels
    assert len(lines) == 6
    assert lines[0].startswith("S00")


def test_nll_phase_files(synth_case, tmp_path):
    files = interop.writePhaseNLL(synth_case["phaseKey"],
                                  synth_case["templateKey"],
                                  str(tmp_path / "nll"))
    assert len(files) == len(pd.read_csv(synth_case["templateKey"]))
    txt = open(files[0]).read()
    assert "GAU" in txt and "P" in txt


def test_eqsearch_reader(tmp_path):
    # two synthetic eqsrchsum lines (fixed-width per reference colspecs)
    line = ("090401 1230 45.10 38 30.12 111 45.67 07.50  2.30")
    p = tmp_path / "eqsrchsum"
    p.write_text(line + "\n" + line + "\n")
    df = interop.EQSearch2TemplateKey(str(p), str(tmp_path / "tk.csv"))
    assert len(df) == 2
    assert abs(df.LAT.iloc[0] - (38 + 30.12 / 60)) < 1e-6
    assert abs(df.LON.iloc[0] - (-111 - 45.67 / 60)) < 1e-6
    assert df.TIME.iloc[0].startswith("2009-04-01T12-30-45")


def test_auto_pick_phases(synth_case, tmp_path):
    out = str(tmp_path / "autopicks.csv")
    df = util.autoPickPhases(synth_case["templateKey"],
                             synth_case["stationKey"],
                             fetch=synth_case["eventDir"], fileName=out,
                             filt=(1, 8, 2, True), tb4=10, taft=60)
    assert os.path.exists(out)
    assert len(df) > 0
    # auto picks should be near the true (synth) arrival times
    true = pd.read_csv(synth_case["phaseKey"])
    merged = df.merge(true, on=["Event", "Station"], suffixes=("", "_true"))
    err = np.abs(merged.TimeStamp - merged.TimeStamp_true)
    assert err.median() < 2.0


def test_pickphases_missing_keys_raises(tmp_path):
    # no TemplateKey.csv in cwd -> readKey errors before any GUI opens
    os.chdir(tmp_path)
    with pytest.raises(detex_tpu.DetexError):
        util.pickPhases()


def test_quality_check(synth_case):
    df = quality_check.check_data_quality(synth_case["conDir"])
    assert df.ok.all()
    assert {"duration_ok", "gaps_ok", "nc_ok"}.issubset(df.columns)


def test_readhypo2000sum(tmp_path):
    # one synthetic hyp2000 summary line with known fields
    l = list(" " * 100)
    l[0:16] = "2009040112304510"
    l[16:18] = "38"; l[19:21] = "30"; l[21:23] = "10"
    l[23:26] = "111"; l[27:29] = "45"; l[29:31] = "50"
    l[31:36] = "07500"
    l[48:52] = "0150"
    l[85:93] = "01500250"
    p = tmp_path / "sum2000"
    p.write_text("".join(l) + "\n")
    df = interop.readHypo2000Sum(str(p))
    assert len(df) == 1
    assert abs(df.Lat.iloc[0] - (38 + (30 + 10 / 100) / 60)) < 1e-6
    assert df.DateString.iloc[0].startswith("2009-04-01T12-30-45")


def test_writekml_hypinv_and_hypinput(tmp_path):
    import pandas as pd

    # sum2000-format line (same synthetic fixture as test_readhypo2000sum)
    l = list(" " * 100)
    l[0:16] = "2009040112304510"
    l[16:18] = "38"; l[19:21] = "30"; l[21:23] = "10"
    l[23:26] = "111"; l[27:29] = "45"; l[29:31] = "50"
    l[31:36] = "07500"; l[48:52] = "0150"; l[85:93] = "01500250"
    p = tmp_path / "sum2000"
    p.write_text("".join(l) + "\n")
    out = interop.writeKMLFromHypInv(str(p), str(tmp_path / "hi.kml"))
    txt = open(out).read()
    assert "<Placemark>" in txt and "2009040112" in txt

    # phase-input terminator line: 6 leading spaces, lat/lon fields
    t = list(" " * 40)
    t[14:16] = "38"; t[17:19] = "30"; t[19:21] = "10"
    t[21:24] = "111"; t[25:27] = "45"; t[27:29] = "50"
    q = tmp_path / "in.pha"
    q.write_text("SOMEPHASELINE.............\n" + "".join(t) + "\n")
    out2 = interop.writeKMLfromHYPInput(str(q), str(tmp_path / "in.kml"))
    txt2 = open(out2).read()
    assert "<Placemark>" in txt2
    assert "%f" % -(111 + (45 + 50 / 100) / 60.0) in txt2

    # Arc-style DataFrame
    df = pd.DataFrame({"verlat": [40.5], "verlon": [-111.2]}, index=[3])
    out3 = interop.writeKMLFromArcDF(df, str(tmp_path / "arc.kml"))
    assert "<name>3</name>" in open(out3).read()


def test_get_number_channels_and_seewavefroms():
    import pytest

    from detex_tpu import util
    from detex_tpu.core.stream import Stream, Trace
    import numpy as np

    trs = [Trace(np.zeros(10), header=dict(station="S00", channel=c,
                                           sampling_rate=10.0))
           for c in ("BHZ", "BHN", "BHE", "BHZ")]
    assert util.get_number_channels(Stream(traces=trs)) == 3
    # seeWaveFroms is the pickPhases loop over continuous data; with no
    # keys in cwd it errors at readKey like pickPhases does
    with pytest.raises(detex_tpu.DetexError):
        util.seeWaveFroms()
