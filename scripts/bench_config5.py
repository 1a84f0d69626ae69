"""
BASELINE config-5 miniature: a multi-station x large-template-bank
END-TO-END engine run (VERDICT round-2 missing #2) — 5 stations x ~100
templates x ~4.5 days of 50 Hz continuous data through the full production
pipeline: createCluster -> createSubSpace -> attachPickTimes -> SVD ->
SubSpace.detex (subspaces + the ~per-station-100-detector singles bank,
histograms on, magnitudes on) -> detResults association.

Prints one JSON line with the end-to-end detex() wall time and the
station-days/s it implies. Run on the TPU (no platform forcing):

    python -u scripts/bench_config5.py [span_hours] [n_singles]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    span_hours = int(sys.argv[1]) if len(sys.argv) > 1 else 110
    n_singles = int(sys.argv[2]) if len(sys.argv) > 2 else 94

    import detex_tpu
    from detex_tpu import results as _results
    from detex_tpu.data import fetcher as getdata
    from detex_tpu.data.synth import SynthCatalog

    wd = tempfile.mkdtemp(prefix="config5_")
    os.chdir(wd)
    print("workdir:", wd, flush=True)

    t_all = time.perf_counter()
    cat = SynthCatalog(n_sources=2, events_per_source=3,
                       n_singles=n_singles, n_stations=5, sr=50.0,
                       span_hours=span_hours, seed=11, noise=0.05)
    cat.add_hidden_events(n=3, mag=1.5, sources=[0, 1, 0])
    paths = cat.write_directories(wd, tb4=10, taft=60)
    n_templates = 2 * 3 + n_singles
    print("synth: 5 stations x %d templates x %d h (%.1f s)"
          % (n_templates, span_hours, time.perf_counter() - t_all),
          flush=True)

    t0 = time.perf_counter()
    clust = detex_tpu.createCluster(
        CCreq=0.5, fetch_arg=paths["eventDir"], filt=[1, 10, 2, True],
        stationKey=paths["stationKey"], templateKey=paths["templateKey"],
        trim=[10, 60], saveclust=False)
    t_cluster = time.perf_counter() - t0

    t0 = time.perf_counter()
    cfetch = getdata.DataFetcher("dir", directoryName=paths["conDir"])
    # Pf=1e-12 = the reference default (construct.py:177); at 94 noise
    # templates x 22 station-days a looser Pf floods the run with
    # statistically-expected false alarms
    ss = detex_tpu.createSubSpace(Pf=1e-12, clust=clust, minEvents=2,
                                  conDatFetcher=cfetch)
    ss.attachPickTimes(pksFile=paths["phaseKey"], defaultDuration=20)
    ss.SVD(selectCriteria=2, selectValue=0.9, conDatNum=4,
           useSingles=True, backupThreshold=0.25)
    t_build = time.perf_counter() - t0
    n_ss = sum(len(df) for df in ss.subspaces.values())
    n_sg = sum(len(df) for df in ss.singles.values())
    print("built %d subspaces + %d singles across %d stations "
          "(cluster %.1f s, subspace+SVD+FAS %.1f s)"
          % (n_ss, n_sg, len(ss.clusters.stakey), t_cluster, t_build),
          flush=True)

    db = os.path.join(wd, "SubSpace.db")
    t0 = time.perf_counter()
    ss.detex(subspaceDB=db, useSubSpaces=True, useSingles=True,
             estimateMags=True, calcHist=True, batchSize=16)
    t_detex = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = _results.detResults(
        requiredNumStations=3, veriBuffer=4, ssDB=db,
        templateKey=paths["templateKey"], stationKey=paths["stationKey"],
        veriFile=paths["veriFile"], fetch=cfetch)
    t_assoc = time.perf_counter() - t0
    print("results:", repr(res), flush=True)

    vers = getattr(res, "Vers", None)
    n_verified = int(len(vers)) if vers is not None else 0
    station_days = 5 * span_hours / 24.0
    det_per_station = n_ss / max(len(ss.ssStations), 1) + \
        n_sg / max(len(ss.singStations), 1)
    print(json.dumps({
        "metric": "config-5 miniature: end-to-end detex() wall seconds "
                  "(5 stations x %d templates x %.1f station-days, "
                  "hist+mags on)" % (n_templates, station_days),
        "value": round(t_detex, 1),
        "unit": "s",
        "station_days_per_s": round(station_days / t_detex, 3),
        "detectors_per_station": round(det_per_station, 1),
        "stage_seconds": {"synth+cluster": round(t_cluster, 1),
                          "subspace+svd+fas": round(t_build, 1),
                          "detex": round(t_detex, 1),
                          "association": round(t_assoc, 1)},
        "verified": n_verified,
    }))


if __name__ == "__main__":
    main()
