"""
End-to-end tutorial runner / verification drive: the 5-step Detex workflow
(docs/tutorial.md) on a synthetic dataset with planted events. The final
VERDICT-DATA line must report verified == expected — this is the
executable form of the docs (the reference ran its tutorials under nbval
as its de-facto regression suite, SURVEY.md section 4).
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))
wd = tempfile.mkdtemp(prefix="detex_verify_")
os.chdir(wd)

import detex_tpu
from detex_tpu.data.synth import SynthCatalog
from detex_tpu.data import fetcher as getdata
from detex_tpu import results, util

print("== step 0: synthesize a dataset (stand-in for makeDataDirectories)")
cat = SynthCatalog(n_sources=2, events_per_source=3, n_singles=1,
                   n_stations=2, sr=25.0, span_hours=20, seed=1, noise=0.04)
cat.add_hidden_events(n=2, mag=1.4, sources=[0, 1])
paths = cat.write_directories(wd, tb4=10, taft=60)
print("   wrote", paths["eventDir"], "and", paths["conDir"])

print("== step 1: createCluster")
clust = detex_tpu.createCluster(
    CCreq=0.5, fetch_arg=paths["eventDir"], filt=[1, 8, 2, True],
    stationKey=paths["stationKey"], templateKey=paths["templateKey"],
    trim=[10, 60], fileName=os.path.join(wd, "clust.pkl"))
for cl in clust.clusters:
    print("   %s: clusters=%s singles=%s"
          % (cl.station, [sorted(c)[:1] for c in cl.clusts], cl.singles))
    print("   cluster sizes:", [len(c) for c in cl.clusts])

print("== step 2: createSubSpace + attachPickTimes + SVD")
cfetch = getdata.DataFetcher("dir", directoryName=paths["conDir"])
ss = detex_tpu.createSubSpace(Pf=1e-9, clust=clust, conDatFetcher=cfetch)
ss.attachPickTimes(pksFile=paths["phaseKey"], defaultDuration=20)
ss.SVD(selectCriteria=2, selectValue=0.9, conDatNum=4, useSingles=True,
       backupThreshold=0.25)
for sta in ss.ssStations:
    for _, row in ss.subspaces[sta].iterrows():
        print("   %s %s: NumBasis=%d Threshold=%.3f events=%d"
              % (sta, row.Name, row.NumBasis, row.Threshold,
                 len(row.Events)))

print("== step 3: detex() continuous scan")
db = os.path.join(wd, "SubSpace.db")
ss.detex(subspaceDB=db, useSingles=True)
ssdf = util.loadSQLite(db, "ss_df")
sgdf = util.loadSQLite(db, "sg_df")
print("   ss_df rows:", 0 if ssdf is None else len(ssdf),
      "| sg_df rows:", 0 if sgdf is None else len(sgdf))
if ssdf is not None:
    print(ssdf[["DS", "Name", "Sta", "Mag", "SNR"]].head(8).to_string())

print("== step 4: detResults association + verification")
res = results.detResults(requiredNumStations=2, veriBuffer=4, ssDB=db,
                         templateKey=paths["templateKey"],
                         stationKey=paths["stationKey"],
                         veriFile=paths["veriFile"], fetch=cfetch)
print("  ", repr(res))
print("   hidden planted events:", [detex_tpu.core.UTCDateTime(e['time'])
                                    for e in cat.hidden])
if res.Vers is not None and len(res.Vers):
    print(res.Vers[["Event", "DSav", "NumStations", "Mag",
                    "VerName"]].to_string())
print("   planted mags:", [round(e["mag"], 2) for e in cat.hidden])
print("VERDICT-DATA: verified=%d expected=%d autos=%d newdets=%d"
      % (len(res.Vers) if res.Vers is not None else 0, len(cat.hidden),
         len(res.Autos), len(res.Dets)))
