"""
Key-file (CSV "keys") reading and validation.

Mirrors reference detex/util.py:563-696: template / station / phases keys
with required-column validation, blank-row filtering, and sorting.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

import detex_tpu

# required key columns (reference util.py:566-571)
req_temkey = set(["TIME", "NAME", "LAT", "LON", "MAG", "DEPTH"])
req_stakey = set(["NETWORK", "STATION", "STARTTIME", "ENDTIME", "LAT",
                  "LON", "ELEVATION", "CHANNELS"])
req_phases = set(["TimeStamp", "Event", "Station", "Phase"])
req_columns = {"template": req_temkey, "station": req_stakey,
               "phases": req_phases}


def readKey(dfkey, key_type="template"):
    """
    Read a key csv (or accept a DataFrame) and validate required columns.
    See reference util.py:574-627.
    """
    key_types = list(req_columns.keys())
    if key_type not in key_types:
        detex_tpu.log(__name__, "unsupported key type, supported types are %s"
                      % key_types, level="error")
    if isinstance(dfkey, str):
        if not os.path.exists(dfkey):
            detex_tpu.log(__name__, "%s does not exist, check path" % dfkey,
                          level="error")
        df = pd.read_csv(dfkey)
    elif isinstance(dfkey, pd.DataFrame):
        df = dfkey.copy()
    else:
        detex_tpu.log(__name__, "Data type of dfkey not understood",
                      level="error")

    if not req_columns[key_type].issubset(df.columns):
        msg = ("Required columns not in %s, required columns for %s key are "
               "%s" % (list(df.columns), key_type,
                       sorted(req_columns[key_type])))
        detex_tpu.log(__name__, msg, level="error")

    # drop rows with empty strings in required columns
    tdf = df.loc[:, sorted(req_columns[key_type])]
    cond = [all([x != "" for x in row]) for _, row in tdf.iterrows()]
    df = df[np.array(cond, dtype=bool)]

    df = df.sort_values(by=sorted(req_columns[key_type]))
    df = df.reset_index(drop=True)
    if key_type == "station":
        df["STATION"] = [str(x) for x in df["STATION"]]
        df["NETWORK"] = [str(x) for x in df["NETWORK"]]
    return df
