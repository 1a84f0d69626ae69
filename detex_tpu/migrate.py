"""
Reference-pickle migration: load ClusterStream / SubSpace pickles written
by the original Detex package (class paths ``detex.subspace.*``,
``detex.getdata.DataFetcher``; reference subspace.py:261-267, 2018-2026 and
util.py:934-969) and convert them into live detex_tpu objects.

Mechanics: a custom Unpickler maps every class under the ``detex.``
namespace to inert shell types (plain attribute buckets) and decodes
Python-2-era byte strings as latin-1; the shells are then converted field
by field into detex_tpu's ClusterStream / Cluster / SubSpace /
DataFetcher. ``util.loadClusters`` / ``util.loadSubSpace`` fall back to
this path automatically when a pickle references the original package.

Limits: waveform payloads inside the pickled DataFrames must themselves be
loadable (numpy arrays and plain dicts are; pickles from very old pandas
may be beyond pandas' own compatibility shims). A converted fetcher keeps
its configuration; directory fetchers re-bind if the data directory exists
on this machine, otherwise the fetcher is set to None with a warning (set
``.fetcher`` / ``.cfetcher`` before fetching data).
"""
from __future__ import annotations

import pickle

import numpy as np

import detex_tpu


class _Shell(object):
    """Attribute bucket standing in for an unknown reference class."""


class _ShellClusterStream(_Shell):
    pass


class _ShellCluster(_Shell):
    pass


class _ShellSubSpace(_Shell):
    pass


class _ShellDataFetcher(_Shell):
    pass


def _placeholder(*_a, **_k):
    raise NotImplementedError(
        "a function from the original detex package was called on a "
        "migrated object; migrate/reconstruct the owning object instead")


_CLASS_MAP = {
    ("detex.subspace", "ClusterStream"): _ShellClusterStream,
    ("detex.subspace", "Cluster"): _ShellCluster,
    ("detex.subspace", "SubSpace"): _ShellSubSpace,
    ("detex.getdata", "DataFetcher"): _ShellDataFetcher,
}


class _RefUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        key = (str(module), str(name))
        if key in _CLASS_MAP:
            return _CLASS_MAP[key]
        if key[0] == "detex" or key[0].startswith("detex."):
            # any other reference class becomes a bucket; module-level
            # functions (e.g. the fetcher's bound _getStream) become
            # placeholders that raise if ever called
            return _Shell if (name[:1].isupper()) else _placeholder
        return super().find_class(module, name)


def load_reference_pickle(path):
    """Raw-load a reference pickle into shell objects (no conversion)."""
    with open(path, "rb") as fh:
        return _RefUnpickler(fh, encoding="latin1").load()


def is_reference_object(obj):
    return isinstance(obj, _Shell)


# ---------------------------------------------------------------------------
# shell -> detex_tpu conversion
# ---------------------------------------------------------------------------


def _convert_fetcher(shell):
    if shell is None or not isinstance(shell, _Shell):
        return shell
    from detex_tpu.data.fetcher import DataFetcher
    method = getattr(shell, "method", "dir")
    kwargs = {}
    for attr in ("removeResponse", "inventoryArg", "directoryName",
                 "opType", "prefilt", "conDatDuration", "conBuff",
                 "timeBeforeOrigin", "timeAfterOrigin", "checkData",
                 "fillZeros"):
        if hasattr(shell, attr):
            kwargs[attr] = getattr(shell, attr)
    kwargs.pop("inventoryArg", None)  # reference client objects don't carry
    try:
        return DataFetcher(method, **kwargs)
    except Exception:
        detex_tpu.log(__name__, "could not rebuild the pickled DataFetcher "
                      "(method=%s, directoryName=%s); set .fetcher/.cfetcher "
                      "manually before fetching data"
                      % (method, kwargs.get("directoryName")),
                      level="warning", pri=True)
        return None


def _convert_cluster(shell, temkey):
    from detex_tpu.subspace import Cluster
    c = Cluster.__new__(Cluster)
    c.link = np.asarray(shell.link, dtype=np.float64)
    c.DFcc = shell.DFcc
    c.station = shell.station
    c.temkey = getattr(shell, "temkey", temkey)
    c.key = list(shell.key)
    c.trim = getattr(shell, "trim", None)
    c.decimate = getattr(shell, "decimate", None)
    c.nonClustColor = "0.6"
    c.updateReqCC(float(shell.ccReq))
    return c


def convert_clusterstream(shell):
    """Reference ClusterStream shell -> detex_tpu ClusterStream."""
    from detex_tpu.subspace import ClusterStream
    cs = ClusterStream.__new__(ClusterStream)
    cs.trdf = shell.trdf
    cs.temkey = shell.temkey
    cs.stakey = getattr(shell, "stakey", None)
    cs.fetcher = _convert_fetcher(getattr(shell, "fetcher", None))
    cs.eventList = getattr(shell, "eventList", None)
    cs.ccReq = None
    cs.filt = getattr(shell, "filt", None)
    cs.decimate = getattr(shell, "decimate", None)
    cs.trim = getattr(shell, "trim", None)
    cs.filename = getattr(shell, "filename",
                          getattr(shell, "fileName", "clust.pkl"))
    cs.eventsOnAllStations = bool(getattr(shell, "eventsOnAllStations",
                                          False))
    cs.enforceOrigin = bool(getattr(shell, "enforceOrigin", False))
    cs.stalist = list(getattr(shell, "stalist",
                              shell.trdf.Station.values.tolist()))
    cs.stalist2 = [x.split(".")[1] for x in cs.stalist]
    cs.clusters = [_convert_cluster(c, cs.temkey) for c in shell.clusters]
    return cs


def convert_subspace(shell):
    """Reference SubSpace shell -> detex_tpu SubSpace."""
    from detex_tpu.subspace import SubSpace
    ss = SubSpace.__new__(SubSpace)
    ss.cfetcher = _convert_fetcher(getattr(shell, "cfetcher", None))
    cl = getattr(shell, "clusters", None)
    ss.clusters = convert_clusterstream(cl) \
        if isinstance(cl, _ShellClusterStream) else cl
    ss.subspaces = dict(getattr(shell, "subspaces", {}) or {})
    ss.singles = dict(getattr(shell, "singles", {}) or {})
    ss.singletons = ss.singles
    ss.dtype = getattr(shell, "dtype", "double")
    ss.Pf = getattr(shell, "Pf", 1e-12)
    ss.ssStations = sorted(ss.subspaces.keys())
    ss.singStations = sorted(ss.singles.keys())
    ss.Stations = sorted(set(ss.ssStations) | set(ss.singStations))
    ss._stakey2 = {x: x for x in ss.ssStations}
    ss._stakey1 = {x.split(".")[1]: x for x in ss.ssStations}
    return ss


def convert(obj):
    """Convert a raw-loaded reference object into its detex_tpu
    counterpart (pass-through for anything already native)."""
    if isinstance(obj, _ShellClusterStream):
        detex_tpu.log(__name__, "migrating a reference (original Detex) "
                      "ClusterStream pickle", pri=True)
        return convert_clusterstream(obj)
    if isinstance(obj, _ShellSubSpace):
        detex_tpu.log(__name__, "migrating a reference (original Detex) "
                      "SubSpace pickle", pri=True)
        return convert_subspace(obj)
    if isinstance(obj, _Shell):
        detex_tpu.log(__name__, "unrecognized reference object in pickle",
                      level="error")
    return obj


def load(path):
    """Load + convert a reference pickle in one call."""
    return convert(load_reference_pickle(path))
