"""
Lightweight numpy-backed Trace/Stream containers.

The reference uses obspy Stream/Trace everywhere; detex_tpu's host layer uses
these minimal containers instead (obspy remains an optional interop path via
detex_tpu.data.obspy_compat). Gaps are represented as NaN runs inside a
merged trace; ``split()`` recovers contiguous segments, mirroring obspy's
masked-array merge/split semantics (used by the reference at
getdata.py:601-608 and construct.py:990-1030).
"""
from __future__ import annotations

import copy as _copy
import json

import numpy as np

from detex_tpu.core import filters as _filters
from detex_tpu.core.utc import UTCDateTime


class Stats(dict):
    """Attribute-style dict of trace metadata."""

    _defaults = dict(network="", station="", location="", channel="",
                     sampling_rate=1.0)

    def __init__(self, header=None):
        super().__init__()
        self.update(self._defaults)
        self["starttime"] = UTCDateTime(0.0)
        self["npts"] = 0
        self["processing"] = []
        if header:
            for k, v in dict(header).items():
                self[k] = v

    def __setitem__(self, key, value):
        if key == "starttime":
            value = UTCDateTime(value)
        if key == "sampling_rate":
            value = float(value)
        super().__setitem__(key, value)

    def __getattr__(self, name):
        if name == "delta":
            return 1.0 / self["sampling_rate"]
        if name == "endtime":
            n = max(self["npts"] - 1, 0)
            return self["starttime"] + n * (1.0 / self["sampling_rate"])
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def copy(self):
        new = Stats()
        for k, v in self.items():
            new[k] = _copy.copy(v)
        return new


class Trace(object):
    """A single-channel contiguous (or NaN-gapped) waveform segment."""

    def __init__(self, data=None, header=None):
        if data is None:
            data = np.array([], dtype=np.float64)
        self.data = np.asarray(data)
        self.stats = header if isinstance(header, Stats) else Stats(header)
        self.stats["npts"] = len(self.data)

    # -- basic ------------------------------------------------------------
    @property
    def id(self):
        s = self.stats
        return "%s.%s.%s.%s" % (s.network, s.station, s.location, s.channel)

    def copy(self):
        tr = Trace(self.data.copy(), self.stats.copy())
        return tr

    def __len__(self):
        return len(self.data)

    def __repr__(self):
        s = self.stats
        return ("%s | %s - %s | %.1f Hz, %d samples"
                % (self.id, s.starttime, s.endtime, s.sampling_rate,
                   len(self.data)))

    def _record(self, step):
        self.stats.processing = list(self.stats.processing) + [step]

    # -- processing ---------------------------------------------------------
    def detrend(self, type="linear"):
        if len(self.data) > 1:
            if type == "linear":
                self.data = _filters.detrend_linear(self.data)
            elif type in ("constant", "demean"):
                self.data = _filters.demean(self.data)
            else:
                raise ValueError("unsupported detrend type %s" % type)
        self._record("detrend:%s" % type)
        return self

    def filter(self, ftype, **kw):
        sr = self.stats.sampling_rate
        if ftype == "bandpass":
            self.data = _filters.bandpass(
                self.data, kw["freqmin"], kw["freqmax"], sr,
                corners=kw.get("corners", 4),
                zerophase=kw.get("zerophase", False))
        elif ftype == "lowpass":
            self.data = _filters.lowpass(self.data, kw["freq"], sr,
                                         corners=kw.get("corners", 4),
                                         zerophase=kw.get("zerophase", False))
        elif ftype == "highpass":
            self.data = _filters.highpass(self.data, kw["freq"], sr,
                                          corners=kw.get("corners", 4),
                                          zerophase=kw.get("zerophase", False))
        else:
            raise ValueError("unsupported filter %s" % ftype)
        self._record("filter:%s:%s" % (ftype, json.dumps(kw, sort_keys=True)))
        return self

    def decimate(self, factor):
        self.data = _filters.decimate(self.data, factor,
                                      self.stats.sampling_rate)
        self.stats.sampling_rate = self.stats.sampling_rate / factor
        self.stats.npts = len(self.data)
        self._record("decimate:%d" % factor)
        return self

    # -- windowing ----------------------------------------------------------
    def trim(self, starttime=None, endtime=None, pad=False, fill_value=None):
        sr = self.stats.sampling_rate
        t0 = self.stats.starttime.timestamp
        n = len(self.data)
        i0, i1 = 0, n
        if starttime is not None:
            ts = UTCDateTime(starttime).timestamp
            i0 = int(round((ts - t0) * sr))
        if endtime is not None:
            te = UTCDateTime(endtime).timestamp
            i1 = int(round((te - t0) * sr)) + 1
        if not pad:
            i0c, i1c = max(i0, 0), min(i1, n)
            if i1c <= i0c:
                self.data = self.data[:0]
            else:
                self.data = self.data[i0c:i1c]
            self.stats.starttime = UTCDateTime(t0 + max(i0, 0) / sr)
        else:
            fv = 0.0 if fill_value is None else fill_value
            new = np.full(max(i1 - i0, 0), fv, dtype=self.data.dtype
                          if self.data.dtype.kind == "f" else np.float64)
            src0, src1 = max(i0, 0), min(i1, n)
            if src1 > src0:
                new[src0 - i0: src1 - i0] = self.data[src0:src1]
            self.data = new
            self.stats.starttime = UTCDateTime(t0 + i0 / sr)
        self.stats.npts = len(self.data)
        return self

    def slice(self, starttime=None, endtime=None):
        return self.copy().trim(starttime, endtime)

    def split(self):
        """Split a NaN-gapped trace into contiguous segments (a Stream)."""
        data = self.data
        if data.dtype.kind != "f" or not np.isnan(data).any():
            return Stream([self.copy()])
        isn = np.isnan(data)
        out = Stream()
        # find runs of valid data
        valid = ~isn
        if not valid.any():
            return out
        edges = np.flatnonzero(np.diff(valid.astype(np.int8)))
        starts = ([0] if valid[0] else []) + (edges + 1)[valid[edges + 1]].tolist()
        ends = (edges + 1)[~valid[edges + 1]].tolist() + \
            ([len(data)] if valid[-1] else [])
        sr = self.stats.sampling_rate
        t0 = self.stats.starttime.timestamp
        for a, b in zip(starts, ends):
            tr = Trace(data[a:b].copy(), self.stats.copy())
            tr.stats.starttime = UTCDateTime(t0 + a / sr)
            tr.stats.npts = b - a
            out.append(tr)
        return out


class Stream(object):
    """A list of Traces with obspy-like bulk operations."""

    def __init__(self, traces=None):
        if traces is None:
            traces = []
        if isinstance(traces, Trace):
            traces = [traces]
        self.traces = list(traces)

    # -- container protocol -------------------------------------------------
    def __len__(self):
        return len(self.traces)

    def __iter__(self):
        return iter(self.traces)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return Stream(self.traces[i])
        return self.traces[i]

    def __add__(self, other):
        if isinstance(other, Trace):
            return Stream(self.traces + [other])
        return Stream(self.traces + list(other))

    def __iadd__(self, other):
        if isinstance(other, Trace):
            self.traces.append(other)
        else:
            self.traces.extend(list(other))
        return self

    def append(self, tr):
        self.traces.append(tr)
        return self

    def __repr__(self):
        head = "%d Trace(s) in Stream:" % len(self)
        return "\n".join([head] + [repr(t) for t in self.traces])

    def copy(self):
        return Stream([t.copy() for t in self.traces])

    # -- selection ------------------------------------------------------------
    def select(self, network=None, station=None, location=None, channel=None,
               component=None):
        out = []
        for tr in self.traces:
            s = tr.stats
            if network is not None and not _wmatch(s.network, network):
                continue
            if station is not None and not _wmatch(s.station, station):
                continue
            if location is not None and not _wmatch(s.location, location):
                continue
            if channel is not None and not _wmatch(s.channel, channel):
                continue
            if component is not None:
                if len(s.channel) == 0 or s.channel[-1] != component:
                    continue
            out.append(tr)
        return Stream(out)

    def sort(self, keys=("network", "station", "location", "channel",
                         "starttime")):
        def keyfun(tr):
            vals = []
            for k in keys:
                v = getattr(tr.stats, k)
                if isinstance(v, UTCDateTime):
                    v = v.timestamp
                vals.append(v)
            return tuple(vals)
        self.traces.sort(key=keyfun)
        return self

    # -- bulk processing ------------------------------------------------------
    def detrend(self, type="linear"):
        for tr in self.traces:
            tr.detrend(type)
        return self

    def filter(self, ftype, **kw):
        for tr in self.traces:
            tr.filter(ftype, **kw)
        return self

    def decimate(self, factor):
        for tr in self.traces:
            tr.decimate(factor)
        return self

    def trim(self, starttime=None, endtime=None, pad=False, fill_value=None):
        for tr in self.traces:
            tr.trim(starttime, endtime, pad=pad, fill_value=fill_value)
        self.traces = [t for t in self.traces if len(t) > 0]
        return self

    def split(self):
        out = Stream()
        for tr in self.traces:
            out += tr.split()
        return out

    def merge(self, method=1, fill_value=None):
        """
        Merge traces sharing an id. Overlaps: later traces overwrite
        (obspy method=1 semantics as used by the reference). Gaps become
        ``fill_value`` samples, or NaN when fill_value is None (recoverable
        via split()).
        """
        groups = {}
        for tr in self.traces:
            groups.setdefault((tr.id, round(tr.stats.sampling_rate, 6)),
                              []).append(tr)
        merged = []
        for (tid, sr), trs in groups.items():
            if len(trs) == 1:
                merged.append(trs[0])
                continue
            trs.sort(key=lambda t: t.stats.starttime.timestamp)
            t0 = min(t.stats.starttime.timestamp for t in trs)
            t1 = max(t.stats.endtime.timestamp for t in trs)
            n = int(round((t1 - t0) * sr)) + 1
            fv = np.nan if fill_value is None else fill_value
            buf = np.full(n, fv, dtype=np.float64)
            for t in trs:
                off = int(round((t.stats.starttime.timestamp - t0) * sr))
                buf[off: off + len(t.data)] = t.data
            out = Trace(buf, trs[0].stats.copy())
            out.stats.starttime = UTCDateTime(t0)
            out.stats.npts = n
            merged.append(out)
        merged.sort(key=lambda t: (t.id, t.stats.starttime.timestamp))
        self.traces = merged
        return self

    def get_gaps(self):
        """List of gaps [net, sta, loc, chan, t1, t2, delta_sec, nsamples]."""
        gaps = []
        byid = {}
        for tr in self.traces:
            byid.setdefault(tr.id, []).append(tr)
        for tid, trs in byid.items():
            trs.sort(key=lambda t: t.stats.starttime.timestamp)
            for a, b in zip(trs[:-1], trs[1:]):
                dt = b.stats.starttime.timestamp - a.stats.endtime.timestamp
                sr = a.stats.sampling_rate
                if dt > 1.5 / sr:
                    s = a.stats
                    gaps.append([s.network, s.station, s.location, s.channel,
                                 a.stats.endtime, b.stats.starttime, dt,
                                 int(round(dt * sr)) - 1])
        return gaps

    # -- IO ---------------------------------------------------------------
    def write(self, path, format="npz"):
        from detex_tpu.data import waveio
        waveio.write_stream(self, path, format=format)

    def max(self):
        return [float(np.nanmax(np.abs(t.data))) if len(t) else 0.0
                for t in self.traces]


def _wmatch(value, pattern):
    """Glob-ish matching for seed id fields ('*', '?' wildcards)."""
    import fnmatch
    return fnmatch.fnmatch(str(value), str(pattern))
