"""
ctypes bindings for the native host library (native/detex_host.cpp).

Auto-builds the shared library with g++ on first use if a compiler is
available; every entry point has a numpy/scipy fallback so the framework
works without a toolchain. Use ``available()`` to check.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_DIR, "libdetex_host.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_DIR, "detex_host.cpp")
    stale = (os.path.exists(src) and os.path.exists(_SO) and
             os.path.getmtime(src) > os.path.getmtime(_SO))
    if not os.path.exists(_SO) or stale:
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src,
                            "-o", _SO], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            if not os.path.exists(_SO):
                return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.detex_sosfilt.argtypes = [dptr, ctypes.c_int, dptr, ctypes.c_int64,
                                  ctypes.c_int]
    lib.detex_detrend_linear.argtypes = [dptr, ctypes.c_int64]
    lib.detex_interleave.argtypes = [dptr, ctypes.c_int, ctypes.c_int64,
                                     dptr]
    lib.detex_prep_chunk.argtypes = [dptr, ctypes.c_int, ctypes.c_int64,
                                     dptr, ctypes.c_int, ctypes.c_int, dptr]
    lib.detex_prep_chunk.restype = ctypes.c_int
    lib.detex_rolling_std.argtypes = [dptr, ctypes.c_int64, ctypes.c_int64,
                                      dptr]
    u8ptr = ctypes.POINTER(ctypes.c_uint8)
    lib.detex_mseed_record.argtypes = [
        u8ptr, ctypes.c_int64, ctypes.c_char_p, dptr, dptr,
        ctypes.POINTER(ctypes.c_int32), dptr, ctypes.c_int64]
    lib.detex_mseed_record.restype = ctypes.c_int
    lib.detex_steim1_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, u8ptr,
        ctypes.c_int]
    lib.detex_steim1_encode.restype = ctypes.c_int
    lib.detex_steim2_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, u8ptr,
        ctypes.c_int]
    lib.detex_steim2_encode.restype = ctypes.c_int
    lib.detex_abi_version.restype = ctypes.c_int
    if lib.detex_abi_version() != 3:
        return None
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def _as_c(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def sosfilt(sos, data, zerophase=False):
    """In-place-sem SOS filter (returns a new array); scipy-compatible."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.float64).copy()
    sos = np.ascontiguousarray(sos, dtype=np.float64)
    if lib is None:
        from scipy import signal as _sig
        out = _sig.sosfilt(sos, data)
        if zerophase:
            out = _sig.sosfilt(sos, out[::-1])[::-1]
        return out
    lib.detex_sosfilt(_as_c(sos), sos.shape[0], _as_c(data), len(data),
                      1 if zerophase else 0)
    return data


def detrend_linear(data):
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.float64).copy()
    if lib is None:
        from scipy import signal as _sig
        return _sig.detrend(data, type="linear")
    lib.detex_detrend_linear(_as_c(data), len(data))
    return data


def interleave(chans):
    """Multiplex a [nc, n] channel stack (Fortran-flatten equivalent)."""
    lib = _load()
    chans = np.ascontiguousarray(chans, dtype=np.float64)
    if lib is None:
        return chans.flatten(order="F")
    nc, n = chans.shape
    out = np.empty(nc * n, dtype=np.float64)
    lib.detex_interleave(_as_c(chans), nc, n, _as_c(out))
    return out


def prep_chunk(chans, sos=None, zerophase=True):
    """Fused detrend -> bandpass -> interleave of a [nc, n] chunk."""
    lib = _load()
    chans = np.ascontiguousarray(chans, dtype=np.float64).copy()
    nc, n = chans.shape
    if lib is None:
        from scipy import signal as _sig
        for c in range(nc):
            chans[c] = _sig.detrend(chans[c], type="linear")
            if sos is not None:
                y = _sig.sosfilt(sos, chans[c])
                if zerophase:
                    y = _sig.sosfilt(sos, y[::-1])[::-1]
                chans[c] = y
        return chans.flatten(order="F")
    out = np.empty(nc * n, dtype=np.float64)
    if sos is None:
        sosarr = np.zeros((0, 6))
        nsec = 0
    else:
        sosarr = np.ascontiguousarray(sos, dtype=np.float64)
        nsec = sosarr.shape[0]
    lib.detex_prep_chunk(_as_c(chans), nc, n, _as_c(sosarr), nsec,
                         1 if zerophase else 0, _as_c(out))
    return out


def rolling_std(x, win):
    """Trailing rolling sample std (ddof=1), length len(x) - win + 1."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    if lib is None or len(x) < win or win < 2:
        from detex_tpu.detect import _np_rolling_std
        return _np_rolling_std(x, win)
    out = np.empty(len(x) - win + 1, dtype=np.float64)
    lib.detex_rolling_std(_as_c(x), len(x), win, _as_c(out))
    return out


def mseed_record(buf, offset, scratch=None):
    """Decode one miniSEED record from ``buf`` at ``offset``.

    Returns (reclen, id, t0, sr, samples[np.float64]); ``samples`` is
    empty for skippable records (unsupported encoding / corrupt payload
    — e.g. ASCII LOG channels real archives multiplex in). Raises
    IOError only when the record header is unparseable. ``scratch`` is
    an optional reusable >= 65536-float64 buffer (a fresh 512 KB
    allocation per record churns GBs over a day-long archive)."""
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable for miniSEED decoding")
    mv = np.frombuffer(buf, dtype=np.uint8, count=len(buf) - offset,
                       offset=offset)
    ident = ctypes.create_string_buffer(24)
    t0 = ctypes.c_double()
    sr = ctypes.c_double()
    ns = ctypes.c_int32()
    out = scratch if scratch is not None else np.empty(65536, np.float64)
    rc = lib.detex_mseed_record(
        mv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(mv),
        ident, ctypes.byref(t0), ctypes.byref(sr), ctypes.byref(ns),
        _as_c(out), len(out))
    if rc <= 0:
        raise IOError("miniSEED record decode failed (code %d) at "
                      "offset %d" % (rc, offset))
    n = int(ns.value)
    samples = out[:n].copy() if n > 0 else np.empty(0, np.float64)
    return rc, ident.value.decode(), t0.value, sr.value, samples


def steim1_encode(samples, nframes):
    """STEIM1-encode int32 ``samples`` into ``nframes`` 64-byte frames.
    Returns (n_encoded, frame_bytes)."""
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable for miniSEED encoding")
    x = np.ascontiguousarray(samples, dtype=np.int32)
    out = np.zeros(nframes * 64, np.uint8)
    got = lib.detex_steim1_encode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nframes)
    return int(got), out.tobytes()


def steim2_encode(samples, nframes):
    """STEIM2-encode int32 ``samples`` into ``nframes`` 64-byte frames.
    Returns (n_encoded, frame_bytes). Raises ValueError when a
    sample-to-sample difference exceeds STEIM2's 30-bit range."""
    lib = _load()
    if lib is None:
        raise IOError("native library unavailable for miniSEED encoding")
    x = np.ascontiguousarray(samples, dtype=np.int32)
    out = np.zeros(nframes * 64, np.uint8)
    got = lib.detex_steim2_encode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(x),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nframes)
    if got < 0:
        raise ValueError("STEIM2 cannot encode a sample-to-sample "
                         "difference beyond 30 bits; use STEIM1")
    return int(got), out.tobytes()
