"""
Host-side signal conditioning: Butterworth bandpass/lowpass/highpass with
obspy-compatible semantics, linear detrend and decimation.

The reference delegates these to obspy (construct.py:990-1030 uses
``st.filter('bandpass', freqmin, freqmax, corners, zerophase)`` and
``st.decimate``). detex_tpu implements them directly on numpy arrays with
scipy.signal; a native C++ implementation can be swapped in via
``detex_tpu.native`` when built (same function signatures).

Note on zerophase: obspy applies the SOS filter forward then backward
*without* padding (not scipy.filtfilt); we reproduce that exactly so filter
transients match the behavior the reference pipeline was built around.
"""
from __future__ import annotations

import numpy as np
from scipy import signal as _sig

_sos_cache = {}


def _bandpass_sos(freqmin, freqmax, sr, corners):
    key = ("bp", float(freqmin), float(freqmax), float(sr), int(corners))
    sos = _sos_cache.get(key)
    if sos is None:
        nyq = 0.5 * sr
        low = freqmin / nyq
        high = freqmax / nyq
        if high >= 1.0:
            high = 1.0 - 1e-6
        sos = _sig.iirfilter(corners, [low, high], btype="band",
                             ftype="butter", output="sos")
        _sos_cache[key] = sos
    return sos


def bandpass(data, freqmin, freqmax, sr, corners=4, zerophase=False):
    """Butterworth bandpass, matching obspy.signal.filter.bandpass.
    Uses the native C++ SOS kernel when built (detex_tpu.native)."""
    sos = _bandpass_sos(freqmin, freqmax, sr, corners)
    from detex_tpu import native as _native
    if _native.available():
        return _native.sosfilt(sos, data, zerophase=zerophase)
    out = _sig.sosfilt(sos, np.asarray(data))
    if zerophase:
        out = _sig.sosfilt(sos, out[::-1])[::-1]
    return out


def lowpass(data, freq, sr, corners=4, zerophase=False):
    nyq = 0.5 * sr
    sos = _sig.iirfilter(corners, freq / nyq, btype="lowpass",
                         ftype="butter", output="sos")
    out = _sig.sosfilt(sos, np.asarray(data))
    if zerophase:
        out = _sig.sosfilt(sos, out[::-1])[::-1]
    return out


def highpass(data, freq, sr, corners=4, zerophase=False):
    nyq = 0.5 * sr
    sos = _sig.iirfilter(corners, freq / nyq, btype="highpass",
                         ftype="butter", output="sos")
    out = _sig.sosfilt(sos, np.asarray(data))
    if zerophase:
        out = _sig.sosfilt(sos, out[::-1])[::-1]
    return out


def detrend_linear(data):
    """Remove a best-fit line (native C++ when built, else scipy)."""
    from detex_tpu import native as _native
    if _native.available():
        return _native.detrend_linear(data)
    return _sig.detrend(np.asarray(data, dtype=np.float64), type="linear")


def demean(data):
    data = np.asarray(data)
    return data - data.mean()


def decimate(data, factor, sr):
    """
    Integer decimation with anti-alias lowpass (zero-phase), analogous to
    obspy Trace.decimate (which lowpasses at 0.4 * new Nyquist then strides).
    """
    factor = int(factor)
    if factor == 1:
        return np.asarray(data)
    # obspy uses a lowpass cheby2/butter before striding; we lowpass at 40% of
    # the new Nyquist frequency for a comparable passband.
    new_nyq = 0.5 * sr / factor
    out = lowpass(data, 0.8 * new_nyq, sr, corners=8, zerophase=True)
    return out[::factor]
