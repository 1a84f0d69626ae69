"""
Float64 oracle of the complete detection chain with reference semantics.

Every stage is an independent numpy/scipy/pandas implementation of the
reference's math — no detex_tpu device kernels, no native library:

  - channel conditioning: linear detrend + Butterworth bandpass applied
    forward then reverse (obspy zerophase semantics; reference
    construct.py:990-1030)
  - multiplexing: Fortran-order channel interleave (construct.py:928-987)
  - detection statistic: FFT correlation per basis vector, mean term
    subtracted, sum of squares over the basis divided by the rolling
    window power (n * sample variance), strided by Nc (_MPXDS,
    detect.py:559-578) — computed here with scipy.signal.fftconvolve and
    pandas rolling statistics rather than the production kernel's math
  - STA/LTA of the DS: centered rolling means of |DS| with pandas-style
    edge handling (_getStaLtaArray, detect.py:501-524)
  - triggering: iterative argmax-above-threshold with the reference's
    three-case +/-20 s zeroing (_CreateCoeffArray detect.py:390-445,
    _downPlayArrayAroundMax :545-557)
  - magnitudes: CC^2-weighted projected-energy and std-ratio estimates,
    SNR from the median rolling std of pre-event noise (_estMag
    detect.py:447-499)

tests/test_parity_oracle.py drives the production engine and this oracle
over the same continuous stream and requires the emitted detection lists
to agree: indices exact, DS to 1e-6 (BASELINE north-star parity clause).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from scipy import signal as _sig


# ---------------------------------------------------------------------------
# conditioning + multiplex
# ---------------------------------------------------------------------------


def bandpass(x, filt, sr):
    """Butterworth bandpass; filt = (freqmin, freqmax, corners, zerophase).
    zerophase applies the SOS cascade forward then reverse without padding
    (obspy semantics)."""
    fmin, fmax, corners, zerophase = filt
    nyq = 0.5 * sr
    hi = min(fmax / nyq, 1.0 - 1e-6)
    sos = _sig.iirfilter(int(corners), [fmin / nyq, hi], btype="band",
                         ftype="butter", output="sos")
    y = _sig.sosfilt(sos, np.asarray(x, np.float64))
    if zerophase:
        y = _sig.sosfilt(sos, y[::-1])[::-1]
    return y


def prep_stream(st, filt):
    """Condition one continuous Stream the way the detection engine does
    (sort, common-window trim, detrend, bandpass) and interleave: returns
    (MPcon float64, sampling_rate, start_timestamp)."""
    st = st.copy()
    st.sort()
    t0 = max(tr.stats.starttime.timestamp for tr in st)
    t1 = min(tr.stats.endtime.timestamp for tr in st)
    from detex_tpu.core.utc import UTCDateTime
    st.trim(starttime=UTCDateTime(t0), endtime=UTCDateTime(t1))
    sr = st[0].stats.sampling_rate
    chans = []
    for tr in st:
        x = _sig.detrend(np.asarray(tr.data, np.float64), type="linear")
        if filt is not None:
            x = bandpass(x, filt, sr)
        chans.append(x)
    L = min(len(c) for c in chans)
    mux = np.stack([c[:L] for c in chans]).flatten(order="F")
    return mux, sr, st[0].stats.starttime.timestamp


# ---------------------------------------------------------------------------
# detection statistic
# ---------------------------------------------------------------------------


def detection_statistic(mpcon, U, nc):
    """DS of a multiplexed float64 chunk against basis U [D, n]; returns
    the channel-strided statistic (length (Lc - n)//nc + 1)."""
    x = pd.Series(np.asarray(mpcon, np.float64))
    U = np.asarray(U, np.float64)
    n = U.shape[1]
    win_mean = x.rolling(n).mean().to_numpy()[n - 1:]
    win_var = x.rolling(n).var().to_numpy()[n - 1:]       # sample var
    power = win_var * n
    xv = x.to_numpy()
    num = np.zeros(len(xv) - n + 1)
    for u in U:
        cc = _sig.fftconvolve(xv, u[::-1], mode="valid")
        num += (cc - u.sum() * win_mean) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        ds = num / power
    return ds[::nc]


def ds_stalta(ds, lta_samps, sta_samps):
    """Centered STA/LTA of the DS with pandas rolling means; NaN edges take
    the first-interior/last-valid values (reference detect.py:501-524)."""
    ab = pd.Series(np.abs(np.asarray(ds, np.float64)))
    sta_n = max(int(sta_samps), 1)
    lta_n = max(int(lta_samps), 1)
    sta = ab.to_numpy() if sta_n <= 1 else \
        ab.rolling(sta_n, center=True).mean().to_numpy()
    lta = ab.rolling(lta_n, center=True).mean().to_numpy()

    def fill(a):
        a = np.array(a, copy=True)
        good = np.flatnonzero(~np.isnan(a))
        if len(good):
            first, last = good[0], good[-1]
            a[:first] = a[min(first + 1, len(a) - 1)]
            a[last + 1:] = a[last]
        return a

    return fill(sta) / fill(lta)


# ---------------------------------------------------------------------------
# triggering + magnitudes
# ---------------------------------------------------------------------------


def extract_triggers(ceval, threshold, buff_samps, max_triggers=4096):
    """Descending-maximum trigger extraction with the reference's
    three-case suppression window."""
    c = np.array(ceval, np.float64, copy=True)
    L = len(c)
    hits = []
    while len(hits) < max_triggers and L and c.max() >= threshold:
        i = int(np.argmax(c))
        hits.append(i)
        if i < buff_samps + 1:
            c[0: i + buff_samps] = 0.0
        elif i > L - buff_samps:
            c[i - buff_samps:] = 0.0
        else:
            c[i - buff_samps: i + buff_samps] = 0.0
    return hits


def estimate_mags(trig_index, mpcon, nc, U_used, wfs, mags, issubspace):
    """(ProEnMag, Mag, SNR) of one trigger; wfs [N, WFlen] are the trimmed
    aligned training waveforms, mags their catalog magnitudes."""
    wfs = np.asarray(wfs, np.float64)
    mags = np.asarray(mags, np.float64)
    U = np.asarray(U_used, np.float64)
    UtU = U.T @ U
    WFU = wfs @ UtU
    wflen = wfs.shape[1]
    i0 = trig_index * nc
    con = np.asarray(mpcon[i0: i0 + wflen], np.float64)
    if len(con) < wflen:
        return np.nan, np.nan, np.nan
    # SNR: median rolling sample-std of the pre-event noise window
    if i0 > 5 * wflen:
        noise = mpcon[i0 - 5 * wflen: i0]
    else:
        noise = mpcon[i0: i0 + 7 * wflen]
    rstd = pd.Series(noise).rolling(wflen).std().dropna().to_numpy()
    base = np.median(rstd) if len(rstd) else np.nan
    snr = np.std(con) / base if base else np.nan
    usable = mags > -15
    if issubspace:
        if not usable.any():
            return np.nan, np.nan, snr
        pro_en = np.var(UtU @ con) / np.var(WFU, axis=1)
        norm_t = (wfs - wfs.mean(axis=1, keepdims=True)) / \
            (wfs.std(axis=1, keepdims=True) * wflen)
        cors = (norm_t @ con - norm_t.sum(axis=1) * con.mean()) / con.std()
        w = (cors ** 2)[usable]
        pe = np.sum((mags[usable] + np.log10(np.sqrt(pro_en[usable]))) * w)
        sd = np.sum((mags[usable] +
                     np.log10(np.std(con) / np.std(wfs, axis=1)[usable]))
                    * w)
        return pe / w.sum(), sd / w.sum(), snr
    if np.isnan(mags[0]) or mags[0] < -15:
        return np.nan, np.nan, snr
    pe = mags[0] + np.dot(con, WFU[0]) / np.dot(WFU[0], WFU[0])
    sd = mags[0] + np.log10(np.std(con) / np.std(WFU[0]))
    return pe, sd, snr


# ---------------------------------------------------------------------------
# full chain over one station
# ---------------------------------------------------------------------------


def scan_station(datGen, detectors, nc, filt, trigger_lta=5,
                 trigger_sta=0, buff_sec=20.0, estimateMags=True,
                 issubspace=True):
    """
    Run the oracle chain over a (stream, t1, t2) generator against
    ``detectors`` = {name: dict(U [D, n], threshold, offsets, wfs, mags)}.
    Returns a DataFrame with the production ss_df columns.
    """
    rows = []
    for st, _u1, _u2 in datGen:
        if st is None or len(st) < 1:
            continue
        mpcon, sr, tstamp = prep_stream(st, filt)
        for name, det in detectors.items():
            U = np.asarray(det["U"], np.float64)
            if len(mpcon) <= U.shape[1]:
                continue
            ds = detection_statistic(mpcon, U, nc)
            if len(ds) < 10:
                continue
            if ds.max() > 1.1:
                ds = np.where(np.isfinite(ds), ds, 0.0)
            stalta = ds_stalta(ds, trigger_lta * sr, trigger_sta * sr) \
                if trigger_lta else None
            if not ds.max() > det["threshold"]:
                continue
            hits = extract_triggers(ds, det["threshold"],
                                    int(buff_sec * sr))
            offs = np.atleast_1d(det["offsets"])
            for i in hits:
                if estimateMags:
                    pe, mag, snr = estimate_mags(
                        i, mpcon, nc, det["U"], det["wfs"],
                        det["mags"], issubspace)
                else:
                    pe, mag, snr = np.nan, np.nan, np.nan
                t = i / sr + tstamp
                rows.append(dict(
                    DS=float(ds[i]),
                    DS_STALTA=float(stalta[i]) if stalta is not None
                    else 0.0,
                    STMP=t, Name=name, Sta=det["sta"],
                    MSTAMPmin=t - offs.max(), MSTAMPmax=t - offs.min(),
                    Mag=mag, SNR=snr, ProEnMag=pe))
    cols = ["DS", "DS_STALTA", "STMP", "Name", "Sta", "MSTAMPmin",
            "MSTAMPmax", "Mag", "SNR", "ProEnMag"]
    return pd.DataFrame(rows, columns=cols)
