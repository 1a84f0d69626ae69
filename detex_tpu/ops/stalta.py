"""
STA/LTA kernels: the centered STA/LTA of the detection statistic
(reference detect.py:501-524) and the classic STA/LTA used as the FAS noise
veto (reference fas.py:175-205 via obspy classic_sta_lta).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from detex_tpu.ops.rolling import rolling_mean_centered


def _replace_nan_with_edges(arr):
    """Reference _replaceNanWithMean (detect.py:516-524): leading NaNs get
    the value at index first+1, trailing NaNs the value at last."""
    arr = np.asarray(arr, dtype=np.float64)
    ind = np.where(~np.isnan(arr))[0]
    if len(ind) == 0:
        return arr
    first, last = ind[0], ind[-1]
    arr[:first] = arr[min(first + 1, len(arr) - 1)]
    arr[last + 1:] = arr[last]
    return arr


@partial(jax.jit, static_argnames=("sta", "lta"))
def _stalta_kernel(c, sta, lta):
    ab = jnp.abs(c)
    if sta <= 1:
        sta_arr = ab
    else:
        sta_arr = rolling_mean_centered(ab, sta)
    lta_arr = rolling_mean_centered(ab, lta)

    def fill_edges(a):
        valid = ~jnp.isnan(a)
        idx = jnp.arange(a.shape[0])
        first = jnp.argmax(valid)
        last = a.shape[0] - 1 - jnp.argmax(valid[::-1])
        lead = a[jnp.minimum(first + 1, a.shape[0] - 1)]
        trail = a[last]
        out = jnp.where(idx < first, lead, a)
        out = jnp.where(idx > last, trail, out)
        return out

    sta_arr = fill_edges(sta_arr)
    lta_arr = fill_edges(lta_arr)
    return sta_arr / lta_arr


def ds_stalta(c, lta_samps, sta_samps):
    """
    Centered STA/LTA of a detection-statistic vector, matching the reference
    (_getStaLtaArray): STA window of 0/1 means the raw |DS| is used.
    """
    c = jnp.asarray(c)
    sta = max(int(sta_samps), 0)
    lta = max(int(lta_samps), 1)
    if sta == 0:
        sta = 1
    return _stalta_kernel(c, sta, lta)


def _centered_mean_np(x, n):
    """float64 centered rolling mean with the same labeling convention as
    rolling.rolling_mean_centered (pandas center=True); NaN edges."""
    x = np.asarray(x, np.float64)
    L = len(x)
    c = np.cumsum(np.insert(x, 0, 0.0))
    mu = (c[n:] - c[:-n]) / n
    out = np.full(L, np.nan)
    start = (n - 1) - ((n - 1) // 2)
    out[start:start + len(mu)] = mu
    return out


def ds_stalta_np(c, lta_samps, sta_samps):
    """Host float64 twin of ds_stalta, used by the dtype='double' exact
    path (no device f32 cast)."""
    ab = np.abs(np.asarray(c, np.float64))
    sta = max(int(sta_samps), 1)
    lta = max(int(lta_samps), 1)
    sta_arr = ab if sta <= 1 else _centered_mean_np(ab, sta)
    lta_arr = _centered_mean_np(ab, lta)
    return (_replace_nan_with_edges(sta_arr) /
            _replace_nan_with_edges(lta_arr))


def classic_sta_lta(data, nsta, nlta):
    """
    Classic STA/LTA (numpy, matching obspy.signal.trigger.classic_sta_lta):
    ratio of trailing means of x^2; the first nlta samples are zeroed.
    Used for the FAS noise veto (fas.py:175-205).
    """
    data = np.asarray(data, dtype=np.float64)
    nsta = max(int(nsta), 1)
    nlta = max(int(nlta), 1)
    sq = data ** 2
    c = np.cumsum(np.insert(sq, 0, 0.0))
    sta = np.empty_like(sq)
    lta = np.empty_like(sq)
    # trailing means; positions with incomplete windows use partial sums
    idx = np.arange(1, len(sq) + 1)
    sta_n = np.minimum(idx, nsta)
    lta_n = np.minimum(idx, nlta)
    sta[:] = (c[idx] - c[idx - sta_n]) / nsta
    lta[:] = (c[idx] - c[idx - lta_n]) / nlta
    with np.errstate(divide="ignore", invalid="ignore"):
        cft = sta / lta
    cft[: int(nlta)] = 0.0
    cft[~np.isfinite(cft)] = 0.0
    return cft
