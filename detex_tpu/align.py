"""
Waveform alignment from the clustering linkage tree (Harris 2006 App. B).

The reference implements this with condensed-index juggling and a CC-as-dict-
key lag map (construct.py:710-849). detex_tpu uses the equivalent invariant
formulation: walking the single-linkage merges in order, each merge aligns
the two groups using the lag of their best-correlated cross pair, adjusted
by shifts already applied:

    lag_current(i, j) = lag_orig(i, j) + delay[i] - delay[j]

where lag_orig(i, j) (i < j, upper triangle) is the multiplexed-sample lag
from the pairwise xcorr (positive = event j's signal sits later within its
trace than event i's). The cluster containing the *larger-index* event of
the best pair is shifted (matching the reference's ev1/ev2 row/column
orientation, construct.py:748-758).
"""
from __future__ import annotations

import numpy as np

import detex_tpu


def alignment_delays(link, cc_mat, lag_mat):
    """
    Compute per-event integer front-trim delays from a linkage tree.

    Parameters
    ----------
    link : [m-1, 4] scipy linkage array over the m events
    cc_mat : [m, m] max correlation coefficients (upper triangle i<j filled)
    lag_mat : [m, m] integer sample lags (upper triangle i<j filled)

    Returns
    -------
    delays : [m] int array, normalized so min(delays) == 0. Trimming
        ``delays[e]`` samples from the front of event e's multiplexed trace
        aligns the group (reference _getDelays + delayNP normalization,
        construct.py:281-285).
    """
    cc_mat = np.asarray(cc_mat, dtype=np.float64)
    lag_mat = np.asarray(lag_mat, dtype=np.float64)
    m = cc_mat.shape[0]
    delays = np.zeros(m, dtype=np.int64)
    members = {i: [i] for i in range(m)}
    if m == 1 or link is None or len(link) == 0:
        return delays
    for step, row in enumerate(np.asarray(link)):
        i1, i2 = int(row[0]), int(row[1])
        m1, m2 = members[i1], members[i2]
        # best cross pair (max CC); tie-break row-major like the reference's
        # first-match search of the dissimilarity frame
        best_v = -np.inf
        best = None
        for a in m1:
            for b in m2:
                i, j = (a, b) if a < b else (b, a)
                v = cc_mat[i, j]
                if np.isnan(v):
                    continue
                if v > best_v + 1e-12 or (abs(v - best_v) <= 1e-12 and
                                          best is not None and
                                          (i, j) < best):
                    best_v = v
                    best = (i, j)
        if best is None:
            detex_tpu.log(__name__, "no finite CC between clusters at merge "
                          "%d; leaving relative shift at 0" % step,
                          level="warning")
            members[m + step] = m1 + m2
            continue
        i, j = best
        cur = int(np.round(lag_mat[i, j] + delays[i] - delays[j]))
        shift_set = m2 if j in m2 else m1  # cluster containing ev2 (= j)
        for b in shift_set:
            delays[b] += cur
        members[m + step] = m1 + m2
    delays = delays - delays.min()
    return delays


def align_and_trim(wf_dict, event_list, delays):
    """
    Apply front-trim delays and cut to common length (reference _alignTD,
    construct.py:486-504).

    Parameters
    ----------
    wf_dict : {event_name: 1-D multiplexed waveform}
    event_list : ordered list of event names (same order as delays)
    delays : [m] int array from alignment_delays (min == 0)

    Returns
    -------
    {event_name: aligned array}, each of length
    ``len(first waveform) - max(delays)``.
    """
    delays = np.asarray(delays, dtype=np.int64)
    tdlen = len(wf_dict[event_list[0]]) - int(delays.max())
    aligned = {}
    for ev, d in zip(event_list, delays):
        seg = wf_dict[ev][int(d):]
        seg = seg[:tdlen]
        if len(seg) == 0:
            msg = ("Alignment of multiplexed stream failing on event %s; try "
                   "raising ccreq or widening the trim window" % ev)
            msg += _id_align_problems(event_list, delays)
            detex_tpu.log(__name__, msg, level="error")
        aligned[ev] = seg
    return aligned


def _id_align_problems(event_list, delays, m=7):
    """Flag outlier shifts (reference _idAlignProblems,
    construct.py:507-522)."""
    offsets = np.asarray(delays, dtype=np.float64)
    d = np.abs(offsets - np.median(offsets))
    mdev = np.median(d)
    s = d / mdev if mdev else np.zeros_like(d)
    msg = ""
    for ev, out in zip(event_list, s > m):
        if out:
            msg += ("\nAlignment shift for event %s is an outlier, consider "
                    "removing it" % ev)
    return msg
