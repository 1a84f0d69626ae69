"""Alignment tree walk: synthetic shifted copies must align exactly."""
import numpy as np
from scipy.cluster.hierarchy import linkage

from detex_tpu import align
from detex_tpu.construct import DISSIM_OFFSET, _condensed
from detex_tpu.ops import xcorr


def _shifted_family(rng, shifts, nc=3, n_per_chan=400):
    """Multiplexed copies of one wavelet at given per-channel shifts."""
    base = np.zeros(n_per_chan)
    base[100:200] = np.hanning(100) * rng.standard_normal(100)
    out = []
    for s in shifts:
        chans = [np.roll(base, s) + 0.01 * rng.standard_normal(n_per_chan)
                 for _ in range(nc)]
        out.append(np.vstack(chans).flatten(order="F"))
    return np.stack(out)


def test_alignment_recovers_planted_shifts(rng):
    nc = 3
    shifts = [0, 12, -9, 30, 5]
    X = _shifted_family(rng, shifts, nc=nc)
    cc, lag, sub = xcorr.xcorr_all_pairs(X, nc)
    link = linkage(_condensed(DISSIM_OFFSET - cc))
    delays = align.alignment_delays(link, cc, lag)
    # relative delays must equal the planted per-channel shifts * nc
    want = np.array(shifts) * nc
    want = want - want.min()
    assert (delays == want).all()


def test_align_and_trim(rng):
    nc = 3
    shifts = [0, 10, 20]
    X = _shifted_family(rng, shifts, nc=nc)
    cc, lag, sub = xcorr.xcorr_all_pairs(X, nc)
    link = linkage(_condensed(DISSIM_OFFSET - cc))
    delays = align.alignment_delays(link, cc, lag)
    evs = ["a", "b", "c"]
    aligned = align.align_and_trim({e: x for e, x in zip(evs, X)}, evs,
                                   delays)
    lens = {len(v) for v in aligned.values()}
    assert len(lens) == 1
    # after alignment all pairs should correlate near 1 at zero lag
    arrs = [aligned[e] - aligned[e].mean() for e in evs]
    for i in range(3):
        for j in range(i + 1, 3):
            c = np.dot(arrs[i], arrs[j]) / (
                np.linalg.norm(arrs[i]) * np.linalg.norm(arrs[j]))
            assert c > 0.95


def test_single_event_no_delays():
    delays = align.alignment_delays(np.zeros((0, 4)), np.ones((1, 1)),
                                    np.zeros((1, 1)))
    assert (delays == [0]).all()
