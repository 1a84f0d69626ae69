"""
Doubly noncentral beta/F statistics behind selectCriteria=1 (the
dimension-selection criterion the reference reserved but never implemented,
reference subspace.py:802-807).
"""
import numpy as np
import pytest
import scipy.stats

from detex_tpu import stats as dstats


def test_central_case_reduces_to_beta():
    # lam1 = lam2 = 0 -> plain central beta sf
    for d, nu2, g in [(2, 100, 0.05), (5, 500, 0.02), (1, 50, 0.1)]:
        got = dstats.dnc_beta_sf(g, d, nu2, 0.0, 0.0)
        want = scipy.stats.beta.sf(g, d / 2, nu2 / 2)
        assert abs(got - want) < 1e-12


def test_singly_noncentral_matches_ncf():
    """lam2 = 0 reduces to the singly noncentral F scipy provides:
    X/(X+Y) > g  <=>  F = (X/d)/(Y/nu2) > g/(1-g) * nu2/d."""
    for d, nu2, lam1, g in [(3, 200, 25.0, 0.08), (2, 400, 60.0, 0.1)]:
        got = dstats.dnc_beta_sf(g, d, nu2, lam1, 0.0)
        fq = g / (1 - g) * nu2 / d
        want = scipy.stats.ncf.sf(fq, d, nu2, lam1)
        assert abs(got - want) < 1e-9


def test_doubly_noncentral_matches_monte_carlo():
    rng = np.random.default_rng(0)
    n = 400_000
    for d, nu2, lam1, lam2, g in [(3, 300, 40.0, 15.0, 0.08),
                                  (2, 150, 20.0, 30.0, 0.12)]:
        x1 = rng.noncentral_chisquare(d, lam1, n)
        x2 = rng.noncentral_chisquare(nu2, lam2, n)
        mc = float(np.mean(x1 / (x1 + x2) > g))
        got = dstats.dnc_beta_sf(g, d, nu2, lam1, lam2)
        assert abs(got - mc) < 4.0 * np.sqrt(mc * (1 - mc) / n) + 1e-4


def test_dim_selection_tracks_energy_knee():
    """With a sharp knee in the energy-capture curve, the optimal dimension
    lands at the knee: dimensions past it add noise DOF but no energy."""
    frac = np.array([0.0, 0.60, 0.92, 0.93, 0.935, 0.94])
    d, pds = dstats.dim_of_max_pd(frac, N=9000, Pf=1e-9, snr=120.0)
    assert d == 2
    assert len(pds) == 5
    assert 0 <= pds.min() and pds.max() <= 1


def test_dim_selection_monotone_snr():
    """P_D at the chosen dimension grows with SNR."""
    frac = np.array([0.0, 0.7, 0.9, 0.95])
    _, lo = dstats.dim_of_max_pd(frac, N=4000, Pf=1e-9, snr=40.0)
    _, hi = dstats.dim_of_max_pd(frac, N=4000, Pf=1e-9, snr=200.0)
    assert hi.max() > lo.max()


def test_select_criteria_1_end_to_end(synth_case, tmp_path):
    """SVD(selectCriteria=1) picks a dimension and sets FAS thresholds."""
    import os
    from detex_tpu import construct
    from detex_tpu.data import fetcher as getdata
    os.chdir(tmp_path)
    clust = construct.createCluster(
        CCreq=0.5, fetch_arg=synth_case["eventDir"], filt=[1, 8, 2, True],
        stationKey=synth_case["stationKey"],
        templateKey=synth_case["templateKey"], trim=[10, 60],
        saveclust=False)
    cfetch = getdata.DataFetcher("dir", directoryName=synth_case["conDir"])
    ss = construct.createSubSpace(Pf=1e-9, clust=clust, conDatFetcher=cfetch)
    ss.attachPickTimes(pksFile=synth_case["phaseKey"], defaultDuration=20)
    ss.SVD(selectCriteria=1, selectValue=200.0, conDatNum=3,
           useSingles=False, backupThreshold=0.3)
    for sta in ss.ssStations:
        for _, row in ss.subspaces[sta].iterrows():
            assert row.SVDdefined
            assert 1 <= row.NumBasis <= len(row.Events)
            assert 0 < row.Threshold < 1
    # SNR<=0 rejected
    with pytest.raises(Exception):
        ss.SVD(selectCriteria=1, selectValue=0.0, conDatNum=3,
               useSingles=False)
