"""Overlap-save matched-filter banks + template-blocked scan: the
large-bank (BASELINE config 5, 1000-template) memory path must agree with
the float64 oracle and with the full-length-spectra bank."""
import numpy as np
import pytest

from detex_tpu.ops import ds as dsops
from detex_tpu.parallel import scan as pscan

NC = 3
N = 510
LC = 3 * (1 << 12)


@pytest.fixture(scope="module")
def rng200():
    return np.random.default_rng(0)


def test_os_bank_matches_oracle(rng200):
    T = rng200.standard_normal((4, N))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    bank = dsops.build_bank(U_list, NC, LC, block_fft=1024)
    assert bank.get("os")
    x = rng200.standard_normal(LC)
    got = dsops.run_bank(x, bank, NC)
    for i, u in enumerate(U_list):
        want = dsops.ds_numpy(x, u, NC)
        assert np.abs(got[i] - want).max() < 2e-5


def test_os_bank_multibasis(rng200):
    """Overlap-save with D>1 bases per detector."""
    A = rng200.standard_normal((3, N))
    q, _ = np.linalg.qr(A.T)
    U = np.ascontiguousarray(q[:, :3].T)
    bank = dsops.build_bank([U], NC, LC, block_fft=2048)
    assert bank.get("os")
    x = rng200.standard_normal(LC)
    got = dsops.run_bank(x, bank, NC)[0]
    want = dsops.ds_numpy(x, U, NC)
    assert np.abs(got - want).max() < 2e-5


def test_blocked_scan_matches_run_bank(rng200):
    """S > TEMPLATE_BLOCK engages the template-blocked chunk path; maxima,
    histograms and trigger counts must match the flat path."""
    S = 2 * pscan.TEMPLATE_BLOCK + 7  # deliberately non-multiple
    T = rng200.standard_normal((S, N))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    bank = dsops.build_bank(U_list, NC, LC, block_fft=0)  # full-length
    assert not bank.get("os")
    th = np.full(S, 0.45, np.float32)
    B = 3
    X = rng200.standard_normal((B, bank["pad_len"])).astype(np.float32)
    hist, maxds, ti, tv, tc = pscan.scan_chunks(X, bank, th, NC, 100,
                                                max_trig=8)
    maxds = np.asarray(maxds)
    assert np.asarray(hist).shape[0] == S
    assert maxds.shape == (B, S)
    for b in range(B):
        ds = dsops.run_bank(X[b], bank, NC)
        assert np.allclose(ds.max(axis=1), maxds[b], atol=1e-5)

    # overlap-save bank through the same blocked scan agrees
    bank_os = dsops.build_bank(U_list, NC, LC, block_fft=1024)
    h2, m2, *_ = pscan.scan_chunks(X, bank_os, th, NC, 100, max_trig=8)
    assert np.allclose(np.asarray(m2), maxds, atol=2e-5)
    assert np.abs(np.asarray(h2) - np.asarray(hist)).sum() <= \
        0.002 * np.asarray(hist).sum()


def test_blocked_scan_sharded(rng200):
    """Template blocking composes with the chunk-sharded mesh scan."""
    import jax
    from detex_tpu.parallel import mesh as pmesh
    S = pscan.TEMPLATE_BLOCK + 3
    T = rng200.standard_normal((S, N))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    bank = dsops.build_bank(U_list, NC, LC, block_fft=1024)
    th = np.full(S, 0.45, np.float32)
    B = 8
    X = rng200.standard_normal((B, bank["pad_len"])).astype(np.float32)
    mesh = pmesh.make_mesh(min(8, len(jax.devices())))
    hist, maxds, *_ = pscan.scan_chunks_sharded(mesh, X, bank, th, NC, 100,
                                                max_trig=8)
    h1, m1, *_ = pscan.scan_chunks(X, bank, th, NC, 100, max_trig=8)
    assert np.allclose(np.asarray(hist), np.asarray(h1))
    assert np.allclose(np.asarray(maxds), np.asarray(m1), atol=1e-5)


def test_short_template_os_auto_block(rng200):
    """Short templates (n_c < 32) must get a legal OS block size from
    build_bank's auto choice (regression: the lane-aligned decomposition
    asserted on blk=128 all-head blocks)."""
    n = 60  # n_c = 20
    T = rng200.standard_normal((3, n))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    bank = dsops.build_bank(U_list, NC, LC, block_fft=128)
    # the requested 128 is below the aligned minimum and must be raised
    assert bank.get("os") and bank["blk_fft"] >= dsops.os_min_block(20)
    x = rng200.standard_normal(LC)
    got = dsops.run_bank(x, bank, NC)
    for i, u in enumerate(U_list):
        want = dsops.ds_numpy(x, u, NC)
        assert np.abs(got[i] - want).max() < 2e-5


def test_scan_crosses_template_block_boundary(rng200):
    """A bank wider than TEMPLATE_BLOCK exercises the blocked-template
    path end to end on CPU (pad slots, per-block thresholds, pyramid
    triggers) — maxima must match per-detector run_bank."""
    S = pscan.TEMPLATE_BLOCK + 21
    T = rng200.standard_normal((S, N))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    bank = dsops.build_bank(U_list, NC, LC, block_fft=1024)
    assert bank.get("os")
    th = np.full(S, 0.9, np.float32)
    X = np.stack([rng200.standard_normal(LC).astype(np.float32)])
    hist, maxds, tidx, tval, tcnt = pscan.scan_chunks(
        X, bank, th, NC, 50, max_trig=4)
    assert maxds.shape == (1, S) and hist.shape[0] == S
    ds = dsops.run_bank(X[0], bank, NC)
    assert np.allclose(ds.max(axis=1), maxds[0], atol=2e-5)
    # per-sample histogram totals: every valid DS sample lands in a bin
    # or is excluded as out-of-range; totals bounded by the sample count
    assert (hist.sum(axis=-1) <= ds.shape[1]).all()
