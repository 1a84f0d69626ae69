"""Multi-device sharded scan on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from detex_tpu.ops import ds as dsops
from detex_tpu.parallel import mesh as pmesh
from detex_tpu.parallel import scan as pscan

NC = 3
LC = 3 * (1 << 12)


@pytest.fixture(scope="module")
def small_bank():
    n, D = 510, 2
    A = np.random.default_rng(0).standard_normal((D, n))
    q, _ = np.linalg.qr(A.T)
    U = np.ascontiguousarray(q[:, :D].T)
    bank = dsops.build_bank([U], NC, LC)
    assert bank.get("demux")
    return bank, U


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_scan_matches_single_device(small_bank):
    bank, U = small_bank
    rng = np.random.default_rng(5)
    B = 8
    X = rng.standard_normal((B, bank["pad_len"])).astype(np.float32)
    th = np.full(1, 0.45, np.float32)
    mesh = pmesh.make_mesh(8)
    hist, maxds, tidx, tval, tcnt = pscan.scan_chunks_sharded(
        mesh, X, bank, th, NC, buff_samps=100, max_trig=8)
    h1, m1, i1, v1, c1 = pscan.scan_chunks(X, bank, th, NC, 100, max_trig=8)
    assert np.allclose(np.asarray(hist), np.asarray(h1))
    assert np.allclose(np.asarray(maxds), np.asarray(m1), atol=1e-5)
    assert (np.asarray(tcnt) == np.asarray(c1)).all()


def test_sharded_hist_matches_numpy(small_bank):
    bank, U = small_bank
    rng = np.random.default_rng(7)
    B = 8
    X = rng.standard_normal((B, bank["pad_len"])).astype(np.float32)
    th = np.full(1, 2.0, np.float32)  # no triggers
    mesh = pmesh.make_mesh(8)
    hist, maxds, *_ = pscan.scan_chunks_sharded(
        mesh, X, bank, th, NC, buff_samps=100)
    want = np.zeros(400)
    for b in range(B):
        ds = dsops.ds_numpy(X[b].astype(np.float64), U, NC)
        want += np.histogram(ds, bins=pscan.DEFAULT_BINS)[0]
    got = np.asarray(hist)[0]
    # f32 vs f64 binning jitter at bin edges
    assert np.abs(got - want).sum() <= 0.002 * want.sum()
    assert got.sum() == want.sum()


def test_demux_bank_matches_numpy_oracle(small_bank):
    """The polyphase fast path must agree with the float64 multiplexed
    oracle to f32 accuracy."""
    bank, U = small_bank
    rng = np.random.default_rng(11)
    x = rng.standard_normal(bank["pad_len"])
    got = dsops.run_bank(x, bank, NC)[0]
    want = dsops.ds_numpy(x, U, NC)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2e-5
