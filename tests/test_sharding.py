"""Multi-device sharded scan on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from detex_tpu.ops import ds as dsops
from detex_tpu.parallel import mesh as pmesh
from detex_tpu.parallel import scan as pscan


@pytest.fixture(scope="module")
def small_bank(rng):
    n, D = 512, 2
    A = np.random.default_rng(0).standard_normal((D, n))
    q, _ = np.linalg.qr(A.T)
    U = np.ascontiguousarray(q[:, :D].T)
    nfft = 1 << 15
    return dsops.make_bank([U], nfft), U, nfft


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_scan_matches_single_device(small_bank):
    bank, U, nfft = small_bank
    nc = 3
    rng = np.random.default_rng(5)
    B, Lc = 8, 1 << 14
    X = rng.standard_normal((B, Lc)).astype(np.float32)
    th = np.full(1, 0.45, np.float32)
    mesh = pmesh.make_mesh(8)
    hist, maxds, tidx, tval, tcnt = pscan.scan_chunks_sharded(
        mesh, X, bank, th, nc, nfft, buff_samps=100, max_trig=8)
    # single-device result
    import jax.numpy as jnp
    bins = jnp.asarray(pscan.DEFAULT_BINS, jnp.float32)
    h1, m1, i1, v1, c1 = pscan.scan_chunks(
        jnp.asarray(X), bank["Ufd"], bank["sum_u"], bank["d_mask"],
        jnp.asarray(th), bins, bank["n"], nc, nfft, 100, 8)
    assert np.allclose(np.asarray(hist), np.asarray(h1))
    assert np.allclose(np.asarray(maxds), np.asarray(m1), atol=1e-5)
    assert (np.asarray(tcnt) == np.asarray(c1)).all()


def test_sharded_hist_matches_numpy(small_bank):
    bank, U, nfft = small_bank
    nc = 3
    rng = np.random.default_rng(7)
    B, Lc = 8, 1 << 14
    X = rng.standard_normal((B, Lc)).astype(np.float32)
    th = np.full(1, 2.0, np.float32)  # no triggers
    mesh = pmesh.make_mesh(8)
    hist, maxds, *_ = pscan.scan_chunks_sharded(
        mesh, X, bank, th, nc, nfft, buff_samps=100)
    want = np.zeros(400)
    for b in range(B):
        ds = dsops.ds_numpy(X[b].astype(np.float64), U, nc)
        want += np.histogram(ds, bins=pscan.DEFAULT_BINS)[0]
    got = np.asarray(hist)[0]
    # f32 vs f64 binning jitter at bin edges
    assert np.abs(got - want).sum() <= 0.002 * want.sum()
    assert got.sum() == want.sum()
