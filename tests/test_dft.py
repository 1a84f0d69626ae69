"""Matmul (MXU) CT DFTs vs jnp.fft — the block-transform replacements."""
import jax.numpy as jnp
import numpy as np
import pytest

from detex_tpu.ops import dft


@pytest.mark.parametrize("n", [64, 256, 1024, 16384])
def test_irfft_ct_matches_fft(rng, n):
    R = n // 2 + 1
    spec = (rng.standard_normal((3, 5, R)) +
            1j * rng.standard_normal((3, 5, R))).astype(np.complex64)
    got = np.asarray(dft.irfft_ct(jnp.asarray(spec), n))
    want = np.asarray(jnp.fft.irfft(jnp.asarray(spec), n, axis=-1))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize("n,L", [(256, 256), (1024, 700), (4096, 4096)])
def test_rfft_ct_matches_fft(rng, n, L):
    x = rng.standard_normal((4, L)).astype(np.float32)
    got = np.asarray(dft.rfft_ct(jnp.asarray(x), n))
    want = np.asarray(jnp.fft.rfft(jnp.asarray(x), n, axis=-1))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-4 * max(1.0, np.abs(want).max())


def test_roundtrip(rng):
    n = 2048
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec = dft.rfft_ct(jnp.asarray(x), n)
    back = np.asarray(dft.irfft_ct(spec, n))
    assert np.abs(back - x).max() < 1e-4


def test_os_bank_with_matmul_fft(rng, monkeypatch):
    """The OS bank path with matmul DFTs forced on matches the jnp.fft
    path and the float64 oracle."""
    import detex_tpu.ops.ds as dsops

    nc, n, Lc = 3, 510, 3 * (1 << 12)
    T = rng.standard_normal((4, n))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    bank = dsops.build_bank(U_list, nc, Lc, block_fft=1024)
    assert bank.get("os")
    x = rng.standard_normal(Lc).astype(np.float32)
    want = dsops.run_bank(x, bank, nc)

    monkeypatch.setenv("DETEX_TPU_MATMUL_FFT", "1")
    dsops.ds_bank_demux_os.clear_cache()
    try:
        got = dsops.run_bank(x, bank, nc)
    finally:
        dsops.ds_bank_demux_os.clear_cache()
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5
    for i, u in enumerate(U_list):
        oracle = dsops.ds_numpy(x, u, nc)
        assert np.abs(got[i] - oracle).max() < 2e-5


def test_xcorr_pairs_with_matmul_fft(rng, monkeypatch):
    """All-pairs xcorr with matmul DFTs forced on matches the fft path."""
    from detex_tpu.ops import xcorr

    N, nc, n = 6, 3, 306
    X = rng.standard_normal((N, n)).astype(np.float32)
    cc0, lag0, sub0 = xcorr.xcorr_all_pairs(X, nc)

    monkeypatch.setenv("DETEX_TPU_MATMUL_FFT", "1")
    xcorr._all_pairs_fused_demux.clear_cache()
    try:
        cc1, lag1, sub1 = xcorr.xcorr_all_pairs(X, nc)
    finally:
        xcorr._all_pairs_fused_demux.clear_cache()
    iu, ju = np.triu_indices(N, k=1)
    assert np.allclose(cc0[iu, ju], cc1[iu, ju], atol=2e-5)
    assert np.array_equal(lag0[iu, ju], lag1[iu, ju])
    assert np.allclose(sub0[iu, ju], sub1[iu, ju], atol=1e-4,
                       equal_nan=True)


def test_fused_pallas_irfft_matches_fft(rng, monkeypatch):
    """The one-kernel Pallas CT inverse (VMEM-resident stages) must match
    jnp.fft.irfft; interpret mode off-TPU."""
    import jax.numpy as jnp
    from detex_tpu.ops import dft
    monkeypatch.setenv("DETEX_TPU_PALLAS_DFT", "1")
    dft.irfft_ct.clear_cache()
    try:
        for n in (16384, 32768):
            R = n // 2 + 1
            spec = (rng.standard_normal((5, R)) +
                    1j * rng.standard_normal((5, R))).astype(np.complex64)
            want = np.fft.irfft(spec, n, axis=-1)
            got = np.asarray(dft.irfft_ct(jnp.asarray(spec), n))
            rel = np.abs(got - want).max() / np.abs(want).max()
            assert rel < 1e-5
    finally:
        dft.irfft_ct.clear_cache()


def test_fused_pallas_rfft_matches_fft(rng, monkeypatch):
    import jax.numpy as jnp
    from detex_tpu.ops import dft
    monkeypatch.setenv("DETEX_TPU_PALLAS_DFT", "1")
    dft.rfft_ct.clear_cache()
    try:
        n = 16384
        x = rng.standard_normal((3, 2, n - 57)).astype(np.float32)
        want = np.fft.rfft(x, n, axis=-1)
        got = np.asarray(dft.rfft_ct(jnp.asarray(x), n))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert got.shape == want.shape
        assert rel < 1e-5
    finally:
        dft.rfft_ct.clear_cache()
