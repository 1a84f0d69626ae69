"""Pallas fused DS-finalize kernel vs the XLA reference (interpret mode on
CPU; the compiled path runs on real TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detex_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("S,D,L", [(1, 4, 1024), (2, 3, 5000),
                                   (3, 1, 300)])
def test_ds_finalize_matches_xla(rng, S, D, L):
    cc = jnp.asarray(rng.standard_normal((S, D, L)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(L) * 0.01, jnp.float32)
    power = jnp.asarray(np.abs(rng.standard_normal(L)) + 0.5, jnp.float32)
    sum_u = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    got = pk.ds_finalize(cc, a, power, sum_u, tile=512, interpret=True)
    want = pk.ds_finalize_xla(cc, a, power, sum_u)
    assert got.shape == want.shape
    assert np.allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                       atol=1e-6)


@pytest.mark.parametrize("S,D,m,blk,n_c", [(4, 1, 3, 512, 100),
                                           (2, 3, 2, 256, 33),
                                           (1, 2, 4, 1024, 257)])
def test_ds_finalize_os_matches_xla(rng, S, D, m, blk, n_c):
    """OS-block finalize == trim-then-finalize on the same irfft output."""
    head = -(-(n_c - 1) // 128) * 128      # aligned discard head
    W = blk - head                         # aligned block advance
    out_len = m * W - int(rng.integers(0, W))  # ragged tail
    cb = jnp.asarray(rng.standard_normal((S * D, m, blk)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(m * W) * 0.01, jnp.float32)
    power = jnp.asarray(np.abs(rng.standard_normal(m * W)) + 0.5,
                        jnp.float32)
    sum_u = jnp.asarray(rng.standard_normal(S * D), jnp.float32)
    got = pk.ds_finalize_os(cb, a, power, sum_u, head, D, W,
                            interpret=True)
    cc = np.asarray(cb)[:, :, head:head + W].reshape(S, D, m * W)
    want = pk.ds_finalize_xla(jnp.asarray(cc), a, power,
                              jnp.asarray(sum_u).reshape(S, D))
    assert got.shape == (S, m * W)
    assert np.allclose(np.asarray(got)[:, :out_len],
                       np.asarray(want)[:, :out_len], rtol=1e-5, atol=1e-6)


def test_os_finalize_tile_rows_lowering_rules():
    """Tile rows must satisfy the TPU lowering rule: divisible by 8, or
    equal to the full S dimension; 0 when no legal tile fits VMEM."""
    # small banks: whole-S tile
    assert pk.os_finalize_tile_rows(2, 2, 512) == 2
    # big bank: an 8-multiple tile
    st = pk.os_finalize_tile_rows(128, 1, 16384)
    assert st > 0 and (st % 8 == 0 or st == 128)
    assert st * 16384 * 4 <= pk._OS_TILE_BUDGET
    # S not 8-divisible and too big for one tile -> unsupported
    assert pk.os_finalize_tile_rows(129, 4, 1 << 20) == 0


def test_ds_bank_demux_os_pallas_path(rng, monkeypatch):
    """The full OS bank kernel with the pallas finalize forced on (in
    interpret mode, via patching) must match the XLA path."""
    import detex_tpu.ops.ds as dsops
    from detex_tpu.ops import pallas_kernels as pkm

    nc = 3
    n = 300
    Lc = 3 * 4096
    U = rng.standard_normal((2, n))
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    bank = dsops.build_bank([U], nc, Lc, block_fft=512)
    assert bank.get("os")
    x = rng.standard_normal(Lc).astype(np.float32)

    want = dsops.run_bank(x, bank, nc)       # XLA path (pallas off on CPU)

    orig = pkm.ds_finalize_os

    def interp(cb, a, power, sum_u, head, D, W, interpret=False):
        return orig(cb, a, power, sum_u, head, D, W, interpret=True)

    monkeypatch.setattr(pkm, "ds_finalize_os", interp)
    monkeypatch.setenv("DETEX_TPU_PALLAS", "1")
    # _use_pallas() is read at trace time: force a retrace
    dsops.ds_bank_demux_os.clear_cache()
    try:
        got = dsops.run_bank(x, bank, nc)
    finally:
        dsops.ds_bank_demux_os.clear_cache()
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ds_finalize_masked_slots(rng):
    """Zero-padded basis slots (cc==0, sum_u==0) must not affect the sum."""
    S, D, L = 2, 3, 2048
    cc = np.asarray(rng.standard_normal((S, D, L)), np.float32)
    sum_u = np.asarray(rng.standard_normal((S, D)), np.float32)
    cc[1, 2] = 0.0
    sum_u[1, 2] = 0.0
    a = np.zeros(L, np.float32)
    power = np.ones(L, np.float32)
    got = np.asarray(pk.ds_finalize(jnp.asarray(cc), jnp.asarray(a),
                                    jnp.asarray(power), jnp.asarray(sum_u),
                                    tile=1024, interpret=True))
    want = (cc ** 2).sum(axis=1)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("S,L", [(3, 5000), (8, 2049), (1, 100)])
def test_hist_uniform_matches_np(rng, S, L):
    # interior values (edge-ULP collisions bin differently by design) plus
    # exactly-representable specials
    ds = ((rng.integers(-40, 440, size=(S, L)) +
           rng.uniform(0.1, 0.9, size=(S, L))) / 400.0).astype(np.float32)
    ds[0, :5] = [0.0, 1.0, -np.inf, np.inf, 0.5]   # edges + out-of-range
    got = np.asarray(pk.hist_uniform(jnp.asarray(ds), nbin=400, tile=256,
                                     interpret=True))
    edges = np.linspace(0, 1, 401)
    for s in range(S):
        want, _ = np.histogram(ds[s], bins=edges)
        assert got[s].sum() == want.sum()
        assert np.array_equal(got[s].astype(np.int64), want), s


def test_hist_uniform_matches_sort_path(rng):
    """Off-edge values: the counting kernel equals _hist_counts exactly.
    (Values within a float32 ULP of a bin edge may legitimately differ
    between floor- and searchsorted-binning, so keep the data interior.)"""
    from detex_tpu.parallel.scan import _hist_counts, DEFAULT_BINS
    ds = ((rng.integers(0, 400, size=(4, 3000)) +
           rng.uniform(0.1, 0.9, size=(4, 3000))) / 400.0
          ).astype(np.float32)
    got = np.asarray(pk.hist_uniform(jnp.asarray(ds), nbin=400, tile=512,
                                     interpret=True)).astype(np.int64)
    bins = jnp.asarray(DEFAULT_BINS, jnp.float32)
    want = np.stack([np.asarray(_hist_counts(jnp.asarray(r), bins))
                     for r in ds]).astype(np.int64)
    assert np.array_equal(got, want)
