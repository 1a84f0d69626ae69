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
