"""Rolling-statistics kernels vs pandas oracles."""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from detex_tpu.ops import rolling


@pytest.mark.parametrize("n", [3, 50, 128])
def test_rolling_mean_matches_pandas(rng, n):
    x = rng.standard_normal(1000)
    got = np.asarray(rolling.rolling_mean(jnp.asarray(x), n))
    want = pd.Series(x).rolling(n).mean().values[n - 1:]
    assert np.allclose(got, want, atol=1e-6)


def test_rolling_var_matches_population(rng):
    x = rng.standard_normal(2000) * 3 + 5
    n = 77
    _, var = rolling.rolling_mean_var(jnp.asarray(x), n)
    want = pd.Series(x).rolling(n).var().values[n - 1:] * (n - 1) / n
    assert np.allclose(np.asarray(var), want, rtol=1e-4, atol=1e-6)


def test_rolling_std_population_correction(rng):
    # the reference multiplies pandas sample std by sqrt((n-1)/n)
    x = rng.standard_normal(500)
    n = 30
    got = np.asarray(rolling.rolling_std(jnp.asarray(x), n))
    want = (pd.Series(x).rolling(n).std().values[n - 1:]
            * np.sqrt((n - 1.0) / n))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n", [3, 4, 5, 10])
def test_rolling_mean_centered_matches_pandas(rng, n):
    x = rng.standard_normal(101)
    got = np.asarray(rolling.rolling_mean_centered(jnp.asarray(x), n))
    want = pd.Series(x).rolling(n, center=True).mean().values
    mask = ~np.isnan(want)
    assert (np.isnan(got) == np.isnan(want)).all()
    assert np.allclose(got[mask], want[mask], atol=1e-6)


def test_rolling_precision_long_chunk(rng):
    # f32 cumsum over a million samples must stay accurate (centered trick)
    x = (rng.standard_normal(1_000_000) + 100.0).astype(np.float32)
    n = 4500
    got = np.asarray(rolling.rolling_mean(jnp.asarray(x), n))
    want = pd.Series(x.astype(np.float64)).rolling(n).mean().values[n - 1:]
    assert np.abs(got - want).max() < 1e-3  # absolute on values ~100
