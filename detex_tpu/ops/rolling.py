"""
Rolling (sliding-window) statistics as JAX device kernels.

The reference computes rolling mean/std/var with pandas (pd.rolling_* in
construct.py:446-448, detect.py:567-568, fas.py:126-127) on host. Here they
are cumsum-based device ops.

Precision note (TPU is f32-first): a naive cumsum over a million-sample
chunk loses ~1e-4 relative precision in f32. All rolling sums here subtract
the array mean before the cumsum and add ``n * mean`` back per window, so the
cumsum stays a zero-mean random walk (O(sqrt(L)) magnitude) and window sums
keep ~1e-7 relative accuracy without needing f64.

Note the reference multiplies pandas' sample std by sqrt((n-1)/n)
(construct.py:448), i.e. uses *population* statistics — these kernels
compute population mean/var/std directly.
"""
from __future__ import annotations

import jax.numpy as jnp


def rolling_sum(x, n):
    """Sliding-window sum, output length ``len(x) - n + 1``."""
    x = jnp.asarray(x)
    m = jnp.mean(x)
    c = jnp.cumsum(x - m)
    head = c[n - 1]
    body = c[n:] - c[:-n]
    return jnp.concatenate([head[None], body]) + n * m


def rolling_mean(x, n):
    """Sliding-window mean, output length ``len(x) - n + 1``."""
    return rolling_sum(x, n) / n


def rolling_mean_var(x, n):
    """Sliding-window population mean and variance (ddof=0).

    Matches ``pd.rolling_var(x, n) * (n-1)/n`` as used by the reference DS
    kernel (detect.py:568 multiplies the rolling var by n to get power; the
    pandas var there is sample var but the xcorr kernel corrects to
    population — we standardize on population everywhere and carry the
    correction in callers when matching the reference exactly).
    """
    mu = rolling_mean(x, n)
    m2 = rolling_mean(x * x, n)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    return mu, var


def rolling_std(x, n):
    """Sliding-window population std."""
    _, var = rolling_mean_var(x, n)
    return jnp.sqrt(var)


def rolling_mean_centered(x, n):
    """
    Centered rolling mean matching ``pd.rolling_mean(x, n, center=True)``:
    positions without a full window are NaN. Output has the same length as
    the input. Used by the STA/LTA of the detection statistic
    (detect.py:501-514).

    pandas centers the label at offset ``(n-1)//2 + 1``... empirically the
    trailing window result at index i (covering x[i-n+1 : i+1]) is labeled at
    index ``i - ((n-1) // 2)`` by pandas; we reproduce that.
    """
    x = jnp.asarray(x)
    L = x.shape[0]
    mu = rolling_mean(x, n)  # length L - n + 1, value k covers x[k:k+n]
    out = jnp.full((L,), jnp.nan, dtype=x.dtype)
    # trailing result k is labeled at center index k + n - 1 - ((n-1)//2)
    start = (n - 1) - ((n - 1) // 2)
    out = out.at[start:start + mu.shape[0]].set(mu)
    return out
