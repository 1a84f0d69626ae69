"""
Sharded continuous-data scan: the multi-chip performance path.

Chunks of multiplexed continuous data are sharded across the mesh's
``chunks`` axis with ``shard_map``; each device runs the fused DS bank
kernel over its chunks, bins its DS values, and extracts fixed-capacity
trigger lists. Only a ``psum`` of the histograms crosses the ICI; trigger
lists stay chunk-sharded and are gathered by the host at the end
(SURVEY.md section 2: the DS computation itself needs no cross-chip
communication).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from detex_tpu.ops import ds as _ds
from detex_tpu.ops import triggers as _triggers

DEFAULT_BINS = np.linspace(0, 1, 401)


def _hist_counts(ds, bins):
    """np.histogram-compatible device binning of DS values."""
    nb = bins.shape[0] - 1
    idx = jnp.clip(jnp.searchsorted(bins, ds, side="right") - 1, 0, nb - 1)
    in_range = (ds >= bins[0]) & (ds <= bins[-1])
    flat = jnp.where(in_range, idx, nb)  # out-of-range into an overflow bin
    counts = jnp.zeros(nb + 1, dtype=jnp.int32).at[flat].add(1)
    return counts[:nb]


def _chunk_fn(x, Ufd, sum_u, d_mask, thresholds, bins, n, nc, nfft,
              buff_samps, max_trig):
    """Process one chunk: DS for the whole bank + hist + triggers."""
    ds = _ds.ds_bank(x, Ufd, sum_u, d_mask, n, nc, nfft)      # [S, out]
    hist = jax.vmap(lambda v: _hist_counts(v, bins))(ds)       # [S, nbins]
    maxds = jnp.max(ds, axis=-1)                               # [S]

    def trig_one(v, th):
        idx, cnt = _triggers.extract_triggers(v, th, buff_samps,
                                              max_triggers=max_trig)
        vals = jnp.where(idx >= 0, v[jnp.clip(idx, 0, v.shape[0] - 1)],
                         jnp.nan)
        return idx, vals, cnt

    tidx, tval, tcnt = jax.vmap(trig_one)(ds, thresholds)
    return hist, maxds, tidx, tval, tcnt


@partial(jax.jit,
         static_argnames=("n", "nc", "nfft", "buff_samps", "max_trig"))
def scan_chunks(X, Ufd, sum_u, d_mask, thresholds, bins, n, nc, nfft,
                buff_samps, max_trig=64):
    """Single-device batched scan: X [B, Lc] -> per-chunk outputs."""
    f = lambda x: _chunk_fn(x, Ufd, sum_u, d_mask, thresholds, bins,  # noqa
                            n, nc, nfft, buff_samps, max_trig)
    hist, maxds, tidx, tval, tcnt = jax.vmap(f)(X)
    return hist.sum(axis=0), maxds, tidx, tval, tcnt


def scan_chunks_sharded(mesh, X, bank, thresholds, nc, nfft,
                        buff_samps, bins=None, max_trig=64, axis="chunks"):
    """
    Multi-chip scan of chunk batch X [B, Lc] (B divisible by mesh size).

    Returns (hist [S, nbins] merged via psum, maxds [B, S],
    trig_idx [B, S, K], trig_val [B, S, K], trig_count [B, S]).
    """
    if bins is None:
        bins = DEFAULT_BINS
    bins = jnp.asarray(bins, jnp.float32)
    thresholds = jnp.asarray(thresholds, jnp.float32)
    n, Ufd, sum_u, d_mask = bank["n"], bank["Ufd"], bank["sum_u"], \
        bank["d_mask"]

    def shard_body(Xs, Ufd, sum_u, d_mask, thresholds, bins):
        f = lambda x: _chunk_fn(x, Ufd, sum_u, d_mask, thresholds,  # noqa
                                bins, n, nc, nfft, buff_samps, max_trig)
        hist, maxds, tidx, tval, tcnt = jax.vmap(f)(Xs)
        hist = jax.lax.psum(hist.sum(axis=0), axis)
        return hist, maxds, tidx, tval, tcnt

    fn = shard_map(shard_body, mesh=mesh,
                   in_specs=(P(axis), P(), P(), P(), P(), P()),
                   out_specs=(P(), P(axis), P(axis), P(axis), P(axis)))
    return jax.jit(fn)(jnp.asarray(X, jnp.float32), Ufd, sum_u, d_mask,
                       thresholds, bins)
