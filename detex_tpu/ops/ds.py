"""
The subspace detection-statistic (DS) kernel — the framework's hot loop.

Reference semantics (_MPXDS detect.py:559-578 == _MPXSSCorr fas.py:120-134):
given a multiplexed continuous chunk ``x`` (length Lc) and a subspace basis
``U`` [D, n] (rows are orthonormal left singular vectors, or a normalized
single event):

    a    = rolling_mean(x, n)               # length Lc - n + 1
    p    = n * rolling_var(x, n)            # rolling power (pandas sample var
                                            #   * n in the reference; see note)
    c_d  = correlate(x, U_d)                # via FFT, valid part
    y_d  = c_d - sum(U_d) * a
    DS   = sum_d y_d^2 / p
    return DS[::Nc]                         # undo channel multiplexing

Note on the variance: the reference uses pandas *sample* var times n, i.e.
``sum((x-mu)^2) * n/(n-1)``. For orthonormal U the DS then peaks at
~(n-1)/n ≈ 1. We reproduce the reference exactly (sample var) so DS values
and thresholds are comparable to Detex's.

TPU-first design: the chunk is standardized (demeaned/scaled) on device
first — the DS is provably invariant to affine scaling of the data, and this
keeps float32 math accurate to ~1e-6 over million-sample chunks. Multiple
chunks are processed as a leading batch dimension, and a whole bank of
detectors (same template length) is evaluated with one batched irFFT.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from detex_tpu.ops.rolling import rolling_mean, window_stats_rows


def _use_pallas():
    """Use the fused Pallas finalize on real TPU backends (override with
    DETEX_TPU_PALLAS=0/1)."""
    import os
    env = os.environ.get("DETEX_TPU_PALLAS")
    if env is not None:
        return env != "0"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def required_fft_len(data_len_samps, n):
    """Reference required FFT length: 2^bit_length(reqlen)
    (detect.py:368-371, fas.py:147-148)."""
    return 2 ** int(int(data_len_samps) + int(n)).bit_length()


def prep_basis_fd(U, nfft, dtype=jnp.float32):
    """rFFT of reversed basis vectors at length nfft
    (reference _loadMPSubSpace detect.py:371, fas.py:171)."""
    U = jnp.asarray(U, dtype)
    return jnp.fft.rfft(U[..., ::-1], int(nfft), axis=-1)


def _ds_core(x, Ufd, sum_u, n, nc, nfft):
    """
    DS of one chunk against one subspace.
    x: [Lc] multiplexed data; Ufd: [D, R] rfft of reversed basis;
    sum_u: [D]. Returns [ceil((Lc - n + 1) / nc)].
    """
    Lc = x.shape[0]
    # standardize for f32 accuracy; DS is invariant to affine data transforms
    mu = jnp.mean(x)
    sd = jnp.std(x)
    xs = (x - mu) / jnp.where(sd == 0, 1.0, sd)

    a = rolling_mean(xs, n)                       # [Lc - n + 1]
    m2 = rolling_mean(xs * xs, n)
    var_pop = jnp.maximum(m2 - a * a, 0.0)
    power = var_pop * (n * n) / (n - 1.0)         # n * sample-var

    xfd = jnp.fft.rfft(xs, nfft)
    cc = jnp.fft.irfft(Ufd * xfd[None, :], nfft, axis=-1)[:, n - 1:Lc]
    y = cc - sum_u[:, None] * a[None, :]
    num = jnp.sum(y * y, axis=0)
    ds = num / jnp.where(power == 0, jnp.inf, power)
    return ds[::nc]


@partial(jax.jit, static_argnames=("n", "nc", "nfft"))
def ds_single(x, Ufd, sum_u, n, nc, nfft):
    """Single chunk x [Lc], single subspace."""
    return _ds_core(x, Ufd, sum_u, n, nc, nfft)


@partial(jax.jit, static_argnames=("n", "nc", "nfft"))
def ds_bank(x, Ufd, sum_u, d_mask, n, nc, nfft):
    """
    One chunk against a *bank* of S subspaces sharing template length n.
    x: [Lc]; Ufd: [S, Dmax, R]; sum_u: [S, Dmax]; d_mask: [S, Dmax] bool
    (False rows are zero-padded basis slots). Returns [S, out_len].
    """
    Lc = x.shape[0]
    mu = jnp.mean(x)
    sd = jnp.std(x)
    xs = (x - mu) / jnp.where(sd == 0, 1.0, sd)

    a = rolling_mean(xs, n)
    m2 = rolling_mean(xs * xs, n)
    var_pop = jnp.maximum(m2 - a * a, 0.0)
    power = var_pop * (n * n) / (n - 1.0)

    xfd = jnp.fft.rfft(xs, nfft)
    cc = jnp.fft.irfft(Ufd * xfd[None, None, :], nfft,
                       axis=-1)[:, :, n - 1:Lc]          # [S, Dmax, L']
    y = cc - sum_u[:, :, None] * a[None, None, :]
    y = jnp.where(d_mask[:, :, None], y, 0.0)
    num = jnp.sum(y * y, axis=1)                          # [S, L']
    ds = num / jnp.where(power == 0, jnp.inf, power)[None, :]
    return ds[:, ::nc]


@partial(jax.jit, static_argnames=("n", "nc", "nfft"))
def ds_bank_chunks(X, Ufd, sum_u, d_mask, n, nc, nfft):
    """Batch over chunks: X [B, Lc] -> [B, S, out_len]."""
    return jax.vmap(lambda x: ds_bank(x, Ufd, sum_u, d_mask, n, nc, nfft))(X)


def make_bank(U_list, nfft, dtype=jnp.float32, min_dmax=0):
    """
    Pack a list of [D_i, n] basis arrays (equal n) into padded bank arrays.

    Returns dict with Ufd [S, Dmax, R], sum_u [S, Dmax], d_mask [S, Dmax],
    n, Dmax.
    """
    n = U_list[0].shape[1]
    assert all(u.shape[1] == n for u in U_list)
    S = len(U_list)
    Dmax = max(max(u.shape[0] for u in U_list), int(min_dmax))
    U = np.zeros((S, Dmax, n), dtype=np.float64)
    mask = np.zeros((S, Dmax), dtype=bool)
    for i, u in enumerate(U_list):
        U[i, :u.shape[0]] = u
        mask[i, :u.shape[0]] = True
    Ufd = prep_basis_fd(U, nfft, dtype)
    sum_u = jnp.asarray(U.sum(axis=-1), dtype)
    return dict(Ufd=Ufd, sum_u=sum_u,
                d_mask=jnp.asarray(mask), n=int(n), Dmax=int(Dmax))


# ---------------------------------------------------------------------------
# Demultiplexed (polyphase) formulation — the production fast path.
#
# The DS is only evaluated at channel-aligned window starts (the reference's
# [::Nc] stride, detect.py:578). At those lags the multiplexed correlation
# decomposes exactly into a sum of per-channel correlations:
#     c_d(m*Nc) = sum_c corr(x_c, u_{d,c})[m]
# so instead of one length-nfft irFFT per basis over the interleaved stream,
# we do one length-(nfft/Nc) irFFT per basis of the channel-summed cross
# spectra — ~4x less FFT work and 3x smaller intermediate arrays, with
# bit-identical math (up to f32 rounding).
# ---------------------------------------------------------------------------


def make_bank_demux(U_list, nc, nfft2, dtype=jnp.float32, min_dmax=0):
    """
    Pack [D_i, n] multiplexed basis arrays into a demultiplexed bank:
    Ufd2 [S, Dmax, nc, R2] (rfft of reversed per-channel templates at
    nfft2), sum_u [S, Dmax], d_mask, n (multiplexed), n_c = n // nc.
    """
    n = U_list[0].shape[1]
    assert n % nc == 0, "template length must be a multiple of nc"
    S = len(U_list)
    Dmax = max(max(u.shape[0] for u in U_list), int(min_dmax))
    n_c = n // nc
    Ud = np.zeros((S, Dmax, nc, n_c), dtype=np.float64)
    mask = np.zeros((S, Dmax), dtype=bool)
    sum_u = np.zeros((S, Dmax), dtype=np.float64)
    for i, u in enumerate(U_list):
        for d in range(u.shape[0]):
            Ud[i, d] = np.asarray(u[d]).reshape(n_c, nc).T
        mask[i, :u.shape[0]] = True
        sum_u[i, :u.shape[0]] = u.sum(axis=-1)
    Ufd2 = jnp.fft.rfft(jnp.asarray(Ud[..., ::-1], dtype), int(nfft2),
                        axis=-1)
    return dict(Ufd2=Ufd2, sum_u=jnp.asarray(sum_u, dtype),
                d_mask=jnp.asarray(mask), n=int(n), n_c=int(n_c),
                Dmax=int(Dmax), nc=int(nc), nfft2=int(nfft2), demux=True)


@partial(jax.jit, static_argnames=("n_c", "nc", "nfft2"))
def ds_bank_demux(x, Ufd2, sum_u, d_mask, n_c, nc, nfft2):
    """
    DS of one multiplexed chunk against a demuxed bank.
    x: [Lc] (Lc divisible by nc). Returns [S, Lc//nc - n_c + 1].
    """
    Lc = x.shape[0]
    L_c = Lc // nc
    n = n_c * nc
    mu = jnp.mean(x)
    sd = jnp.std(x)
    xs = (x - mu) / jnp.where(sd == 0, 1.0, sd)
    xc = xs.reshape(L_c, nc).T                       # [nc, L_c]

    # per-channel rolling sums -> multiplexed window stats at strided
    # starts (MXU two-level prefix sums, rolling.window_stats_rows)
    a, power = window_stats_rows(xc[None], n_c, n)
    a, power = a[0], power[0]

    # full-length path: keep the backend FFT — its per-FFT overhead is
    # paid only nc + S*Dmax times per chunk here (large banks route to
    # the overlap-save path, where ops/dft.py matmul DFTs win 28x; the
    # same CT matmuls LOSE 2x at this path's small batch / big n)
    xfd = jnp.fft.rfft(xc, nfft2, axis=-1)           # [nc, R2]
    # sum cross-spectra over channels, then ONE irfft per (S, D)
    spec = jnp.einsum("sdcr,cr->sdr", Ufd2, xfd)     # [S, Dmax, R2]
    cc = jnp.fft.irfft(spec, nfft2, axis=-1)[:, :, n_c - 1:L_c]
    powsafe = jnp.where(power == 0, jnp.inf, power)
    if _use_pallas():
        from detex_tpu.ops.pallas_kernels import ds_finalize
        # masked slots have cc rows == 0 (zero-padded templates) and we
        # zero their sum_u so they drop out of the fused sum
        su = jnp.where(d_mask, sum_u, 0.0)
        return ds_finalize(cc, a, powsafe, su)
    y = cc - sum_u[:, :, None] * a[None, None, :]
    y = jnp.where(d_mask[:, :, None], y, 0.0)
    num = jnp.sum(y * y, axis=1)
    return num / powsafe[None, :]


@partial(jax.jit, static_argnames=("n_c", "nc", "nfft2"))
def ds_bank_demux_chunks(X, Ufd2, sum_u, d_mask, n_c, nc, nfft2):
    """Batch over chunks: X [B, Lc] -> [B, S, out]."""
    return jax.vmap(lambda x: ds_bank_demux(x, Ufd2, sum_u, d_mask, n_c, nc,
                                            nfft2))(X)


# ---------------------------------------------------------------------------
# Overlap-save demuxed formulation — the large-bank (matched-filter) path.
#
# A full-length cross-spectrum bank stores one rfft of size nfft2/2+1 per
# (template, channel): at 1000 templates x hour chunks that is ~6 GB of
# spectra and ~2 GB of per-chunk complex intermediates — HBM-prohibitive.
# Overlap-save correlation instead stores template spectra at a short block
# FFT (a few template lengths): the data channels are cut into overlapping
# blocks, transformed ONCE for all templates, conj-multiplied against the
# small spectra, and the circularly-contaminated head of each block's
# inverse transform is discarded. Identical math (up to f32 rounding),
# O(S * blk) memory instead of O(S * Lc).
# ---------------------------------------------------------------------------


def os_min_block(n_c):
    """Smallest legal overlap-save block FFT for per-channel template
    length n_c: the lane-aligned discard head plus one 128-sample output
    stride (see ds_bank_demux_os)."""
    pad0 = (-(n_c - 1)) % 128
    return n_c - 1 + pad0 + 128


def make_bank_demux_os(U_list, nc, blk_fft, dtype=jnp.float32, min_dmax=0):
    """Pack [D_i, n] multiplexed bases into an overlap-save demuxed bank:
    Ufd2 [S, Dmax, nc, blk_fft//2+1] (rfft of reversed per-channel
    templates at the block length)."""
    n = U_list[0].shape[1]
    assert n % nc == 0
    n_c = n // nc
    assert blk_fft >= os_min_block(n_c), \
        "block FFT too small: need >= aligned head + 128 " \
        "(os_min_block(n_c) = %d)" % os_min_block(n_c)
    S = len(U_list)
    Dmax = max(max(u.shape[0] for u in U_list), int(min_dmax))
    Ud = np.zeros((S, Dmax, nc, n_c), dtype=np.float64)
    mask = np.zeros((S, Dmax), dtype=bool)
    sum_u = np.zeros((S, Dmax), dtype=np.float64)
    for i, u in enumerate(U_list):
        for d in range(u.shape[0]):
            Ud[i, d] = np.asarray(u[d]).reshape(n_c, nc).T
        mask[i, :u.shape[0]] = True
        sum_u[i, :u.shape[0]] = u.sum(axis=-1)
    Ufd2 = jnp.fft.rfft(jnp.asarray(Ud[..., ::-1], dtype), int(blk_fft),
                        axis=-1)
    return dict(Ufd2=Ufd2, sum_u=jnp.asarray(sum_u, dtype),
                d_mask=jnp.asarray(mask), n=int(n), n_c=int(n_c),
                Dmax=int(Dmax), nc=int(nc), blk_fft=int(blk_fft),
                demux=True, os=True)


@partial(jax.jit, static_argnames=("n_c", "nc", "blk_fft"))
def ds_bank_demux_os(x, Ufd2, sum_u, d_mask, n_c, nc, blk_fft):
    """Overlap-save DS of one multiplexed chunk. Same contract as
    ds_bank_demux: x [Lc] -> [S, Lc//nc - n_c + 1]."""
    F, a, power = os_prep(x, n_c, nc, blk_fft)
    return _os_block(F, a, power, Ufd2, sum_u, d_mask, n_c, nc, blk_fft,
                     x.shape[0] // nc)


def _os_geometry(L_c, n_c, blk_fft):
    """Lane-aligned overlap-save decomposition: left-pad the signal so
    each block's circularly-contaminated head D0 (>= n_c-1) is a multiple
    of 128 — the finalize then slices tiles at aligned offsets (an
    unaligned slice makes Mosaic lane-rotate every tile), and the block
    advance W = blk - D0 is 128-aligned for the output grid."""
    out_len = L_c - n_c + 1
    pad0 = (-(n_c - 1)) % 128
    D0 = n_c - 1 + pad0
    W = blk_fft - D0
    assert W >= 128, "block FFT too small for the aligned decomposition"
    m = -(-out_len // W)                        # block count
    return out_len, pad0, D0, W, m


def os_prep(x, n_c, nc, blk_fft):
    """Chunk-shared prep of the overlap-save pipeline — standardization,
    window stats, overlapping-window construction and the forward block
    transform. Compute ONCE per chunk; every template block reuses the
    returned (F [nc, m, R], a, power). (XLA does not hoist this
    loop-invariant work out of a lax.map over template blocks.)"""
    Lc = x.shape[0]
    L_c = Lc // nc
    n = n_c * nc
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    mu = jnp.mean(x)
    sd = jnp.std(x)
    xs = (x - mu) / jnp.where(sd == 0, 1.0, sd)
    xc = xs.reshape(L_c, nc).T                  # [nc, L_c]

    # window stats exactly as the full-length kernel (MXU two-level
    # prefix sums — a plain cumsum over million-sample rows is ~log2(L)
    # full-array passes on TPU, rolling.rolling_sum_rows)
    a, power = window_stats_rows(xc[None], n_c, n)
    a, power = a[0], power[0]

    # overlapping data blocks, transformed once for every template.
    # Window i covers [i*W - pad0, i*W - pad0 + blk) of the signal (the
    # pad0 leading zeros shift output slot D0 of block i to correlation
    # position i*W); with stride W each window spans at most
    # ceil(blk/W)+1 consecutive W-rows of the padded signal, so the
    # overlapping-window matrix is a concat of shifted reshapes — never a
    # gather (TPU gathers serialize).
    k = -(-blk_fft // W) + 1
    xp = jnp.pad(xc, ((0, 0), (pad0, (m + k - 1) * W - L_c - pad0)))
    rows = [xp[:, j * W:(m + j) * W].reshape(nc, m, W) for j in range(k)]
    xb = jnp.concatenate(rows, axis=2)[:, :, :blk_fft]  # [nc, m, blk]
    # block transforms: MXU matmul DFTs on TPU — this backend's FFT has a
    # large per-FFT overhead and the bank needs S*m inverse transforms
    # per chunk (ops/dft.py)
    from detex_tpu.ops import dft as _dft
    if _dft.use_matmul_fft():
        F = _dft.rfft_ct(xb, blk_fft)           # [nc, m, R]
    else:
        F = jnp.fft.rfft(xb, blk_fft, axis=-1)
    return F, a, power


def _os_block(F, a, power, Ufd2, sum_u, d_mask, n_c, nc, blk_fft, L_c,
              nv=None, nbin=0):
    """One template block of the overlap-save pipeline from the shared
    prep. With ``nv`` (scan path) returns either a (masked ds_full,
    pyr_max, hist-or-None) tuple (pallas; ``nbin`` fuses the uniform
    histogram into the finalize) or the UNMASKED full-width ds [S, m*W]
    (XLA fallback — caller masks); without ``nv`` returns
    ds[:, :out_len]."""
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    from detex_tpu.ops import dft as _dft
    if _dft.use_matmul_fft():
        # cross-spectra: the einsum form lowers to r-batched [S,c]@[c,m]
        # micro-matmuls (per-call overhead again); an unrolled fused
        # multiply-add over the nc=3 channel axis stays elementwise
        spec = sum(Ufd2[:, :, c, None, :] * F[c][None, None, :, :]
                   for c in range(Ufd2.shape[2]))
        cb = _dft.irfft_ct(spec, blk_fft)       # [S, Dmax, m, blk]
    else:
        spec = jnp.einsum("sdcr,cmr->sdmr", Ufd2, F)
        cb = jnp.fft.irfft(spec, blk_fft, axis=-1)

    powsafe = jnp.where(power == 0, jnp.inf, power)
    S, Dmax = sum_u.shape
    if _use_pallas():
        from detex_tpu.ops.pallas_kernels import (ds_finalize_os,
                                                  ds_finalize_os_scan,
                                                  os_finalize_tile_rows)
        if os_finalize_tile_rows(S, Dmax, blk_fft) > 0:
            su = jnp.where(d_mask, sum_u, 0.0)
            # pad the window stats to the blocked output grid; the pad
            # tail (>= out_len) is sliced off below / masked by nv
            ap = jnp.pad(a, (0, m * W - out_len))
            pp = jnp.pad(powsafe, (0, m * W - out_len),
                         constant_values=1.0)
            cbf = cb.reshape(S * Dmax, m, blk_fft)
            suf = su.reshape(S * Dmax)
            if nv is not None and (W // 128) <= 128:
                return ds_finalize_os_scan(cbf, ap, pp, suf, nv, D0,
                                           Dmax, W, nbin=nbin)
            ds = ds_finalize_os(cbf, ap, pp, suf, D0, Dmax, W)
            return ds if nv is not None else ds[:, :out_len]
    cc = cb[..., D0:D0 + W].reshape(S, Dmax, m * W)
    if nv is None:
        cc = cc[:, :, :out_len]
    else:
        a = jnp.pad(a, (0, m * W - out_len))
        powsafe = jnp.pad(powsafe, (0, m * W - out_len),
                          constant_values=1.0)
    y = cc - sum_u[:, :, None] * a[None, None, :]
    y = jnp.where(d_mask[:, :, None], y, 0.0)
    num = jnp.sum(y * y, axis=1)
    return num / powsafe[None, :]


def os_block_scan(F, a, power, Ufd2, sum_u, d_mask, n_c, nc, blk_fft, L_c,
                  nv, nbin=0):
    """Scan-path per-template-block compute from the shared prep:
    returns (ds [S, m*W] with DS positions >= nv masked to -inf,
    pyr_max [S, (m*W)//128] per-128-sample block maxima,
    hist [S, nbin] or None — fused into the pallas finalize when
    ``nbin`` > 0 and the pallas path is taken)."""
    ds_full = _os_block(F, a, power, Ufd2, sum_u, d_mask, n_c, nc,
                        blk_fft, L_c, nv=nv, nbin=nbin)
    if isinstance(ds_full, tuple):      # pallas path emitted the pyramid
        return ds_full
    S = ds_full.shape[0]
    pos = jnp.arange(ds_full.shape[1])
    ds = jnp.where(pos[None, :] < nv, ds_full, -jnp.inf)
    pyr = ds.reshape(S, -1, 128).max(axis=-1)
    return ds, pyr, None


@partial(jax.jit, static_argnames=("n_c", "nc", "blk_fft"))
def ds_bank_demux_os_scan(x, nv, Ufd2, sum_u, d_mask, n_c, nc, blk_fft):
    """Single-call scan variant (prep + one block); the batched scan
    hoists os_prep out of its template-block loop instead."""
    F, a, power = os_prep(x, n_c, nc, blk_fft)
    return os_block_scan(F, a, power, Ufd2, sum_u, d_mask, n_c, nc,
                         blk_fft, x.shape[0] // nc, nv)


# ---------------------------------------------------------------------------
# Fold-batch overlap-save scan — the round-3 subspace-scan fast path.
#
# The batched scan used to lax.map the per-chunk pipeline over the B-chunk
# batch: every one of its ~10 ops then executes B times, and this backend
# charges a large FIXED cost per op execution (PERF.md: the 7.1 ms/chunk DS
# core has no dominant op — it is per-op overhead). Folding the chunk batch
# into the leading dims of every op makes the whole B-chunk launch ONE
# instance of each op: the rolling stats are one batched cumsum, the block
# DFTs are two flat MXU matmuls with ALL of (B, nc|S*D, m) folded into M
# (ops/dft.py), and the finalize+mask+pyramid+histogram is one Pallas pass.
# ---------------------------------------------------------------------------


def os_prep_batch(X, n_c, nc, blk_fft):
    """Batched os_prep: X [B, Lc] -> (F [B, nc, m, R], a [B, M],
    power [B, M]) with all batch dims folded into single op instances."""
    B, Lc = X.shape
    L_c = Lc // nc
    n = n_c * nc
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    mu = jnp.mean(X, axis=1, keepdims=True)
    sd = jnp.std(X, axis=1, keepdims=True)
    xs = (X - mu) / jnp.where(sd == 0, 1.0, sd)
    xc = xs.reshape(B, L_c, nc).transpose(0, 2, 1)      # [B, nc, L_c]

    a, power = window_stats_rows(xc, n_c, n)            # [B, M]

    k = -(-blk_fft // W) + 1
    xp = jnp.pad(xc, ((0, 0), (0, 0),
                      (pad0, (m + k - 1) * W - L_c - pad0)))
    rows = [xp[:, :, j * W:(m + j) * W].reshape(B, nc, m, W)
            for j in range(k)]
    xb = jnp.concatenate(rows, axis=3)[:, :, :, :blk_fft]  # [B, nc, m, blk]
    from detex_tpu.ops import dft as _dft
    if _dft.use_matmul_fft():
        F = _dft.rfft_ct(xb, blk_fft)
    else:
        F = jnp.fft.rfft(xb, blk_fft, axis=-1)
    return F, a, power


def os_block_scan_batch(F, a, power, Ufd2, sum_u, d_mask, n_c, nc, blk_fft,
                        L_c, nv, nbin=0):
    """Fold-batch per-template-block compute: F [B, nc, m, R],
    a/power [B, M], nv [B] -> (ds [B, S, m*W] masked to -inf past nv,
    pyr [B, S, (m*W)//128], hist [B, S, nbin] or None).

    Requires the fused Pallas finalize (caller checks
    fold_scan_supported); ``nbin`` > 0 additionally accumulates the
    per-row uniform histogram inside the same VMEM pass."""
    B = F.shape[0]
    S, Dmax = sum_u.shape
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    from detex_tpu.ops import dft as _dft
    if _dft.use_matmul_fft():
        spec = sum(Ufd2[None, :, :, c, None, :] *
                   F[:, c][:, None, None, :, :]
                   for c in range(Ufd2.shape[2]))
        cb = _dft.irfft_ct(spec, blk_fft)       # [B, S, Dmax, m, blk]
    else:
        spec = jnp.einsum("sdcr,bcmr->bsdmr", Ufd2, F)
        cb = jnp.fft.irfft(spec, blk_fft, axis=-1)

    powsafe = jnp.where(power == 0, jnp.inf, power)
    su = jnp.where(d_mask, sum_u, 0.0)
    # row-major (chunk, detector) layout
    pad_w = m * W - out_len
    ap = jnp.pad(a, ((0, 0), (0, pad_w)))
    pp = jnp.pad(powsafe, ((0, 0), (0, pad_w)), constant_values=1.0)
    suf = jnp.broadcast_to(su[None], (B, S, Dmax)).reshape(B * S * Dmax)
    from detex_tpu.ops.pallas_kernels import ds_finalize_os_fold
    if S % 8 == 0:
        # grouped stats: each chunk's S detector rows share one stats row
        # in the kernel (tiles never straddle chunks) — no replication
        ds, pyr, hist = ds_finalize_os_fold(
            cb.reshape(B * S * Dmax, m, blk_fft), ap, pp, suf,
            jnp.asarray(nv, jnp.int32), D0, Dmax, W, nbin=nbin, group=S)
    else:
        # small-S path: replicate the window stats per detector row
        apr = jnp.broadcast_to(ap[:, None, :], (B, S, m * W)).reshape(
            B * S, m * W)
        ppr = jnp.broadcast_to(pp[:, None, :], (B, S, m * W)).reshape(
            B * S, m * W)
        nvr = jnp.broadcast_to(
            jnp.asarray(nv, jnp.int32)[:, None], (B, S)).reshape(B * S)
        ds, pyr, hist = ds_finalize_os_fold(
            cb.reshape(B * S * Dmax, m, blk_fft), apr, ppr, suf, nvr, D0,
            Dmax, W, nbin=nbin)
    ds = ds.reshape(B, S, m * W)
    pyr = pyr.reshape(B, S, -1)
    if hist is not None:
        hist = hist.reshape(B, S, nbin)
    return ds, pyr, hist


def os_prep_batch_pair(X, n_c, nc, blk_fft):
    """os_prep_batch emitting the block spectra as a float32 (real, imag)
    pair (Fr, Fi) [B*nc, m*Rp] for the fused spec->DS kernel — the complex
    spectra array never exists. Stats (a, power) as os_prep_batch."""
    B, Lc = X.shape
    L_c = Lc // nc
    n = n_c * nc
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    mu = jnp.mean(X, axis=1, keepdims=True)
    sd = jnp.std(X, axis=1, keepdims=True)
    xs = (X - mu) / jnp.where(sd == 0, 1.0, sd)
    xc = xs.reshape(B, L_c, nc).transpose(0, 2, 1)      # [B, nc, L_c]

    a, power = window_stats_rows(xc, n_c, n)            # [B, M]

    k = -(-blk_fft // W) + 1
    xp = jnp.pad(xc, ((0, 0), (0, 0),
                      (pad0, (m + k - 1) * W - L_c - pad0)))
    rows = [xp[:, :, j * W:(m + j) * W].reshape(B, nc, m, W)
            for j in range(k)]
    xb = jnp.concatenate(rows, axis=3)[:, :, :, :blk_fft]  # [B, nc, m, blk]
    from detex_tpu.ops import dft as _dft
    Rp = _dft.half_rp(blk_fft)
    fr, fi = _dft.rfft_pair(xb.reshape(B * nc * m, blk_fft), blk_fft, Rp)
    return (fr.reshape(B * nc, m * Rp), fi.reshape(B * nc, m * Rp),
            a, power)


def fwd_prep_ok(n_c, nc, blk_fft):
    """True when the fused forward-prep kernel (framing + forward CT +
    window stats in one Pallas pass, pallas_kernels.fwd_prep_fold) can
    serve os_prep_batch_fused for this geometry. DETEX_TPU_FUSED_PREP=0
    reverts to the XLA prep (os_prep_batch_pair)."""
    import os
    if os.environ.get("DETEX_TPU_FUSED_PREP", "1") == "0":
        return False
    if not (_use_pallas() and _dft_mod().use_matmul_fft()):
        return False
    from detex_tpu.ops.pallas_kernels import fwd_prep_supported
    return fwd_prep_supported(nc, n_c, blk_fft)


def os_prep_batch_fused(X, n_c, nc, blk_fft):
    """os_prep_batch_pair via ONE Pallas pass (fwd_prep_fold): the framed
    block array, the global prefix sums and every rolling-stats
    intermediate stay in VMEM. Returns (Fr, Fi [B*nc, m'*Rp],
    a, power [B, m'*W]) with m' = ceil(m/stf)*stf >= m padded frames;
    a/power come back pre-padded and power-safe'd (see fwd_prep_fold) —
    os_scan_batch_fused detects the padded width and skips its own
    pad/powsafe pass. Callers must tolerate m' > m: DS positions past
    out_len are masked to -inf by the nv gate like the m*W pad already
    was (round-4 profile: the XLA prep was 163 of the 201 ms subspace
    scan launch, 109 ms of it the rolling stats)."""
    from detex_tpu.ops.pallas_kernels import fwd_prep_fold, PREP_STF
    B, Lc = X.shape
    L_c = Lc // nc
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    stf = PREP_STF
    mt = -(-m // stf)
    Lp = (mt * stf + 1) * W
    mu = jnp.mean(X, axis=1, keepdims=True)
    sd = jnp.std(X, axis=1, keepdims=True)
    xs = (X - mu) / jnp.where(sd == 0, 1.0, sd)
    xc = xs.reshape(B, L_c, nc).transpose(0, 2, 1)      # [B, nc, L_c]
    xq = jnp.pad(xc, ((0, 0), (0, 0), (pad0, Lp - L_c - pad0)))
    return fwd_prep_fold(xq, nc, n_c, blk_fft, stf, out_len)


def bank_spec_pair(bank, udtype="f32"):
    """Padded (real, imag) template spectra [Dmax, S, nc, Rp]
    (basis-dim-major — the fused kernel's grid sweeps basis dims on its
    innermost axis) for the fused spec->DS kernel, cached on the bank
    dict. Masked basis slots are identically zero (rfft of the
    zero-padded Ud rows).

    The half-spectrum inverse weights c_k/n (c_0 = c_{n/2} = 1 else 2,
    divided by the block length) are FOLDED IN here: the FMA inside
    spec_ds_fold then yields the weighted Z directly, saving the kernel
    two [st, Rp] multiplies, an iota/where and the final 1/n scale per
    grid cell.

    ``udtype`` (pallas_kernels.spec_udtype): "f32" float32 (default);
    "bf16" bfloat16 (half the streamed HBM bytes, ~3e-3 relative DS
    error); "bf16x2" hi+lo bfloat16 split carried as extra channel slots
    [Dmax, S, 2*nc, Rp] (~f32 accuracy, same bytes as f32 — the PERF.md
    round-4 measured-rejection experiment)."""
    key = "_spec_pair" if udtype == "f32" else "_spec_pair_" + udtype
    if key not in bank:
        from detex_tpu.ops import dft as _dft
        Ufd2 = bank["Ufd2"]
        blk = bank["blk_fft"]
        R = Ufd2.shape[-1]
        Rp = _dft.half_rp(blk)
        k = np.arange(Rp)
        wk = np.where((k == 0) | (k >= blk // 2), 1.0, 2.0) / blk
        wk = jnp.asarray(wk, jnp.float32)
        pad = [(0, 0)] * (Ufd2.ndim - 1) + [(0, Rp - R)]
        ur = (jnp.pad(jnp.real(Ufd2).astype(jnp.float32), pad)
              * wk).transpose(1, 0, 2, 3)
        ui = (jnp.pad(jnp.imag(Ufd2).astype(jnp.float32), pad)
              * wk).transpose(1, 0, 2, 3)
        if udtype == "bf16":
            ur = ur.astype(jnp.bfloat16)
            ui = ui.astype(jnp.bfloat16)
        elif udtype == "bf16x2":
            def hilo(v):
                hi = v.astype(jnp.bfloat16)
                lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                # hi rides channels [0, nc), lo [nc, 2*nc)
                return jnp.concatenate([hi, lo], axis=2)
            ur, ui = hilo(ur), hilo(ui)
        bank[key] = (ur, ui)
    return bank[key]


def spec_ds_mode(B, S, Dmax, n_c, nc, blk_fft):
    """Row-ordering mode for the fused spec->DS kernel, or None when the
    config must use the unfused fold path. Prefers "net" (rows (chunk,
    template), S % SPEC_DS_ST == 0 — template-blocked banks qualify at
    the default tile of 8); "sub" (rows (template, chunk)) covers small
    banks when B % SPEC_DS_ST == 0. The tile-row count is the sanitized
    DETEX_TPU_SPECDS_ST override (pallas_kernels.SPEC_DS_ST, default
    8); spec_ds_supported also enforces a VMEM-fit bound on it."""
    import os
    if os.environ.get("DETEX_TPU_SPECDS", "1") == "0":
        return None
    if not (_use_pallas() and _dft_mod().use_matmul_fft()):
        return None
    from detex_tpu.ops.pallas_kernels import spec_ds_supported
    for mode in ("net", "sub"):
        if spec_ds_supported(mode, B, S, Dmax, nc, n_c, blk_fft):
            return mode
    return None


def _dft_mod():
    from detex_tpu.ops import dft as _dft
    return _dft


def os_scan_batch_fused(Fr, Fi, a, power, ur, ui, sum_u, d_mask, mode,
                        n_c, nc, blk_fft, L_c, nv, nbin=0, emit_ds=True):
    """Fused-kernel twin of os_block_scan_batch: one Pallas pass does the
    channel FMA, the half-spectrum CT inverse, the DS finalize, the pad
    mask, the trigger pyramid and the histogram (ops/pallas_kernels
    spec_ds_fold). Returns FLAT row-major outputs:

    mode "net": ds [B*S, m*W] rows (chunk, template)
    mode "sub": ds [S*B, m*W] rows (template, chunk)
    plus (pyr, hist) with matching row order.

    ``emit_ds=False`` (the engine's summary-only scan) returns
    (None, pyr, hist): the DS array never reaches HBM.

    ur, ui: bank_spec_pair output [Dmax, S, nc, Rp] (basis-dim-major;
    bfloat16 variants — [.., nc, Rp] "bf16" or hi+lo [.., 2*nc, Rp]
    "bf16x2" — are detected from the operand dtype/shape so the jit
    cache keys on them, not on an env read at trace time)."""
    S, Dmax = sum_u.shape
    out_len, pad0, D0, W, m = _os_geometry(L_c, n_c, blk_fft)
    su = jnp.where(d_mask, sum_u, 0.0).T             # [Dmax, S]
    Rp = _dft_mod().half_rp(blk_fft)
    if a.shape[1] == out_len:
        # XLA prep (os_prep_batch_pair): pad + power-safe here
        powsafe = jnp.where(power == 0, jnp.inf, power)
        pad_w = m * W - out_len
        ap = jnp.pad(a, ((0, 0), (0, pad_w)))
        pp = jnp.pad(powsafe, ((0, 0), (0, pad_w)), constant_values=1.0)
    else:
        # fused prep (os_prep_batch_fused): arrives pre-padded (possibly
        # past m*W — padded frames are nv-masked downstream) + safe
        assert a.shape[1] % W == 0 and a.shape[1] * Rp == Fr.shape[1] * W
        ap, pp = a, power
    if ur.dtype == jnp.bfloat16:
        udtype = "bf16x2" if ur.shape[-2] == 2 * nc else "bf16"
    else:
        udtype = "f32"
    u2r = ur.reshape(Dmax, S, -1)
    u2i = ui.reshape(Dmax, S, -1)
    from detex_tpu.ops.pallas_kernels import spec_ds_fold
    return spec_ds_fold(u2r, u2i, Fr, Fi, ap, pp, su,
                        jnp.asarray(nv, jnp.int32), mode, nc, Dmax, W, D0,
                        blk_fft, nbin=nbin, emit_ds=emit_ds, udtype=udtype)


def fold_scan_supported(B, S, Dmax, n_c, blk_fft):
    """True when the fold-batch OS scan's Pallas finalize can handle this
    config (tile legality + VMEM budget + pyramid-width limit)."""
    if not _use_pallas():
        return False
    pad0 = (-(n_c - 1)) % 128
    D0 = n_c - 1 + pad0
    W = blk_fft - D0
    if W < 128 or W % 128 or (W // 128) > 128:
        return False
    from detex_tpu.ops.pallas_kernels import fold_tile_rows
    return fold_tile_rows(B * S, Dmax, blk_fft) > 0


# full-length spectra above this many complex elements switch the bank to
# the overlap-save form (S * Dmax * nc * (nfft2/2+1))
OS_SPECTRA_BUDGET = 1 << 26


def pad_rows(S):
    """Detector-row count ladder for shape-canonical banks: the smallest
    S' >= S that is a multiple of max(8, 2^(bit_length(S-1)-3)) — i.e.
    multiples of 8 up to 64, then ~12.5%-granularity rungs (96, 112, 128,
    160, ...). Detector banks padded to a rung share one compiled XLA
    program across stations/groups whose true counts land on the same
    rung, instead of one program per exact count (remote compiles cost
    minutes on this backend — SURVEY §7 "keep XLA compile counts
    bounded"); the pad rows are all-zero templates whose DS is
    identically 0. Wasted compute is bounded at ~12.5%.
    DETEX_TPU_PAD_BANKS=0 disables both shape ladders (exact counts)."""
    import os
    S = int(S)
    if os.environ.get("DETEX_TPU_PAD_BANKS", "1") == "0":
        return S
    if S <= 8:
        return 8
    q = max(8, 1 << (int(S - 1).bit_length() - 3))
    return -(-S // q) * q


def pad_dims(D):
    """Basis-dimension ladder (next power of two): banks whose true Dmax
    lands on the same rung share a compiled program; masked pad slots are
    zero templates. DETEX_TPU_PAD_BANKS=0 disables."""
    import os
    if os.environ.get("DETEX_TPU_PAD_BANKS", "1") == "0":
        return int(D)
    return 1 << max(int(D - 1).bit_length(), 0)


def build_bank(U_list, nc, data_len_samps, dtype=jnp.float32,
               block_fft=None, prefer_os=False, pad_S=None, min_dmax=0):
    """
    Pack basis arrays into the fastest applicable bank for scanning chunks
    of ``data_len_samps`` multiplexed samples: the demultiplexed (polyphase)
    form when the template length divides into the channels, else the
    multiplexed form. Also records ``pad_len`` (fixed chunk padding) and the
    FFT length.

    Large banks (many matched-filter templates) automatically use the
    overlap-save demuxed form, which stores template spectra at a short
    block FFT instead of the full chunk length (``block_fft`` forces a
    specific block size; block_fft=0 forces full-length).

    ``prefer_os=True`` chooses the overlap-save form for SMALL banks too —
    the fold-batch scan path (parallel/scan.py) needs it; on TPU the
    short-block matmul DFTs plus the fused finalize beat the full-length
    backend FFT once the chunk batch is folded into each op.

    ``pad_S`` pads the detector-row count with all-zero templates (DS
    identically 0) and ``min_dmax`` pads the basis-slot count with masked
    zero slots: banks padded to a shared shape ladder (:func:`pad_rows`,
    :func:`pad_dims`) compile ONE program per rung instead of one per
    exact count — the round-4 end-to-end collapse was compile-dominated
    (CONFIG5_r04; VERDICT round-4 #1). Callers that index detector rows
    must use their true row list (e.g. bank["names"]), not ``sum_u``'s
    padded leading dim.
    """
    n = U_list[0].shape[1]
    if pad_S is not None and int(pad_S) > len(U_list):
        U_list = list(U_list) + [np.zeros((1, n), np.float64)] * (
            int(pad_S) - len(U_list))
    pad_len = int(data_len_samps)
    pad_len += (-pad_len) % nc  # keep divisible by nc
    if n % nc == 0:
        n_c = n // nc
        L_c = pad_len // nc
        nfft2 = 2 ** int(L_c + n_c).bit_length()
        Dmax = max(max(u.shape[0] for u in U_list), int(min_dmax))
        full_elems = len(U_list) * Dmax * nc * (nfft2 // 2 + 1)
        use_os = (block_fft if block_fft is not None
                  else (prefer_os or full_elems > OS_SPECTRA_BUDGET))
        if use_os:
            blk = int(block_fft) if block_fft else \
                2 ** int(4 * n_c).bit_length()
            # the aligned decomposition needs head + one 128-stride
            # (short templates would otherwise get an all-head block)
            while blk < os_min_block(n_c):
                blk *= 2
            if (not block_fft and blk < 16384 and nfft2 >= 16384
                    and _use_pallas() and _dft_mod().use_matmul_fft()):
                # the fused spec->DS kernel structurally requires blk
                # with a 128-row CT split (n1 == 128 -> blk = 16384;
                # 32768's W exceeds the 128x128 pyramid tile), so short
                # templates' natural 4*n_c block (e.g. n_c=1024 at 50 Hz
                # -> 8192) silently fell back to the unfused fold path.
                # Snap up: W/blk efficiency even improves, and the fused
                # route is the measured-fastest scan (PERF.md round 5,
                # config-5 engine route)
                blk = 16384
            blk = min(blk, nfft2)
            if blk < os_min_block(n_c):  # chunk too short for OS blocks
                bank = make_bank_demux(U_list, nc, nfft2, dtype,
                                       min_dmax=min_dmax)
            else:
                bank = make_bank_demux_os(U_list, nc, blk, dtype,
                                          min_dmax=min_dmax)
        else:
            bank = make_bank_demux(U_list, nc, nfft2, dtype,
                                   min_dmax=min_dmax)
    else:
        nfft = 2 ** int(pad_len + n).bit_length()
        bank = make_bank(U_list, nfft, dtype, min_dmax=min_dmax)
        bank["nfft"] = nfft
        bank["demux"] = False
        bank["nc"] = int(nc)
    bank["pad_len"] = pad_len
    return bank


def run_bank(x_np, bank, nc, nfft=None, pad_len=None):
    """
    Run a detector bank over one (possibly ragged) host chunk with
    fixed-shape padding so XLA compiles once per (pad_len, bank) shape.

    Returns a numpy [S, n_valid] DS array where n_valid covers only windows
    fully inside the real data (pad windows are sliced off; DS is invariant
    to the affine standardization including pad zeros for those windows).

    NOTE: this transfers the WHOLE [S, n_valid] array device->host. When
    only a few detector rows are needed (the engine's triggered-chunk
    re-verify), use :func:`run_bank_rows` — one bank compute, row-sized
    transfers.
    """
    x_np = np.asarray(x_np)
    Lc = len(x_np)
    n = bank["n"]
    if pad_len is None:
        pad_len = bank.get("pad_len", Lc + ((-Lc) % nc))
    if Lc > pad_len:
        x_np = x_np[:pad_len]
        Lc = pad_len
    xp = np.zeros(pad_len, dtype=np.float32)
    xp[:Lc] = x_np
    if bank.get("os"):
        out = ds_bank_demux_os(jnp.asarray(xp), bank["Ufd2"], bank["sum_u"],
                               bank["d_mask"], bank["n_c"], int(nc),
                               bank["blk_fft"])
    elif bank.get("demux"):
        out = ds_bank_demux(jnp.asarray(xp), bank["Ufd2"], bank["sum_u"],
                            bank["d_mask"], bank["n_c"], int(nc),
                            bank["nfft2"])
    else:
        if nfft is None:
            nfft = bank["nfft"]
        out = ds_bank(jnp.asarray(xp), bank["Ufd"], bank["sum_u"],
                      bank["d_mask"], bank["n"], int(nc), int(nfft))
    n_valid = (Lc - n) // int(nc) + 1
    if n_valid <= 0:
        return np.zeros((out.shape[0], 0), dtype=np.float32)
    return np.asarray(out[:, :n_valid])


def run_bank_rows(x_np, bank, nc, rows):
    """
    DS of selected detector rows over one host chunk: ONE bank compute on
    device, then only ``rows`` (an iterable of row indices) cross back to
    host. This is the triggered-chunk re-verify path of the detection
    engine: a chunk where k of S detectors trigger costs one bank launch
    plus k row-sized transfers instead of k full-bank launches each
    hauling the whole [S, L] DS array through the device->host tunnel
    (~25 MB/s here; VERDICT round-3 weak #1).

    Returns a dict {row_index: numpy [n_valid] DS vector}.
    """
    rows = list(rows)
    if not rows:
        return {}
    x_np = np.asarray(x_np)
    Lc = len(x_np)
    n = bank["n"]
    pad_len = bank.get("pad_len", Lc + ((-Lc) % nc))
    if Lc > pad_len:
        x_np = x_np[:pad_len]
        Lc = pad_len
    xp = np.zeros(pad_len, dtype=np.float32)
    xp[:Lc] = x_np
    if bank.get("os"):
        out = ds_bank_demux_os(jnp.asarray(xp), bank["Ufd2"], bank["sum_u"],
                               bank["d_mask"], bank["n_c"], int(nc),
                               bank["blk_fft"])
    elif bank.get("demux"):
        out = ds_bank_demux(jnp.asarray(xp), bank["Ufd2"], bank["sum_u"],
                            bank["d_mask"], bank["n_c"], int(nc),
                            bank["nfft2"])
    else:
        out = ds_bank(jnp.asarray(xp), bank["Ufd"], bank["sum_u"],
                      bank["d_mask"], bank["n"], int(nc), bank["nfft"])
    n_valid = (Lc - n) // int(nc) + 1
    if n_valid <= 0:
        z = np.zeros(0, dtype=np.float32)
        return {int(si): z for si in rows}
    # basic (non-advanced) indexing per row: each pull is a tiny sliced
    # program over the SAME bank result — no per-count recompiles, and
    # only len(rows) * n_valid floats cross the tunnel
    return {int(si): np.asarray(out[int(si), :n_valid]) for si in rows}


def _bank_batch_out(x_list, bank, nc):
    """Shared batched bank program: pad the host chunks to a power-of-two
    batch (shared compile classes), run the whole bank in ONE device
    program (fold-batch when supported, else lax.map) and return the
    DEVICE [Bp, S, L] DS array plus the per-chunk valid lengths — the
    caller decides what (rows, trigger windows, ...) crosses the tunnel."""
    pad_len = bank["pad_len"]
    B = len(x_list)
    Bp = 1 << (B - 1).bit_length()        # power-of-two compile classes
    X = np.zeros((Bp, pad_len), np.float32)
    lens = []
    for i, x in enumerate(x_list):
        L = min(len(x), pad_len)
        X[i, :L] = np.asarray(x[:L], np.float32)
        lens.append(L)
    lens.extend([0] * (Bp - B))
    return _bank_batch_program(jnp.asarray(X), lens, bank, nc)


def _bank_batch_program(Xd, lens, bank, nc):
    """Program part of :func:`_bank_batch_out` on an already-device-
    resident, already-padded [Bp, pad_len] chunk batch (``lens`` zero-
    padded to Bp; zero-length slots are fully masked by nv). The
    engine's device-windowed re-verify feeds this directly so triggered
    chunks — uploaded once for the scan — are never re-uploaded."""
    n = bank["n"]
    pad_len = bank["pad_len"]
    assert Xd.shape == (len(lens), pad_len)
    if bank.get("os"):
        Dmax = int(bank["Dmax"])
        S = int(bank["sum_u"].shape[0])
        L_c = pad_len // int(nc)
        _, _, _, W_, m_ = _os_geometry(L_c, bank["n_c"], bank["blk_fft"])
        Bp = Xd.shape[0]
        fold_ok = (fold_scan_supported(Bp, S, Dmax, bank["n_c"],
                                       bank["blk_fft"])
                   and Bp * S * Dmax * m_ * bank["blk_fft"] * 4
                   <= (2 << 30))
        if fold_ok:
            nv = jnp.asarray([max((L - n) // int(nc) + 1, 0) for L in lens],
                             jnp.int32)
            out = _run_bank_batch_fold(Xd, nv, bank["Ufd2"],
                                       bank["sum_u"], bank["d_mask"],
                                       bank["n_c"], int(nc),
                                       bank["blk_fft"])
        else:
            out = _ds_map_demux_os(Xd, bank["Ufd2"], bank["sum_u"],
                                   bank["d_mask"], bank["n_c"], int(nc),
                                   bank["blk_fft"])
    elif bank.get("demux"):
        out = _ds_map_demux(Xd, bank["Ufd2"], bank["sum_u"],
                            bank["d_mask"], bank["n_c"], int(nc),
                            bank["nfft2"])
    else:
        out = _ds_map_mux(Xd, bank["Ufd"], bank["sum_u"], bank["d_mask"],
                          bank["n"], int(nc), bank["nfft"])
    return out, lens


def run_bank_triggers_batch(x_list, bank, nc, rows_list, thr_list, sr_list,
                            lta_time, sta_time, use_stalta,
                            max_triggers=4096, x_dev=None, lens_dev=None):
    """
    Device-windowed dense re-verify (the engine's triggered-chunk path):
    the bank DS rows, the optional DS STA/LTA and the exact trigger
    extraction all run inside the batched device program; only the
    per-trigger indices and values cross back to host (~KBs vs ~12 MB of
    full-row round trips per triggered detector on this backend's
    ~25 MB/s tunnel — the host chain downloads the row, re-uploads it
    for the STA/LTA kernel, downloads that, and uploads the row again
    for extract_triggers).

    The on-device chain (ops/triggers.trigger_rows_device) replicates
    the host order exactly — inf-zeroing when max > 1.1, centered
    STA/LTA, while-loop argmax/suppression extraction — on the very same
    f32 rows the host path would transfer, so results are bit-identical
    (tests/test_device_triggers.py asserts it end to end).

    Parameters mirror run_bank_rows_batch plus: ``thr_list`` — per chunk,
    an iterable of per-row trigger thresholds aligned with that chunk's
    ``rows_list`` entry; ``sr_list`` — per-chunk sampling rates (the
    20 s suppression buffer and STA/LTA windows are sample counts);
    ``lta_time``/``sta_time`` in seconds; ``use_stalta`` computes the
    STA/LTA values (engine: not fillZeros and triggerLTATime).

    Returns a list of dicts, one per chunk:
    {row_index: (idx int64[count], ds_at float32[count],
                 stalta_at float32[count] | None)}.

    ``x_dev``/``lens_dev``: optional DEVICE-resident alternative to
    ``x_list`` — a [Nsel, pad_len] float32 array of the triggered chunks
    (already padded to the bank's pad_len, e.g. gathered from the batch
    the scan uploaded) plus their valid lengths. Avoids re-uploading
    megabytes of chunk data the device already holds; ``x_list`` is then
    only consulted for its length (it may be the host payloads kept for
    the magnitude windows).
    """
    if not x_list and x_dev is None:
        return []
    from detex_tpu.ops import triggers as _trig
    if x_dev is not None:
        Nsel = x_dev.shape[0]
        Bp = 1 << max(Nsel - 1, 0).bit_length()
        # pad to a power of two via a row gather (index 0 repeated) with
        # the pad slots' lens zeroed -> fully nv-masked downstream
        sel = list(range(Nsel)) + [0] * (Bp - Nsel)
        Xd = jnp.take(x_dev, jnp.asarray(sel, jnp.int32), axis=0)
        lens = list(lens_dev) + [0] * (Bp - Nsel)
        out, lens = _bank_batch_program(Xd, lens, bank, nc)
        n_chunks = Nsel
    else:
        out, lens = _bank_batch_out(x_list, bank, nc)
        n_chunks = len(x_list)
    n = bank["n"]
    res = [dict() for _ in range(n_chunks)]
    # group jobs by the static parameters so each group is ONE jitted
    # program (rows padded to a power of two for shared compile classes)
    groups = {}
    for ci, (rows, thrs, sr) in enumerate(zip(rows_list, thr_list,
                                              sr_list)):
        L = (lens[ci] - n) // int(nc) + 1
        if L <= 0:
            z = np.zeros(0, np.float32)
            for si in rows:
                res[ci][int(si)] = (np.zeros(0, np.int64), z,
                                    z if use_stalta else None)
            continue
        buff = int(20 * sr)              # reference buff=20 s
        # replicate ds_stalta's window clamps exactly
        sta_n = max(int(sta_time * sr), 0) if use_stalta else 1
        sta_n = sta_n or 1
        lta_n = max(int(lta_time * sr), 1) if use_stalta else 1
        key = (L, sta_n, lta_n, buff)
        for si, thr in zip(rows, thrs):
            groups.setdefault(key, []).append((ci, int(si), float(thr)))
    for (L, sta_n, lta_n, buff), jobs in groups.items():
        R = len(jobs)
        Rp = 1 << (R - 1).bit_length()
        jp = jobs + [jobs[0]] * (Rp - R)
        cis = jnp.asarray([j[0] for j in jp], jnp.int32)
        sis = jnp.asarray([j[1] for j in jp], jnp.int32)
        thr = jnp.asarray([j[2] for j in jp], jnp.float32)
        rows_dev = out[cis, sis]                       # [Rp, Lv] gather
        idx_d, cnt_d, dsv_d, slv_d = _trig.trigger_rows_device(
            rows_dev, thr, L, sta_n, lta_n, buff, max_triggers,
            use_stalta)
        # ONE blocking transfer for the whole group: counts + the first
        # CAP trigger columns of idx/ds/stalta packed into a single f32
        # array (idx and cnt are < 2^24, exact in f32). The previous
        # count-then-slice flow paid TWO dependent round trips plus one
        # per output array through this tunnel (~25-30 ms each — the
        # dense-mode gap's dominant term, PERF.md round 5); the escalation
        # re-fetch below only fires when some row exceeds CAP triggers.
        cap = min(64, int(max_triggers))
        if L >= (1 << 24):
            cap = 0          # idx would lose f32 exactness; unpacked path
        if cap:
            packed = np.asarray(_trig.pack_trigger_outputs(
                idx_d, cnt_d, dsv_d, slv_d if use_stalta else None, cap))
            cnt = packed[:, 0].astype(np.int64)
            idx = packed[:, 1:1 + cap].astype(np.int64)
            dsv = packed[:, 1 + cap:1 + 2 * cap].astype(np.float32)
            slv = packed[:, 1 + 2 * cap:] if use_stalta else None
            cmax = max(int(cnt.max()), 1)
        else:
            cnt = np.asarray(cnt_d).astype(np.int64)
            cmax = max(int(cnt.max()), 1)
        if cmax > cap:
            # rare: more than CAP triggers on some row — re-fetch full
            # columns (power-of-two sliced so shapes share compiles)
            cp = 1 << (cmax - 1).bit_length()
            idx = np.asarray(idx_d[:, :cp]).astype(np.int64)
            dsv = np.asarray(dsv_d[:, :cp])
            slv = np.asarray(slv_d[:, :cp]) if use_stalta else None
        for k, (ci, si, _t) in enumerate(jobs):
            nf = int(cnt[k])
            res[ci][si] = (idx[k, :nf], dsv[k, :nf],
                           np.asarray(slv[k, :nf], np.float32)
                           if use_stalta else None)
    return res


def run_bank_rows_batch(x_list, bank, nc, rows_list):
    """
    Batched :func:`run_bank_rows`: ``x_list`` is a list of host chunks and
    ``rows_list`` the matching list of row-index iterables. ALL chunks run
    in ONE device program (the fold-batch scan when supported, else a
    lax.map — same kernels as run_bank_batch), padded to the next
    power-of-two batch so distinct trigger counts share compiles; only the
    requested rows cross back to host.

    This is the dense-detection re-verify path: a batch where k chunks
    trigger costs one k'-padded bank launch instead of k single-chunk
    launches, each of which pays this backend's full per-op fixed cost
    (VERDICT round-3 weak #1 "batch the re-verifies").

    Returns a list of {row_index: numpy [n_valid_i]} dicts, one per chunk.
    """
    if not x_list:
        return []
    if len(x_list) == 1:
        return [run_bank_rows(x_list[0], bank, nc, rows_list[0])]
    out, lens = _bank_batch_out(x_list, bank, nc)
    n = bank["n"]
    B = len(x_list)
    res = []
    for i in range(B):
        n_valid = (lens[i] - n) // int(nc) + 1
        if n_valid <= 0:
            z = np.zeros(0, dtype=np.float32)
            res.append({int(si): z for si in rows_list[i]})
            continue
        res.append({int(si): np.asarray(out[i, int(si), :n_valid])
                    for si in rows_list[i]})
    return res


def run_bank_batch(x_list, bank, nc):
    """
    Run a detector bank over a list of host chunks in ONE device call
    (the fold-batch scan when supported, else lax.map over the stacked
    batch — _bank_batch_out, which also pads the batch to the next power
    of two so ragged trailing batches share compile classes instead of
    each compiling a fresh program). Returns a list of numpy
    [S, n_valid_i] DS arrays, one per input chunk.
    """
    if not x_list:
        return []
    out, lens = _bank_batch_out(x_list, bank, nc)
    n = bank["n"]
    out = np.asarray(out)
    res = []
    for i in range(len(x_list)):
        n_valid = (lens[i] - n) // int(nc) + 1
        res.append(out[i, :, :max(n_valid, 0)])
    return res


@partial(jax.jit, static_argnames=("n_c", "nc", "blk_fft"))
def _run_bank_batch_fold(X, nv, Ufd2, sum_u, d_mask, n_c, nc, blk_fft):
    F, a, power = os_prep_batch(X, n_c, nc, blk_fft)
    ds, _, _ = os_block_scan_batch(F, a, power, Ufd2, sum_u, d_mask, n_c,
                                   nc, blk_fft, X.shape[1] // nc, nv)
    return ds                      # [B, S, m*W]; caller slices n_valid


@partial(jax.jit, static_argnames=("n_c", "nc", "nfft2"))
def _ds_map_demux(X, Ufd2, sum_u, d_mask, n_c, nc, nfft2):
    return jax.lax.map(lambda x: ds_bank_demux(x, Ufd2, sum_u, d_mask,
                                               n_c, nc, nfft2), X)


@partial(jax.jit, static_argnames=("n_c", "nc", "blk_fft"))
def _ds_map_demux_os(X, Ufd2, sum_u, d_mask, n_c, nc, blk_fft):
    return jax.lax.map(lambda x: ds_bank_demux_os(x, Ufd2, sum_u, d_mask,
                                                  n_c, nc, blk_fft), X)


@partial(jax.jit, static_argnames=("n", "nc", "nfft"))
def _ds_map_mux(X, Ufd, sum_u, d_mask, n, nc, nfft):
    return jax.lax.map(lambda x: ds_bank(x, Ufd, sum_u, d_mask, n, nc,
                                         nfft), X)


# ---------------------------------------------------------------------------
# Host-side numpy oracle (used by tests and as a CPU fallback). This is the
# straightforward transliteration of the math above in float64.
# ---------------------------------------------------------------------------


def ds_numpy(x, U, nc):
    """float64 reference implementation of the DS statistic."""
    x = np.asarray(x, np.float64)
    U = np.asarray(U, np.float64)
    D, n = U.shape
    Lc = len(x)
    # nfft >= Lc keeps the sliced region [n-1:Lc] free of circular wrap
    nfft = 2 ** int(Lc).bit_length()
    c = np.cumsum(np.insert(x, 0, 0.0))
    c2 = np.cumsum(np.insert(x * x, 0, 0.0))
    rsum = c[n:] - c[:-n]
    rsum2 = c2[n:] - c2[:-n]
    a = rsum / n
    var_samp = (rsum2 - rsum * rsum / n) / (n - 1)
    power = var_samp * n
    xfd = np.fft.rfft(x, nfft)
    Ufd = np.fft.rfft(U[:, ::-1], nfft, axis=-1)
    cc = np.fft.irfft(Ufd * xfd[None, :], nfft, axis=-1)[:, n - 1:Lc]
    y = cc - U.sum(axis=1)[:, None] * a[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        ds = (y ** 2).sum(axis=0) / power
    return ds[::nc]
