"""
Pallas TPU kernels for the DS hot path.

``ds_finalize``: fuses the post-FFT tail of the subspace detection
statistic — ``y = cc - sum_u * a;  ds = sum_d y^2 / power`` — into one
VMEM pass over the correlation tile instead of separate XLA elementwise
sweeps over the [S, D, L'] correlation array (reference math:
detect.py:570-577).

Grid: 1-D over L' tiles; each step loads a [S*D, T] correlation tile plus
the [T] rolling-mean and rolling-power vectors, and writes a [S, T] DS
tile. Masked basis slots (zero-padded D) contribute sum_u == 0 rows whose
cc is identically 0, so y == 0 and they drop out of the sum naturally.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU memory spaces; fall back gracefully off-TPU
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

LANE = 128
DEFAULT_TILE = 8 * 1024

def _env_tile_rows(name, default=8):
    """Sanitized tile-row override: Mosaic's sublane law needs multiples
    of 8; clamp bad env values instead of emitting illegal BlockSpecs
    (or the measured st>=16 runaway compiles from a typo'd huge value —
    the VMEM guards downstream still bound the upper end)."""
    try:
        v = int(os.environ.get(name, str(default)))
    except ValueError:
        return default
    return max(8, (v // 8) * 8)


# rows per tile for the fused CT transform kernels (forward/inverse block
# DFTs). Env-tunable for on-device sweeps: bigger tiles raise the matmul
# M dim and amortize per-cell fixed cost; the CT temporaries scale with
# st (st=8 ~4 MB; st=16 ~8 MB — near but under the VMEM limit).
CT_ST = _env_tile_rows("DETEX_TPU_CT_ST")

# experimental (A/B on device): batch the fused kernel's per-row hist
# one-hot dots into one wide dot per finalize (see _spec_ds_fold_kernel)
HIST_BATCH = os.environ.get("DETEX_TPU_HIST_BATCH", "0") == "1"


def _kdot(prec):
    """In-kernel [M,K]@[K,N] matmul for the CT kernels. Mosaic lowers
    only DEFAULT/HIGHEST f32 dot precisions; "bf16x3" emulates HIGH
    (three single-pass bf16 dots with f32 accumulation, dropping the
    lo*lo term — ~1e-6 relative error like XLA's HIGH) at half
    HIGHEST's MXU passes."""
    dims = (((1,), (0,)), ((), ()))
    if prec == "bf16x3":
        def dot(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = partial(jax.lax.dot_general, dimension_numbers=dims,
                        preferred_element_type=jnp.float32)
            return d(ah, bh) + (d(ah, bl) + d(al, bh))
        return dot
    return partial(jax.lax.dot_general, dimension_numbers=dims,
                   preferred_element_type=jnp.float32, precision=prec)



def _auto_interpret(interpret):
    """Pallas kernels run compiled on TPU and in interpret mode
    elsewhere (CPU CI forces routing with DETEX_TPU_PALLAS=1)."""
    if interpret is not None:
        return interpret
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def _finalize_kernel(cc_ref, a_ref, power_ref, sum_u_ref, out_ref):
    cc = cc_ref[...]                    # [SD, T]
    a = a_ref[...]                      # [1, T]
    power = power_ref[...]              # [1, T]
    su = sum_u_ref[...]                 # [SD, 1]
    y = cc - su * a                     # broadcast both ways
    S = out_ref.shape[0]
    D = cc.shape[0] // S
    y2 = (y * y).reshape(S, D, cc.shape[1]).sum(axis=1)
    out_ref[...] = y2 / power


@partial(jax.jit, static_argnames=("tile", "interpret"))
def ds_finalize(cc, a, power, sum_u, tile=DEFAULT_TILE, interpret=None):
    """
    Fused DS finalize.

    Parameters
    ----------
    cc : [S, D, L] correlation of data with each basis vector
    a : [L] rolling mean of the (standardized) data
    power : [L] rolling power (n * sample variance)
    sum_u : [S, D] basis-vector sums

    Returns
    -------
    ds [S, L]
    """
    interpret = _auto_interpret(interpret)
    S, D, L = cc.shape
    # cap the tile so all VMEM-resident blocks (cc in, ds out, a, power,
    # sum_u + double buffering) stay well under the ~16 MB VMEM budget
    rows = S * D + S + 2
    budget = 6 * 1024 * 1024 // 4  # floats
    fit = max(budget // max(rows, 1), LANE) // LANE * LANE
    tile = min(tile, fit)
    # pad L to a lane/tile multiple
    T = min(tile, max(LANE, (L + LANE - 1) // LANE * LANE))
    Lp = (L + T - 1) // T * T
    ccp = jnp.pad(cc.reshape(S * D, L), ((0, 0), (0, Lp - L)))
    ap = jnp.pad(a, (0, Lp - L))[None, :]
    pw = jnp.pad(power, (0, Lp - L), constant_values=1.0)[None, :]
    su = sum_u.reshape(S * D, 1)
    grid = (Lp // T,)
    out = pl.pallas_call(
        _finalize_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S * D, T), lambda i: (0, i),
                         memory_space=_VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((S * D, 1), lambda i: (0, 0),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((S, T), lambda i: (0, i),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Lp), cc.dtype),
        interpret=interpret,
    )(ccp, ap, pw, su)
    return out[:, :L]


def ds_finalize_xla(cc, a, power, sum_u):
    """XLA reference implementation of the same fusion."""
    y = cc - sum_u[:, :, None] * a[None, None, :]
    num = jnp.sum(y * y, axis=1)
    return num / power[None, :]


def _hist_kernel(ds_ref, kio_ref, out_ref, *, nbin):
    """Accumulate exact per-row bin counts of one [st, T] DS tile into
    [st, g, g] via a two-level one-hot outer product on the MXU.

    Bin index = floor(v * nbin) over [0, 1] with the right edge inclusive
    (np.histogram semantics for uniform bins); out-of-range values are
    excluded. nbin must be a perfect square (20x20 for the 400-bin detex
    histogram). One-hots are built per row with 2-D ops only (Mosaic
    rejects 3-D iota / tiny-minor-dim 3-D vectors)."""
    li = pl.program_id(1)  # L-tile index: innermost, so the accumulator
                           # block stays VMEM-resident across steps

    @pl.when(li == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = int(round(nbin ** 0.5))
    v = ds_ref[...]                                   # [st, T]
    idx = jnp.floor(v * nbin)
    idx = jnp.where(v == 1.0, nbin - 1.0, idx)        # right-inclusive
    # no explicit validity mask: out-of-range values can never match a
    # bin index (pads -> negative coarse; v > 1 -> coarse >= g), so the
    # equality tests exclude them for free
    coarse = jnp.floor(idx * (1.0 / g))
    fine = idx - coarse * g
    kio = kio_ref[...]                                # [g, 1] = 0..g-1
    # strictly 2-D ops: [1, T] row slices against the [g, 1] bin column
    # broadcast to [g, T] one-hots (Mosaic rejects 1-D reshapes)
    for s in range(v.shape[0]):                       # static unroll
        A = (coarse[s:s + 1, :] == kio).astype(jnp.bfloat16)  # [g, T]
        B = (fine[s:s + 1, :] == kio).astype(jnp.bfloat16)
        cnt = jax.lax.dot_general(
            A, B, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [g, g]
        out_ref[s] += cnt


@partial(jax.jit, static_argnames=("nbin", "tile", "interpret"))
def hist_uniform(ds, nbin=400, tile=2048, interpret=None):
    """
    Exact uniform-bin histogram of each DS row over [0, 1]:
    ds [S, L] -> counts [S, nbin] (float32; integral values).

    Replaces the sort+searchsorted histogram on the scan hot path — a row
    sort of hour-chunk DS at a 128-template block costs ~120 ms on TPU v5e
    vs a few ms for this outer-product counting kernel. Binning uses
    floor(v*nbin) (right edge inclusive); the +/-1 bin-edge divergence vs
    searchsorted is documented canonically in PARITY.md ("uniform-bin DS
    histograms on TPU").
    """
    interpret = _auto_interpret(interpret)
    S, L = ds.shape
    g = int(round(nbin ** 0.5))
    assert g * g == nbin, "nbin must be a perfect square"
    st = 8 if S % 8 == 0 else S   # small: the kernel unrolls rows
    T = tile
    Lp = (L + T - 1) // T * T
    dsp = jnp.pad(ds, ((0, 0), (0, Lp - L)), constant_values=-1.0)
    kio = jnp.arange(g, dtype=jnp.float32)[:, None]
    grid = (S // st, Lp // T)
    out = pl.pallas_call(
        partial(_hist_kernel, nbin=nbin),
        grid=grid,
        in_specs=[pl.BlockSpec((st, T), lambda s, l: (s, l),
                               memory_space=_VMEM),
                  pl.BlockSpec((g, 1), lambda s, l: (0, 0),
                               memory_space=_VMEM)],
        out_specs=pl.BlockSpec((st, g, g), lambda s, l: (s, 0, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((S, g, g), jnp.float32),
        interpret=interpret,
    )(dsp, kio)
    return out.reshape(S, nbin)


def _irfft_ct_kernel(zr_ref, zi_ref, w2p_ref, twr_ref, twi_ref,
                     w1p_ref, out_ref, *, n1, n2, prec):
    """One fused Cooley-Tukey inverse transform pass: both matmul stages,
    the twiddle, and the real-part extraction run on VMEM-resident tiles
    (ops/dft.py decomposition; Z is the pre-built hermitian extension).

    Layout walk (n = n1*n2, k = k1 + n1*k2, t = n2*t1 + t2):
      z [st, n] -> [st, k2, k1] -> swap -> [st, k1, k2]
      stage 1 (contract k2, PACKED): [Zr|Zi] @ [[w2r, w2i], [-w2i, w2r]]
      twiddle:                 B = A * tw[k1, t2]
      swap to [st, t2, k1]; stage 2 (contract k1, REAL part only,
      PACKED): xT[st*t2, t1] = [Br|Bi] @ [[W1r^T], [-W1i^T]]
      swap back -> [st, t1, t2] -> [st, n], scale 1/n.
    Packed dots: 6 -> 2 per tile (per-dot fixed latency dominates on
    this backend; full-depth contractions feed the MXU better)."""
    st = out_ref.shape[0]
    dot = _kdot(prec)
    zz = jnp.concatenate([zr_ref[...].reshape(st, n2, n1),
                          zi_ref[...].reshape(st, n2, n1)], axis=1)
    zz = jnp.swapaxes(zz, 1, 2).reshape(st * n1, 2 * n2)   # [st*k1, zr|zi]
    aa = dot(zz, w2p_ref[...])                             # [st*k1, ar|ai]
    twr = twr_ref[...]                                     # [k1, t2]
    twi = twi_ref[...]
    ar3 = aa[:, :n2].reshape(st, n1, n2)
    ai3 = aa[:, n2:].reshape(st, n1, n2)
    br = ar3 * twr - ai3 * twi
    bi = ar3 * twi + ai3 * twr
    bb = jnp.swapaxes(jnp.concatenate([br, bi], axis=1), 1, 2)
    xr = dot(bb.reshape(st * n2, 2 * n1), w1p_ref[...])    # [st*t2, t1]
    xr = jnp.swapaxes(xr.reshape(st, n2, n1), 1, 2)        # [st, t1, t2]
    out_ref[...] = xr.reshape(st, n1 * n2) * (1.0 / (n1 * n2))


@partial(jax.jit, static_argnames=("n", "interpret"))
def irfft_ct_fused(zr, zi, n, interpret=None):
    """Fused-stage matmul inverse DFT of the hermitian-extended spectrum:
    zr/zi [N, n] -> real output [N, n] == jnp.fft.irfft of the original
    [N, n//2+1] spectrum. Requires n1 == 128 (ops/dft._split)."""
    interpret = _auto_interpret(interpret)
    from detex_tpu.ops import dft as _dft
    n1, n2 = _dft._split(n)
    assert n1 == 128, "fused CT kernel requires n1 == 128"
    (w2r, w2i), (twr, twi), (w1r, w1i) = _dft._ct_mats(n, True)
    prec = _dft._precision_mosaic()
    w2p = np.block([[w2r, w2i], [-w2i, w2r]])
    w1p = np.concatenate([w1r.T, -w1i.T], axis=0)
    N = zr.shape[0]
    st = CT_ST
    Np = (N + st - 1) // st * st
    if Np != N:
        zr = jnp.pad(zr, ((0, Np - N), (0, 0)))
        zi = jnp.pad(zi, ((0, Np - N), (0, 0)))
    const = lambda j: (0, 0)                              # noqa: E731
    cspec = [pl.BlockSpec(w2p.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twr.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twi.shape, const, memory_space=_VMEM),
             pl.BlockSpec(w1p.shape, const, memory_space=_VMEM)]
    out = pl.pallas_call(
        partial(_irfft_ct_kernel, n1=n1, n2=n2, prec=prec),
        grid=(Np // st,),
        in_specs=[pl.BlockSpec((st, n), lambda j: (j, 0),
                               memory_space=_VMEM),
                  pl.BlockSpec((st, n), lambda j: (j, 0),
                               memory_space=_VMEM)] + cspec,
        out_specs=pl.BlockSpec((st, n), lambda j: (j, 0),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, n), jnp.float32),
        interpret=interpret,
    )(zr, zi, jnp.asarray(np.ascontiguousarray(w2p)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(np.ascontiguousarray(w1p)))
    return out[:N]


def _rfft_ct_kernel(x_ref, w2p_ref, twr_ref, twi_ref, w1p_ref,
                    or_ref, oi_ref, *, n1, n2, prec):
    """Forward twin of _irfft_ct_kernel for REAL input (zi == 0: stage 1
    needs only one packed matmul against [w2r | w2i]). Emits the
    full-width complex spectrum as a (real, imag) pair via ONE packed
    stage-2 dot against [[w1rt, w1it], [-w1it, w1rt]] (output splits at
    the lane-aligned n1); the caller slices to n//2+1."""
    st = or_ref.shape[0]
    dot = _kdot(prec)
    x = x_ref[...].reshape(st, n2, n1)
    x = jnp.swapaxes(x, 1, 2).reshape(st * n1, n2)     # [st*k1, k2]
    aa = dot(x, w2p_ref[...])                          # [st*k1, ar|ai]
    twr = twr_ref[...]
    twi = twi_ref[...]
    ar3 = aa[:, :n2].reshape(st, n1, n2)
    ai3 = aa[:, n2:].reshape(st, n1, n2)
    br = ar3 * twr - ai3 * twi
    bi = ar3 * twi + ai3 * twr
    bb = jnp.swapaxes(jnp.concatenate([br, bi], axis=1), 1, 2)
    xx = dot(bb.reshape(st * n2, 2 * n1), w1p_ref[...])  # [st*t2, xr|xi]
    xr = jnp.swapaxes(xx[:, :n1].reshape(st, n2, n1), 1, 2)
    xi = jnp.swapaxes(xx[:, n1:].reshape(st, n2, n1), 1, 2)
    or_ref[...] = xr.reshape(st, n1 * n2)
    oi_ref[...] = xi.reshape(st, n1 * n2)


@partial(jax.jit, static_argnames=("n", "interpret"))
def rfft_ct_fused(x, n, interpret=None):
    """Fused-stage matmul forward DFT of real input x [N, n] (pre-padded):
    returns (fr, fi) [N, n] full-width; fr[:, :n//2+1] + i*fi[:, :n//2+1]
    == jnp.fft.rfft(x, n). Requires n1 == 128."""
    interpret = _auto_interpret(interpret)
    from detex_tpu.ops import dft as _dft
    n1, n2 = _dft._split(n)
    assert n1 == 128, "fused CT kernel requires n1 == 128"
    (w2r, w2i), (twr, twi), (w1r, w1i) = _dft._ct_mats(n, False)
    prec = _dft._precision_mosaic()
    w2p = np.concatenate([w2r, w2i], axis=1)
    w1p = np.block([[w1r.T, w1i.T], [-w1i.T, w1r.T]])
    N = x.shape[0]
    st = CT_ST
    Np = (N + st - 1) // st * st
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
    const = lambda j: (0, 0)                              # noqa: E731
    cspec = [pl.BlockSpec(w2p.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twr.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twi.shape, const, memory_space=_VMEM),
             pl.BlockSpec(w1p.shape, const, memory_space=_VMEM)]
    fr, fi = pl.pallas_call(
        partial(_rfft_ct_kernel, n1=n1, n2=n2, prec=prec),
        grid=(Np // st,),
        in_specs=[pl.BlockSpec((st, n), lambda j: (j, 0),
                               memory_space=_VMEM)] + cspec,
        out_specs=[pl.BlockSpec((st, n), lambda j: (j, 0),
                                memory_space=_VMEM),
                   pl.BlockSpec((st, n), lambda j: (j, 0),
                                memory_space=_VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Np, n), jnp.float32),
                   jax.ShapeDtypeStruct((Np, n), jnp.float32)],
        interpret=interpret,
    )(x, jnp.asarray(np.ascontiguousarray(w2p)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(np.ascontiguousarray(w1p)))
    return fr[:N], fi[:N]


def _finalize_os_kernel(cb_ref, a_ref, power_ref, sum_u_ref, out_ref, *,
                        head, D, W):
    cb = cb_ref[...]                    # [sd, blk] one OS block
    x = cb[:, head:head + W]            # valid part [sd, W], lane-aligned
    a = a_ref[...]                      # [1, W]
    power = power_ref[...]              # [1, W]
    su = sum_u_ref[...]                 # [sd, 1]
    y = x - su * a
    S = out_ref.shape[0]
    y2 = (y * y).reshape(S, D, W).sum(axis=1)
    out_ref[...] = y2 / power


def _finalize_os_scan_kernel(cb_ref, a_ref, power_ref, sum_u_ref, nv_ref,
                             kio_ref, out_ref, bmax_ref, hist_ref, *,
                             head, D, W, nbin):
    """Scan-path variant of _finalize_os_kernel: additionally masks DS
    positions >= nv (pad windows) to -inf and emits per-128-sample block
    maxima (the trigger pyramid + global max come free from these).
    With ``nbin`` it also accumulates the uniform-bin histogram across
    the m OS blocks — the separate counting-kernel sweep over the [S, L]
    DS array (40% of network-mode chunk time) folds into this pass."""
    i = pl.program_id(1)                # OS-block index (innermost so the
                                        # hist accumulator stays resident)
    cb = cb_ref[...]
    x = cb[:, head:head + W]
    a = a_ref[...]
    power = power_ref[...]
    su = sum_u_ref[...]
    y = x - su * a
    S = out_ref.shape[0]
    y2 = (y * y).reshape(S, D, W).sum(axis=1)
    ds = y2 / power
    pos = i * W + jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    ds = jnp.where(pos < nv_ref[0, 0], ds, -jnp.inf)
    out_ref[...] = ds
    nb = W // 128
    bm = ds.reshape(S, nb, 128).max(axis=-1)          # [S, nb]
    pad = jnp.full((S, 128 - nb), -jnp.inf, ds.dtype)
    bmax_ref[...] = jnp.concatenate([bm, pad], axis=1)
    if nbin:
        @pl.when(i == 0)
        def _init():
            hist_ref[...] = jnp.zeros_like(hist_ref)

        g = int(round(nbin ** 0.5))
        idx = jnp.floor(ds * nbin)
        idx = jnp.where(ds == 1.0, nbin - 1.0, idx)
        # out-of-range values (-inf pads, ds > 1) never match a bin index,
        # so no explicit validity mask is needed
        coarse = jnp.floor(idx * (1.0 / g))
        fine = idx - coarse * g
        kio = kio_ref[...]              # [g, 1]
        for s in range(S):              # static unroll over tile rows
            A = (coarse[s:s + 1, :] == kio).astype(jnp.bfloat16)
            Bf = (fine[s:s + 1, :] == kio).astype(jnp.bfloat16)
            cnt = jax.lax.dot_general(
                A, Bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            hist_ref[s] += cnt


@partial(jax.jit, static_argnames=("head", "D", "W", "nbin", "interpret"))
def ds_finalize_os_scan(cb, a, power, sum_u, nv, head, D, W, nbin=0,
                        interpret=None):
    """
    ds_finalize_os + fused pad-window masking + trigger-pyramid block
    maxima: returns (ds [S, m*W] with positions >= nv at -inf,
    pyr_max [S, (m*W)//128] per-128-sample block maxima,
    hist [S, nbin] float32 counts or None when nbin == 0).

    Saves three full sweeps over the [S, m*W] DS array per chunk on the
    scan path (the where-mask, the pyramid build, and the global max —
    maxds == pyr_max.max(-1)); with ``nbin`` the per-detector histogram
    (floor rule, right edge inclusive, out-of-range excluded) accumulates
    in the same VMEM pass instead of a separate counting-kernel launch.
    """
    interpret = _auto_interpret(interpret)
    SD, m, blk = cb.shape
    S = SD // D
    assert a.shape[0] == m * W and power.shape[0] == m * W
    assert head % 128 == 0 and W % 128 == 0 and (W // 128) <= 128
    st = os_finalize_tile_rows(S, D, blk)
    assert st > 0, "caller must check os_finalize_tile_rows first"
    g = int(round(nbin ** 0.5)) if nbin else 1
    if nbin:
        assert g * g == nbin, "nbin must be a perfect square"
    grid = (S // st, m)                 # m innermost for hist residency
    kern = partial(_finalize_os_scan_kernel, head=head, D=D, W=W, nbin=nbin)
    nv_arr = jnp.asarray(nv, jnp.int32).reshape(1, 1)
    kio = jnp.arange(g, dtype=jnp.float32)[:, None]
    ds, bmax, hist = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((st * D, blk), lambda j, i: (j, i),
                         memory_space=_VMEM),
            pl.BlockSpec((1, W), lambda j, i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, W), lambda j, i: (0, i), memory_space=_VMEM),
            pl.BlockSpec((st * D, 1), lambda j, i: (j, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((g, 1), lambda j, i: (0, 0), memory_space=_VMEM),
        ],
        out_specs=[
            pl.BlockSpec((st, W), lambda j, i: (j, i),
                         memory_space=_VMEM),
            pl.BlockSpec((st, 128), lambda j, i: (j, i),
                         memory_space=_VMEM),
            pl.BlockSpec((st, g, g), lambda j, i: (j, 0, 0),
                         memory_space=_VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((S, m * W), cb.dtype),
                   jax.ShapeDtypeStruct((S, m * 128), cb.dtype),
                   jax.ShapeDtypeStruct((S, g, g), jnp.float32)],
        interpret=interpret,
    )(cb.reshape(SD, m * blk), a[None, :], power[None, :],
      sum_u.reshape(SD, 1), nv_arr, kio)
    nb = W // 128
    pyr = bmax.reshape(S, m, 128)[:, :, :nb].reshape(S, m * nb)
    return ds, pyr, (hist.reshape(S, nbin) if nbin else None)


def _finalize_os_fold_kernel(cb_ref, a_ref, power_ref, sum_u_ref, nv_ref,
                             kio_ref, out_ref, bmax_ref, hist_ref, *,
                             head, D, W, nbin):
    """Fold-batch finalize: rows are (chunk, detector) pairs, so the
    window stats / nv arrive per ROW rather than per chunk. Emits the
    masked DS tile, the per-128-sample block maxima, and (nbin > 0) the
    uniform-bin histogram accumulated across the m OS blocks — one VMEM
    pass over data that previously took finalize + mask + pyramid + max +
    a separate counting-kernel launch."""
    i = pl.program_id(1)                # OS-block index (m innermost so
                                        # the hist accumulator block stays
                                        # VMEM-resident across blocks)
    cb = cb_ref[...]                    # [st*D, blk]
    x = cb[:, head:head + W]
    # stats arrive [st, W] (per-row) or [1, 1, W] (grouped, 3-D for tile
    # legality) — normalize both to 2-D
    a = a_ref[...].reshape(-1, W)
    power = power_ref[...].reshape(-1, W)
    su = sum_u_ref[...]                 # [st*D, 1]
    st = out_ref.shape[0]
    xr = x.reshape(st, D, W)
    y = xr - su.reshape(st, D, 1) * a.reshape(a.shape[0], 1, W)
    y2 = (y * y).sum(axis=1)            # [st, W]
    ds = y2 / power                     # power broadcasts over st rows
    pos = i * W + jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    nv = nv_ref[...].reshape(-1, 1)     # [st, 1] per-row / [1, 1] grouped
    ds = jnp.where(pos < nv, ds, -jnp.inf)
    out_ref[...] = ds
    nb = W // 128
    bm = ds.reshape(st, nb, 128).max(axis=-1)
    pad = jnp.full((st, 128 - nb), -jnp.inf, ds.dtype)
    bmax_ref[...] = jnp.concatenate([bm, pad], axis=1)
    if nbin:
        @pl.when(i == 0)
        def _init():
            hist_ref[...] = jnp.zeros_like(hist_ref)

        g = int(round(nbin ** 0.5))
        idx = jnp.floor(ds * nbin)
        idx = jnp.where(ds == 1.0, nbin - 1.0, idx)
        # out-of-range values (-inf pads, ds > 1) never match a bin index,
        # so no explicit validity mask is needed
        coarse = jnp.floor(idx * (1.0 / g))
        fine = idx - coarse * g
        kio = kio_ref[...]              # [g, 1]
        for s in range(st):             # static unroll
            A = (coarse[s:s + 1, :] == kio).astype(jnp.bfloat16)
            Bf = (fine[s:s + 1, :] == kio).astype(jnp.bfloat16)
            cnt = jax.lax.dot_general(
                A, Bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            hist_ref[s] += cnt


def fold_tile_rows(BS, D, blk):
    """(chunk, detector) rows per tile for ds_finalize_os_fold: the tile
    must be Mosaic-legal (row count a multiple of 8, or the whole array)
    and fit the VMEM budget. 0 = unsupported."""
    if BS * D * blk * 4 <= _FOLD_TILE_BUDGET:
        return BS
    st, best = 8, 0
    while st <= BS:
        if BS % st == 0 and st * D * blk * 4 <= _FOLD_TILE_BUDGET:
            best = st
        st *= 2
    return best


# fold-kernel cb tile budget: slightly above the plain OS finalize's —
# the fold path's tiles carry st*D rows and the hist accumulator, so keep
# headroom under the ~16 MB scoped-vmem limit
_FOLD_TILE_BUDGET = 3 * 1024 * 1024


@partial(jax.jit, static_argnames=("head", "D", "W", "nbin", "group",
                                   "interpret"))
def ds_finalize_os_fold(cb, a, power, sum_u, nv, head, D, W, nbin=0,
                        group=0, interpret=None):
    """
    Fold-batch variant of ds_finalize_os_scan: rows are (chunk, detector)
    pairs (BS = B*S of them), with per-row OR per-chunk window stats.

    Parameters
    ----------
    cb : [BS*D, m, blk] raw overlap-save irfft blocks
    a, power : rolling stats (padded past out_len):
        per-row mode (group=0): [BS, m*W]
        grouped mode (group=S): [BS//S, m*W] — one stats row per chunk,
        shared by that chunk's S consecutive detector rows (S must be a
        multiple of 8 so tiles never straddle chunks)
    sum_u : [BS*D] basis sums (masked slots 0)
    nv : int32 valid DS sample counts — [BS] per-row, or [BS//S] grouped
    head, D, W : aligned discard head, basis dim, block advance
    nbin : 0 = no histogram; else a perfect-square uniform bin count to
        accumulate per row inside the same pass (np.histogram floor rule,
        right edge inclusive, out-of-range excluded)

    Returns
    -------
    (ds [BS, m*W] with positions >= nv at -inf,
     pyr [BS, (m*W)//128] block maxima,
     hist [BS, nbin] float32 counts or None)
    """
    if interpret is None:
        # interpret-mode off-TPU so the fold path is testable on the CPU
        # CI backend (DETEX_TPU_PALLAS=1 there routes scans through here)
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:  # pragma: no cover
            interpret = True
    BSD, m, blk = cb.shape
    BS = BSD // D
    assert head % 128 == 0 and W % 128 == 0 and (W // 128) <= 128
    st = fold_tile_rows(BS, D, blk)
    assert st > 0, "caller must check fold_tile_rows first"
    if group:
        G = BS // group
        assert a.shape == (G, m * W) and power.shape == (G, m * W)
        assert group % 8 == 0 or group == BS, \
            "grouped stats need tiles that never straddle chunks"
        # tiles must not straddle chunks: st must DIVIDE group, but
        # fold_tile_rows returns a power of two while pad_rows rungs are
        # multiples of 8 (24, 48, 96, ...) — walk down to a divisor
        # (st=8 always divides; group % 8 == 0 above, and st | group
        # implies st | BS since BS = G * group)
        st = min(st, group)
        while st > 8 and group % st:
            st //= 2
        assert group % st == 0 and BS % st == 0
        tpc = group // st               # row tiles per chunk
        # 3-D layout so the (1, W) tile is Mosaic-legal for any G: the
        # block's last two dims (1, W) equal/divide the array's (1, m*W)
        a = a.reshape(G, 1, m * W)
        power = power.reshape(G, 1, m * W)
        a_shape, a_map = (1, 1, W), (lambda j, i: (j // tpc, 0, i))
        n_shape, n_map = (1, 1, 1), (lambda j, i: (j // tpc, 0, 0))
        nv_in = jnp.asarray(nv, jnp.int32).reshape(G, 1, 1)
    else:
        assert a.shape == (BS, m * W) and power.shape == (BS, m * W)
        a_shape, a_map = (st, W), (lambda j, i: (j, i))
        n_shape, n_map = (st, 1), (lambda j, i: (j, 0))
        nv_in = jnp.asarray(nv, jnp.int32).reshape(BS, 1)
    g = int(round(nbin ** 0.5)) if nbin else 1
    if nbin:
        assert g * g == nbin, "nbin must be a perfect square"
    grid = (BS // st, m)
    kern = partial(_finalize_os_fold_kernel, head=head, D=D, W=W, nbin=nbin)
    kio = jnp.arange(g, dtype=jnp.float32)[:, None]
    ds, bmax, hist = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((st * D, blk), lambda j, i: (j, i),
                         memory_space=_VMEM),
            pl.BlockSpec(a_shape, a_map, memory_space=_VMEM),
            pl.BlockSpec(a_shape, a_map, memory_space=_VMEM),
            pl.BlockSpec((st * D, 1), lambda j, i: (j, 0),
                         memory_space=_VMEM),
            pl.BlockSpec(n_shape, n_map, memory_space=_VMEM),
            pl.BlockSpec((g, 1), lambda j, i: (0, 0), memory_space=_VMEM),
        ],
        out_specs=[
            pl.BlockSpec((st, W), lambda j, i: (j, i), memory_space=_VMEM),
            pl.BlockSpec((st, 128), lambda j, i: (j, i),
                         memory_space=_VMEM),
            pl.BlockSpec((st, g, g), lambda j, i: (j, 0, 0),
                         memory_space=_VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((BS, m * W), cb.dtype),
                   jax.ShapeDtypeStruct((BS, m * 128), cb.dtype),
                   jax.ShapeDtypeStruct((BS, g, g), jnp.float32)],
        interpret=interpret,
    )(cb.reshape(BSD, m * blk), a, power,
      jnp.asarray(sum_u).reshape(BSD, 1), nv_in, kio)
    nb = W // 128
    pyr = bmax.reshape(BS, m, 128)[:, :, :nb].reshape(BS, m * nb)
    return ds, pyr, (hist.reshape(BS, nbin) if nbin else None)


# cb VMEM tile budget (bytes); configs whose smallest legal tile exceeds it
# fall back to the XLA finalize. Keep small: Mosaic stacks the in-kernel
# temporaries (sliced x, y, y^2, ds) on top of the double-buffered in/out
# tiles inside the 16 MB scoped-vmem limit (measured OOM at 6 MB tiles).
_OS_TILE_BUDGET = 2 * 1024 * 1024


def os_finalize_tile_rows(S, D, blk):
    """S-rows per tile for ds_finalize_os, honoring the TPU lowering rule
    (last two block dims divisible by (8, 128) or equal to the array dims)
    and the VMEM budget. 0 = unsupported (use the XLA path)."""
    if S * D * blk * 4 <= _OS_TILE_BUDGET:
        return S
    if S % 8:
        return 0
    st = 8
    while S % (st * 2) == 0 and st * 2 <= S and \
            (st * 2) * D * blk * 4 <= _OS_TILE_BUDGET:
        st *= 2
    return 0 if st * D * blk * 4 > _OS_TILE_BUDGET else st


@partial(jax.jit, static_argnames=("head", "D", "W", "interpret"))
def ds_finalize_os(cb, a, power, sum_u, head, D, W, interpret=None):
    """
    Fused DS finalize over RAW overlap-save irfft blocks.

    Instead of materializing the trimmed/reshaped correlation array
    (``cb[..., head:head+W].reshape(S, D, m*W)`` — an HBM-scale copy at
    large template counts), each grid step loads one OS block straight from
    the irfft output, discards its circularly-contaminated head in VMEM,
    and writes the DS tile. ``head`` and ``W`` must be lane-aligned
    (multiples of 128): the caller left-pads the signal so the discard
    head lands on a lane boundary (an unaligned in-kernel slice makes
    Mosaic lane-rotate every tile).

    Parameters
    ----------
    cb : [S*D, m, blk] irfft of the per-block cross-spectra (untrimmed)
    a : [m*W] rolling mean, zero-padded past the valid output length
    power : [m*W] rolling power, padded with 1.0
    sum_u : [S*D] basis-vector sums
    head, D : aligned discard-head length, basis dimension
    W : outputs consumed per OS block (the block advance)

    Returns
    -------
    ds [S, m*W]; the caller slices to the true output length.
    """
    interpret = _auto_interpret(interpret)
    SD, m, blk = cb.shape
    S = SD // D
    assert a.shape[0] == m * W and power.shape[0] == m * W
    st = os_finalize_tile_rows(S, D, blk)
    assert st > 0, "caller must check os_finalize_tile_rows/W first"
    grid = (m, S // st)
    assert head % 128 == 0 and W % 128 == 0
    kern = partial(_finalize_os_kernel, head=head, D=D, W=W)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((st * D, blk), lambda i, j: (j, i),
                         memory_space=_VMEM),
            pl.BlockSpec((1, W), lambda i, j: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, W), lambda i, j: (0, i), memory_space=_VMEM),
            pl.BlockSpec((st * D, 1), lambda i, j: (j, 0),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((st, W), lambda i, j: (j, i),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((S, m * W), cb.dtype),
        interpret=interpret,
    )(cb.reshape(SD, m * blk), a[None, :], power[None, :],
      sum_u.reshape(SD, 1))
    return out


# ---------------------------------------------------------------------------
# Fully fused spec -> DS kernel: channel cross-spectra FMA + HALF-SPECTRUM
# Cooley-Tukey inverse + DS finalize + pad mask + trigger pyramid +
# histogram, all in ONE VMEM pass.
#
# The unfused fold path materializes, per chunk launch, the complex
# cross-spectra [B,S,D,m,R], the hermitian extension [.,blk]x2 and the raw
# correlation blocks cb [B*S*D,m,blk] in HBM (~5 GB/chunk at S=1000 vs a
# ~25 ms/chunk theoretical floor — PERF.md). Here none of those exist: each
# grid cell FMAs the template spectra against the chunk spectra in VMEM,
# inverts via the half-spectrum CT decomposition (no hermitian extension;
# X[t] = (1/n)Re(sum_{k<=n/2} c_k Z[k] W^{kt}), c_0 = c_{n/2} = 1 else 2;
# the k=n/2 term is the rank-1 correction Re(Z[n/2])(-1)^t), and finalizes
# straight to the DS tile.
#
# Two row orderings share one kernel body:
#  - mode "net" (large banks, S % 8 == 0): rows are (chunk, template); a
#    tile's rows live in ONE chunk, so the chunk spectra and rolling stats
#    arrive as shared blocks; templates stream per tile.
#  - mode "sub" (small banks, B % 8 == 0): rows are (template, chunk); a
#    tile's rows live in ONE template, so its spectra are the shared block
#    and the chunk spectra/stats stream via index maps — no replication of
#    either side in HBM.
# ---------------------------------------------------------------------------


def _spec_ds_fold_kernel(ur_ref, ui_ref, fr_ref, fi_ref, a_ref, p_ref,
                         su_ref, nv_ref, kio_ref, w2p_ref,
                         twr_ref, twi_ref, w1p_ref,
                         *refs,
                         mode, nc, D, W, nbin, n1, n2, head, Rp, prec,
                         emit_ds=True, udtype="f32", ablate=frozenset()):
    """Grid (row_tiles, m, D) with the basis dim INNERMOST: each step
    runs one basis dim's FMA + half-spectrum CT chain (bounding the VMEM
    stack at ONE chain — a D-unrolled body measured 27-44 MB against the
    ~16 MB scoped limit, and Mosaic inlines lax.fori_loop bodies too).
    The DS output block doubles as the cross-d y^2 accumulator: its index
    map ignores d, so it stays VMEM-resident across the d sweep; the
    finalize (power divide, pad mask, pyramid, histogram) runs at
    d == D-1.

    The complex CT stages run as PACKED real dots (this backend's kernel
    cost is dominated by per-dot fixed latency, not FLOPs): stage 1 is
    ONE [st*n1, 2*n2h] @ w2p [2*n2h, 2*n2] dot emitting [ar | ai]
    (w2p = [[w2r, w2i], [-w2i, w2r]]) with a FULL 128-deep contraction
    instead of 4 half-depth dots; stage 2 is ONE
    [st*n2, 2*n1] @ w1p [2*n1, n1_kept] dot for the real part. w1p's
    columns are pre-trimmed to t1 >= head//n2: output times below the
    OS discard head are never computed.

    ``emit_ds=False`` (the engine's summary-only mode — it gates on
    maxima and re-verifies host-side, never reading the device DS): the
    cross-d accumulator is a VMEM SCRATCH block instead of the DS output,
    so the [BS, m*W] DS array — the launch's dominant HBM write at large
    banks — never exists; only pyr + hist leave the kernel.

    ``ablate`` (measurement ONLY — scripts/probe_kernel_anatomy.py):
    structural cost-bisection flags. Each replaces one op with a
    shape-identical cheap fabrication (WRONG values, producers kept
    live): noswap1 (rri transpose), nodot1 (stage-1 dot), noswapbb
    (bb transpose; requires n1 == n2), tail2 (stage-2 dot + x swap +
    Nyquist term), fma1 (single-channel FMA), nohist (histogram
    accumulate), histbf16 (bf16 coarse/fine/kio one-hot compares —
    count-identical, a vectorization experiment rather than an
    ablation). Never set on any production path."""
    if emit_ds:
        ds_ref, pyr_ref, hist_ref = refs
        acc_ref = ds_ref
    else:
        pyr_ref, hist_ref, acc_ref = refs      # acc = scratch [st, W]
    i = pl.program_id(1)
    d = pl.program_id(2)
    st = pyr_ref.shape[0]
    n = n1 * n2
    n2h = n2 // 2
    t1_0 = head // n2              # whole t1 columns below the head
    off = head - t1_0 * n2         # residual offset inside the kept cols
    dot = _kdot(prec)
    # ---- channel FMA for THIS basis dim -> spec [st, Rp] ----
    # U rows are per-tile in "net" ([st, ...]) and shared in "sub"
    # ([1, ...]); F is the mirror image — broadcasting unifies both.
    # U-spectra storage experiments (round-4 VERDICT #6, PERF.md):
    #   f32    — shipped default, [.., nc, Rp] float32
    #   bf16   — [.., nc, Rp] bfloat16, HALF the streamed-operand HBM
    #            traffic at ~3e-3 relative DS error
    #   bf16x2 — hi+lo split, [.., 2*nc, Rp] bfloat16 (channels c<nc are
    #            hi, nc+c the residual lo): ~f32 accuracy but the SAME
    #            bytes as f32 — hi/lo ride extra channel slots so the
    #            recombine is the proven static middle-index pattern,
    #            never a value slice that lowers to dynamic_slice
    uch = 2 * nc if udtype == "bf16x2" else nc
    ur = ur_ref[...].reshape(-1, uch, Rp)            # [st | 1, uch, Rp]
    ui = ui_ref[...].reshape(-1, uch, Rp)
    f3r = fr_ref[...].reshape(-1, nc, Rp)            # [1 | st, nc, Rp]
    f3i = fi_ref[...].reshape(-1, nc, Rp)
    sr = jnp.zeros((st, Rp), jnp.float32)
    si = jnp.zeros((st, Rp), jnp.float32)
    for c in range(1 if "fma1" in ablate else nc):
        if udtype == "bf16x2":
            ucr = (ur[:, c, :].astype(jnp.float32)
                   + ur[:, nc + c, :].astype(jnp.float32))
            uci = (ui[:, c, :].astype(jnp.float32)
                   + ui[:, nc + c, :].astype(jnp.float32))
        else:
            ucr = ur[:, c, :].astype(jnp.float32)
            uci = ui[:, c, :].astype(jnp.float32)
        fcr = f3r[:, c, :]
        fci = f3i[:, c, :]
        sr = sr + ucr * fcr - uci * fci
        si = si + ucr * fci + uci * fcr
    # c_k/n inverse weights are pre-folded into the template spectra
    # (ds.bank_spec_pair), so the FMA output IS the weighted Z
    zrd, zid = sr, si
    # ---- half-spectrum CT inverse -> x [st, n1_kept * n2] ----
    zhr = zrd[:, n // 2:n // 2 + 1]                  # Re(Z[n/2]), c=1
    # pack (re, im) on the k2 axis BEFORE the transpose: one sublane
    # concat + ONE transpose feeds the packed stage-1 dot directly
    zz = jnp.concatenate([zrd[:, :n // 2].reshape(st, n2h, n1),
                          zid[:, :n // 2].reshape(st, n2h, n1)], axis=1)
    if "noswap1" in ablate:
        rri = zz.reshape(st * n1, 2 * n2h)
    else:
        rri = jnp.swapaxes(zz, 1, 2).reshape(st * n1, 2 * n2h)
    if "nodot1" in ablate:
        ap2 = jnp.concatenate([rri, rri], axis=1)    # [st*n1, 2*n2]
    else:
        ap2 = dot(rri, w2p_ref[...])                 # [st*k1, ar|ai]
    ar3 = ap2[:, :n2].reshape(st, n1, n2)
    ai3 = ap2[:, n2:].reshape(st, n1, n2)
    twr = twr_ref[...]
    twi = twi_ref[...]
    br = ar3 * twr - ai3 * twi
    bi = ar3 * twi + ai3 * twr
    if "noswapbb" in ablate:
        assert n1 == n2, "noswapbb ablation requires n1 == n2"
        bb = jnp.concatenate([br, bi], axis=2)
    else:
        bb = jnp.swapaxes(jnp.concatenate([br, bi], axis=1), 1, 2)
    n1k = n1 - t1_0
    if "tail2" in ablate:
        x = bb.reshape(st, n2 * 2 * n1)[:, :n1k * n2]
    else:
        xr = dot(bb.reshape(st * n2, 2 * n1), w1p_ref[...])  # [st*t2, t1k]
        x3 = xr.reshape(st, n2, n1k)
        t2i = jax.lax.broadcasted_iota(jnp.int32, (1, n2, 1), 1)
        alt = jnp.where(t2i % 2 == 0, 1.0, -1.0)
        x3 = x3 + zhr.reshape(st, 1, 1) * alt
        x = jnp.swapaxes(x3, 1, 2).reshape(st, n1k * n2)
    # ---- accumulate y^2 into the resident DS block ----
    a = a_ref[...].reshape(-1, W)
    su = su_ref[...].reshape(-1, 1)                  # [st | 1, 1]
    y = x[:, off:off + W] - su * a
    yy = y * y

    @pl.when(d == 0)
    def _first():
        acc_ref[...] = yy

    @pl.when(d > 0)
    def _accum():
        acc_ref[...] += yy

    # ---- finalize on the last basis dim ----
    @pl.when(d == D - 1)
    def _finalize():
        power = p_ref[...].reshape(-1, W)
        ds = acc_ref[...] / power
        pos = i * W + jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        nv = nv_ref[...].reshape(-1, 1)
        ds = jnp.where(pos < nv, ds, -jnp.inf)
        if emit_ds:
            ds_ref[...] = ds
        nb = W // 128
        bm = ds.reshape(st, nb, 128).max(axis=-1)
        pad = jnp.full((st, 128 - nb), -jnp.inf, ds.dtype)
        pyr_ref[...] = jnp.concatenate([bm, pad], axis=1)
        if nbin:
            @pl.when(i == 0)
            def _init():
                hist_ref[...] = jnp.zeros_like(hist_ref)

            if "nohist" in ablate:
                return
            g = int(round(nbin ** 0.5))
            idx = jnp.floor(ds * nbin)
            idx = jnp.where(ds == 1.0, nbin - 1.0, idx)
            coarse = jnp.floor(idx * (1.0 / g))
            fine = idx - coarse * g
            kio = kio_ref[...]
            if "histbf16" in ablate:
                # EXACT-count experiment: coarse/fine/kio are small
                # integers (< g <= 20), exact in bf16, and equality
                # compares of exact values are exact — same counts, but
                # the [g, W] one-hot builds (the finalize's dominant VPU
                # work) may vectorize 2x in bf16
                coarse = coarse.astype(jnp.bfloat16)
                fine = fine.astype(jnp.bfloat16)
                kio = kio.astype(jnp.bfloat16)
            # bf16 one-hot operands: 0/1 are exact in bf16 and the f32
            # accumulator keeps the counts exact, but the dot runs as ONE
            # MXU pass instead of the multi-pass f32 emulation
            if HIST_BATCH:
                # experimental: ONE [st*g, W] x [W, st*g] dot for all tile
                # rows (1/st the dot issues; cross-row blocks are wasted
                # FLOPs) + static diagonal-block extraction. Identical
                # counts; A/B via DETEX_TPU_HIST_BATCH on device.
                rep = lambda x: jnp.broadcast_to(          # noqa: E731
                    x.reshape(st, 1, W), (st, g, W)).reshape(st * g, W)
                ki = jax.lax.broadcasted_iota(jnp.float32, (st * g, 1), 0)
                kim = ki - jnp.floor(ki * (1.0 / g)) * g   # row's bin id
                A = (rep(coarse) == kim).astype(jnp.bfloat16)
                Bf = (rep(fine) == kim).astype(jnp.bfloat16)
                cnt = jax.lax.dot_general(
                    A, Bf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for s in range(st):
                    hist_ref[s] += cnt[s * g:(s + 1) * g,
                                       s * g:(s + 1) * g]
            else:
                for s in range(st):
                    A = (coarse[s:s + 1, :] == kio).astype(jnp.bfloat16)
                    Bf = (fine[s:s + 1, :] == kio).astype(jnp.bfloat16)
                    cnt = jax.lax.dot_general(
                        A, Bf, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    hist_ref[s] += cnt


# rows per tile (chunks x templates; basis dims ride the innermost grid
# axis). Env-overridable for on-device sweeps: bigger tiles mean larger
# matmul M dims and fewer per-cell fixed costs, but the U spectra tile
# (st * nc * Rp * 4 B * 2, double-buffered) grows into the ~16 MB VMEM.
SPEC_DS_ST = _env_tile_rows("DETEX_TPU_SPECDS_ST")


def spec_udtype():
    """U-spectra storage dtype for the fused kernel (round-4 VERDICT #6
    experiment, PERF.md round 4): DETEX_TPU_SPEC_UDTYPE in
    {f32 (default), bf16, bf16x2}. bf16 halves the streamed template-
    spectra HBM traffic at ~3e-3 relative DS error; bf16x2 (hi+lo split)
    keeps ~f32 accuracy but occupies the SAME bytes as f32 — it cannot
    reduce traffic by construction, it exists to measure that claim."""
    v = os.environ.get("DETEX_TPU_SPEC_UDTYPE", "f32")
    return v if v in ("f32", "bf16", "bf16x2") else "f32"


def spec_ds_supported(mode, B, S, D, nc, n_c, blk):
    """True when spec_ds_fold can run this config."""
    pad0 = (-(n_c - 1)) % 128
    W = blk - (n_c - 1 + pad0)
    if W < 128 or W % 128 or (W // 128) > 128:
        return False
    b = int(blk).bit_length() - 1
    if (1 << b) != blk:
        return False
    n1 = 1 << (b // 2)
    if n1 != 128:
        return False
    st = SPEC_DS_ST
    # VMEM-fit guard: the packed CT chain allocates ~11 blk-wide f32
    # temporaries per tile row plus the (double-buffered) streamed-side
    # spectra tile; beyond ~14 MB the Mosaic compile runs away (>25 min,
    # never errors — measured at st=16, PERF.md round 3c), so refuse and
    # let the caller fall back to the unfused fold path.
    # DETEX_TPU_SPECDS_VMEM_MB overrides the bound for on-device sweeps
    # (pair with a timeout: past it the compile hangs, it doesn't fail).
    vmem_mb = float(os.environ.get("DETEX_TPU_SPECDS_VMEM_MB", "14"))
    Rp = (n1 // 2 + 1) * (blk // n1)
    # (re, im) double-buffered; bytes/element by U-spectra storage dtype
    # (bf16x2 carries hi+lo in twice the channels -> same bytes as f32)
    ub = {"f32": 4, "bf16": 2, "bf16x2": 4}[spec_udtype()]
    stream_bytes = st * nc * Rp * ub * 2 * 2
    if st * blk * 4 * 11 + stream_bytes > vmem_mb * 1024 * 1024:
        return False
    if mode == "net":
        return S % st == 0
    return B % st == 0


@partial(jax.jit, static_argnames=("mode", "nc", "D", "W", "head", "blk",
                                   "nbin", "emit_ds", "udtype",
                                   "interpret", "ablate"))
def spec_ds_fold(ur, ui, fr, fi, a, power, sum_u, nv, mode, nc, D, W, head,
                 blk, nbin=0, emit_ds=True, udtype="f32", interpret=None,
                 ablate=""):
    """
    One-pass spec->DS scan. Replaces cross-spectra einsum + hermitian
    extension + irfft + ds_finalize_os_fold for overlap-save banks.

    ``emit_ds=False`` returns (None, pyr, hist): the DS array never
    reaches HBM (VMEM-scratch accumulator) — the engine's summary-only
    scan, which gates on maxima and re-verifies triggered chunks
    host-side (detect._materializeOne).

    Parameters (Rp = (n1//2+1)*n2 = blk//2 + n2 padded spectrum width;
    spectra arrive as float32 (real, imag) pairs — bins in (blk//2, Rp)
    are mirror-frequency values from the forward transform's natural
    layout and are ignored):

    mode "net" — rows (chunk, template), S % 8 == 0:
      ur, ui : [D, S, nc*Rp] basis-dim-major template spectra
      fr, fi : [B*nc, m*Rp] chunk block spectra
      a, power : [B, m*W] per-chunk rolling stats (padded past out_len)
      sum_u : [D, S] basis sums (masked slots 0), basis-dim-major
      nv : [B] int32 valid DS lengths
      returns ds [B*S, m*W], pyr [B*S, m*(W//128)], hist [B*S, nbin]|None

    mode "sub" — rows (template, chunk), B % 8 == 0:
      same arrays; returns ds [S*B, m*W] (rows (s, b)), pyr, hist likewise
    """
    interpret = _auto_interpret(interpret)
    from detex_tpu.ops import dft as _dft
    n1, n2 = _dft._split(blk)
    Rp = (n1 // 2 + 1) * n2
    (w2hr, w2hi), (twr, twi), (w1r, w1i) = _dft._ct_mats_half(blk, True)
    # packed complex-as-real CT matrices (see _spec_ds_fold_kernel):
    # stage 1 [[w2r, w2i], [-w2i, w2r]]; stage 2 real part [[w1r],[-w1i]]
    # with the columns below the OS discard head pre-trimmed
    w2p = np.block([[w2hr, w2hi], [-w2hi, w2hr]])
    t1_0 = head // n2
    w1p = np.concatenate([w1r.T, -w1i.T], axis=0)[:, t1_0:]
    prec = _dft._precision_mosaic()
    st = SPEC_DS_ST
    B = nv.shape[0]
    m = fr.shape[1] // Rp
    D_, S = sum_u.shape
    assert D_ == D and ur.shape[:2] == (D, S)
    # Mosaic's tile law: a block's last two dims must be multiples of
    # (8, 128) or equal the array dims — small/shared operands therefore
    # ride 3-D layouts whose trailing dims exactly match the array
    # (leading dims are unconstrained), same trick as ds_finalize_os_fold.
    f_in = (fr.reshape(B, nc, m * Rp), fi.reshape(B, nc, m * Rp))
    # U-spectra trailing width: nc*Rp (f32/bf16) or 2*nc*Rp (bf16x2
    # hi+lo channel slots — see _spec_ds_fold_kernel)
    ucols = (2 * nc if udtype == "bf16x2" else nc) * Rp
    assert ur.shape[-1] * np.prod(ur.shape[:-1]) == D * S * ucols
    # U/su ride 4-D layouts with a unit axis so the block's trailing two
    # dims exactly equal the array's even for a single-template block
    u_in = (ur.reshape(D, S, 1, ucols), ui.reshape(D, S, 1, ucols))
    su_in = sum_u.reshape(D, S, 1, 1)
    if mode == "net":
        assert S % st == 0
        BS = B * S
        spt = S // st                   # template tiles per chunk
        u_shape = (1, st, 1, ucols)
        u_map = lambda j, i, d: (d, j % spt, 0, 0)     # noqa: E731
        f_shape = (1, nc, Rp)
        f_map = lambda j, i, d: (j // spt, 0, i)       # noqa: E731
        s_shape = (1, 1, W)
        s_map = lambda j, i, d: (j // spt, 0, i)       # noqa: E731
        su_shape = (1, st, 1, 1)
        su_map = lambda j, i, d: (d, j % spt, 0, 0)    # noqa: E731
        n_shape = (1, 1, 1)
        n_map = lambda j, i, d: (j // spt, 0, 0)       # noqa: E731
    else:
        BS = S * B
        assert B % st == 0
        nt = B // st                    # chunk tiles per template
        u_shape = (1, 1, 1, ucols)
        u_map = lambda j, i, d: (d, j // nt, 0, 0)     # noqa: E731
        f_shape = (st, nc, Rp)
        f_map = lambda j, i, d: (j % nt, 0, i)         # noqa: E731
        s_shape = (st, 1, W)
        s_map = lambda j, i, d: (j % nt, 0, i)         # noqa: E731
        su_shape = (1, 1, 1, 1)
        su_map = lambda j, i, d: (d, j // nt, 0, 0)    # noqa: E731
        n_shape = (st, 1, 1)
        n_map = lambda j, i, d: (j % nt, 0, 0)         # noqa: E731
    g = int(round(nbin ** 0.5)) if nbin else 1
    if nbin:
        assert g * g == nbin, "nbin must be a perfect square"
    ab = frozenset(v for v in ablate.split(",") if v)
    _check_ablate(ab, _SPEC_DS_ABLATIONS)
    kern = partial(_spec_ds_fold_kernel, mode=mode, nc=nc, D=D, W=W,
                   nbin=nbin, n1=n1, n2=n2, head=head, Rp=Rp, prec=prec,
                   emit_ds=emit_ds, udtype=udtype, ablate=ab)
    kio = jnp.arange(g, dtype=jnp.float32)[:, None]
    const = lambda j, i, d: (0, 0)                     # noqa: E731
    cspec = [pl.BlockSpec(w2p.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twr.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twi.shape, const, memory_space=_VMEM),
             pl.BlockSpec(w1p.shape, const, memory_space=_VMEM)]
    grid = (BS // st, m, D)
    out_specs = [
        pl.BlockSpec((st, 128), lambda j, i, d: (j, i),
                     memory_space=_VMEM),
        pl.BlockSpec((st, g, g), lambda j, i, d: (j, 0, 0),
                     memory_space=_VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((BS, m * 128), jnp.float32),
                 jax.ShapeDtypeStruct((BS, g, g), jnp.float32)]
    scratch = []
    if emit_ds:
        out_specs.insert(0, pl.BlockSpec((st, W), lambda j, i, d: (j, i),
                                         memory_space=_VMEM))
        out_shape.insert(0, jax.ShapeDtypeStruct((BS, m * W), jnp.float32))
    else:
        assert pltpu is not None, "summary-only mode needs pallas tpu"
        scratch = [pltpu.VMEM((st, W), jnp.float32)]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(u_shape, u_map, memory_space=_VMEM),
            pl.BlockSpec(u_shape, u_map, memory_space=_VMEM),
            pl.BlockSpec(f_shape, f_map, memory_space=_VMEM),
            pl.BlockSpec(f_shape, f_map, memory_space=_VMEM),
            pl.BlockSpec(s_shape, s_map, memory_space=_VMEM),
            pl.BlockSpec(s_shape, s_map, memory_space=_VMEM),
            pl.BlockSpec(su_shape, su_map, memory_space=_VMEM),
            pl.BlockSpec(n_shape, n_map, memory_space=_VMEM),
            pl.BlockSpec((g, 1), lambda j, i, d: (0, 0),
                         memory_space=_VMEM),
        ] + cspec,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(u_in[0], u_in[1], f_in[0], f_in[1],
      a.reshape(B, 1, m * W), power.reshape(B, 1, m * W), su_in,
      jnp.asarray(nv, jnp.int32).reshape(B, 1, 1), kio,
      jnp.asarray(np.ascontiguousarray(w2p)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(np.ascontiguousarray(w1p)))
    ds, bmax, hist = (outs if emit_ds else (None,) + tuple(outs))
    nb = W // 128
    pyr = bmax.reshape(BS, m, 128)[:, :, :nb].reshape(BS, m * nb)
    return ds, pyr, (hist.reshape(BS, nbin) if nbin else None)


def _rfft_ct_half_kernel(x_ref, w2p_ref, twr_ref, twi_ref,
                         w1pr_ref, w1pi_ref, or_ref, oi_ref, *,
                         n1, n2, prec):
    """Forward CT transform of REAL input emitting only the rfft half:
    stage 2 contracts with W1h^T [n1, n1h] (n1h = n1//2 + 1), so both the
    matmul work and the output writes halve vs _rfft_ct_kernel. Output
    layout [st, n1h*n2] is exactly rfft order (k = n2*t1 + t2); bins past
    n//2 are mirror-frequency values (callers treat them as inert).

    Dots run PACKED (per-dot fixed latency dominates on this backend):
    stage 1 is ONE dot against [w2r | w2i] emitting [ar | ai]; stage 2 is
    TWO dots of the packed [br | bi] against [[w1hrt], [-w1hit]] and
    [[w1hit], [w1hrt]] (the n1h = 65 output width is lane-misaligned, so
    xr/xi stay separate dots instead of a packed output needing a
    misaligned split). 6 dots -> 3, all with full 128+ contractions."""
    st = or_ref.shape[0]
    n1h = n1 // 2 + 1
    dot = _kdot(prec)
    x = x_ref[...].reshape(st, n2, n1)
    x = jnp.swapaxes(x, 1, 2).reshape(st * n1, n2)     # [st*k1, k2]
    aa = dot(x, w2p_ref[...])                          # [st*k1, ar|ai]
    twr = twr_ref[...]
    twi = twi_ref[...]
    ar3 = aa[:, :n2].reshape(st, n1, n2)
    ai3 = aa[:, n2:].reshape(st, n1, n2)
    br = ar3 * twr - ai3 * twi
    bi = ar3 * twi + ai3 * twr
    bb = jnp.swapaxes(jnp.concatenate([br, bi], axis=1), 1, 2)
    bb = bb.reshape(st * n2, 2 * n1)                   # [st*t2, br|bi]
    xr = dot(bb, w1pr_ref[...])                        # [st*t2, t1h]
    xi = dot(bb, w1pi_ref[...])
    xr = jnp.swapaxes(xr.reshape(st, n2, n1h), 1, 2)   # [st, t1h, t2]
    xi = jnp.swapaxes(xi.reshape(st, n2, n1h), 1, 2)
    or_ref[...] = xr.reshape(st, n1h * n2)
    oi_ref[...] = xi.reshape(st, n1h * n2)


@partial(jax.jit, static_argnames=("n", "interpret"))
def rfft_ct_half(x, n, interpret=None):
    """Fused matmul forward DFT of real x [N, n] emitting the padded half
    spectrum (fr, fi) [N, Rp], Rp = (n1//2+1)*n2 == dft.half_rp(n):
    fr[:, :n//2+1] + i*fi[:, :n//2+1] == rfft(x, n). Requires n1 == 128."""
    interpret = _auto_interpret(interpret)
    from detex_tpu.ops import dft as _dft
    n1, n2 = _dft._split(n)
    assert n1 == 128, "fused CT kernel requires n1 == 128"
    n1h = n1 // 2 + 1
    Rp = n1h * n2
    (w2r, w2i), (twr, twi), (w1hr, w1hi) = _dft._ct_mats_half(n, False)
    prec = _dft._precision_mosaic()
    # packed stage matrices (see _rfft_ct_half_kernel)
    w2p = np.concatenate([w2r, w2i], axis=1)
    w1pr = np.concatenate([w1hr.T, -w1hi.T], axis=0)
    w1pi = np.concatenate([w1hi.T, w1hr.T], axis=0)
    N = x.shape[0]
    st = CT_ST
    Np = (N + st - 1) // st * st
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
    const = lambda j: (0, 0)                              # noqa: E731
    cspec = [pl.BlockSpec(w2p.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twr.shape, const, memory_space=_VMEM),
             pl.BlockSpec(twi.shape, const, memory_space=_VMEM),
             pl.BlockSpec(w1pr.shape, const, memory_space=_VMEM),
             pl.BlockSpec(w1pi.shape, const, memory_space=_VMEM)]
    fr, fi = pl.pallas_call(
        partial(_rfft_ct_half_kernel, n1=n1, n2=n2, prec=prec),
        grid=(Np // st,),
        in_specs=[pl.BlockSpec((st, n), lambda j: (j, 0),
                               memory_space=_VMEM)] + cspec,
        out_specs=[pl.BlockSpec((st, Rp), lambda j: (j, 0),
                                memory_space=_VMEM),
                   pl.BlockSpec((st, Rp), lambda j: (j, 0),
                                memory_space=_VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Np, Rp), jnp.float32),
                   jax.ShapeDtypeStruct((Np, Rp), jnp.float32)],
        interpret=interpret,
    )(x, jnp.asarray(np.ascontiguousarray(w2p)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(np.ascontiguousarray(w1pr)),
      jnp.asarray(np.ascontiguousarray(w1pi)))
    return fr[:N], fi[:N]


# frames per tile for the fused forward-prep kernel (framing + forward CT
# + window stats in one VMEM pass). Bigger tiles amortize per-grid-cell
# latency; VMEM grows ~linearly (fwd_prep_supported bounds it).
PREP_STF = max(1, int(os.environ.get("DETEX_TPU_PREP_STF", "4")))


# known ablation tokens per kernel: a typo'd token would otherwise time
# identically to base and read as "op share ~0%" — a silent wrong
# bisection (round-4 ADVICE)
_SPEC_DS_ABLATIONS = frozenset(["noswap1", "nodot1", "noswapbb", "tail2",
                                "fma1", "nohist", "histbf16"])
_FWD_PREP_ABLATIONS = frozenset(["pnoswapin", "pnodot1", "pnoswapbb",
                                 "ptail2", "pnostats"])


def _check_ablate(ab, known):
    unknown = ab - known
    if unknown:
        raise ValueError("unknown ablate token(s) %s; known: %s"
                         % (sorted(unknown), sorted(known)))


def _fwd_prep_fold_kernel(*refs, nc, stf, n1, n2, W, D0, pad0, n_win,
                          out_len, prec, ablate=frozenset()):
    """Grid (B, mt): one cell turns (stf+1) W-wide slices of one chunk's
    demuxed standardized rows into stf overlap-save blocks' half spectra
    AND their window stats — the framed [B, nc, m, blk] array, the
    full-length prefix sums and the window-sum arrays (each a multi-GB
    HBM round-trip in the XLA formulation; the rolling-stats piece alone
    measured 109 ms of the 163 ms prep at B=128 x 2 h, round-4 profile)
    never exist.

    Refs: xq x (stf+1) aliases (1, nc, W) at block offsets jt*stf+q,
    CT mats (w2p, twr, twi, w1pr, w1pi — rfft_ct_half packing), tri
    [128, 128] inclusive-prefix upper-triangular, triL [blk/128, blk/128]
    likewise; outs Fr/Fi (1, nc, stf*Rp), a/power (1, 1, stf*W).

    Window stats are FRAME-local: output o of frame f needs xp samples
    [o + pad0, o + pad0 + n_win), and frame f spans exactly [f*W,
    f*W + blk) ⊇ that — prefix sums over the framed (nc*stf, blk) rows
    (already built for the transforms) replace the million-sample global
    cumsum (and its f32 mean-centering crutch: frame sums are O(1e4)
    samples, well inside f32 at the bf16x3 dot precision).

    ``ablate`` (measurement ONLY — scripts/probe_kernel_anatomy.py, same
    contract as _spec_ds_fold_kernel: shape-identical cheap fabrications,
    WRONG values): pnoswapin (input transpose), pnodot1 (stage-1 dot),
    pnoswapbb (bb transpose; requires n1 == n2), ptail2 (stage-2 dots +
    output swaps), pnostats (the whole window-stats block)."""
    xs = refs[:stf + 1]
    (w2p_ref, twr_ref, twi_ref, w1pr_ref, w1pi_ref, tri_ref, triL_ref,
     or_ref, oi_ref, a_ref, p_ref) = refs[stf + 1:]
    jt = pl.program_id(1)
    blk = n1 * n2
    n1h = n1 // 2 + 1
    Rp = n1h * n2
    SW = stf * W
    dot = _kdot(prec)

    # ref[...] then reshape — integer ref indexing lowers to an
    # unimplemented dynamic_slice in Mosaic
    xt = jnp.concatenate([x[...].reshape(nc, W) for x in xs],
                         axis=-1)                         # [nc, Lt]

    # ---- framed rows (c, f) — shared by the transforms and the stats;
    # (c, f) order means Fr reshapes straight to the spec_ds layout ----
    xf = jnp.stack([xt[:, f * W:f * W + blk] for f in range(stf)],
                   axis=1).reshape(nc * stf, blk)
    R = nc * stf
    blk_ = n1 * n2
    if "pnoswapin" in ablate:                     # ablation: see docstring
        x2 = xf.reshape(R * n1, n2)
    else:
        x2 = jnp.swapaxes(xf.reshape(R, n2, n1), 1, 2).reshape(R * n1, n2)
    if "pnodot1" in ablate:
        aa = jnp.concatenate([x2, x2], axis=1)            # [R*n1, 2*n2]
    else:
        aa = dot(x2, w2p_ref[...])                        # [R*k1, ar|ai]
    twr = twr_ref[...]
    twi = twi_ref[...]
    ar3 = aa[:, :n2].reshape(R, n1, n2)
    ai3 = aa[:, n2:].reshape(R, n1, n2)
    br = ar3 * twr - ai3 * twi
    bi = ar3 * twi + ai3 * twr
    if "pnoswapbb" in ablate:
        assert n1 == n2, "pnoswapbb ablation requires n1 == n2"
        bb = jnp.concatenate([br, bi], axis=2)
    else:
        bb = jnp.swapaxes(jnp.concatenate([br, bi], axis=1), 1, 2)
    bb = bb.reshape(R * n2, 2 * n1)                       # [R*t2, br|bi]
    if "ptail2" in ablate:
        bf = bb.reshape(1, nc, stf * n2 * 2 * n1)
        or_ref[...] = bf[:, :, :stf * Rp]
        oi_ref[...] = bf[:, :, :stf * Rp]
    else:
        xr = dot(bb, w1pr_ref[...])                       # [R*t2, t1h]
        xi = dot(bb, w1pi_ref[...])
        xr = jnp.swapaxes(xr.reshape(R, n2, n1h), 1, 2)   # [R, t1h, t2]
        xi = jnp.swapaxes(xi.reshape(R, n2, n1h), 1, 2)
        or_ref[...] = xr.reshape(1, nc, stf * Rp)
        oi_ref[...] = xi.reshape(1, nc, stf * Rp)

    if "pnostats" in ablate:
        xfl = xf.reshape(1, 1, R * blk_)
        a_ref[...] = xfl[:, :, :SW]
        p_ref[...] = xfl[:, :, :SW]
        return

    # ---- window stats from frame-local prefix sums ----
    # (defensive Mosaic formulations: tile totals via a minor-axis
    # reduction — a [:, :, -1] extract lowers to an unimplemented
    # dynamic_slice — and the channel sum via static row slices)
    LT = blk // 128
    both = jnp.concatenate([xf, xf * xf], axis=0)         # [2R, blk]
    intra = dot(both.reshape(2 * R * LT, 128), tri_ref[...])
    totals = both.reshape(2 * R, LT, 128).sum(axis=-1)    # [2R, LT]
    off = dot(totals, triL_ref[...]) - totals             # exclusive
    C = (intra.reshape(2 * R, LT, 128) +
         off[:, :, None]).reshape(2 * R, blk)
    hi = C[:, D0:D0 + W]                                  # [2R, W]
    if pad0 == 0:
        lo = jnp.concatenate(
            [jnp.zeros((2 * R, 1), C.dtype), C[:, :W - 1]], axis=-1)
    else:
        lo = C[:, pad0 - 1:pad0 - 1 + W]
    hs = hi - lo                                          # window sums
    s1 = hs[0 * stf:1 * stf]                              # [stf, W]
    s2 = hs[R + 0 * stf:R + 1 * stf]
    for c in range(1, nc):
        s1 = s1 + hs[c * stf:(c + 1) * stf]
        s2 = s2 + hs[R + c * stf:R + (c + 1) * stf]
    s1 = s1.reshape(1, SW)
    s2 = s2.reshape(1, SW)
    a = s1 * (1.0 / n_win)
    var = (s2 - s1 * s1 * (1.0 / n_win)) * (1.0 / (n_win - 1.0))
    power = jnp.maximum(var, 0.0) * n_win
    power = jnp.where(power == 0, jnp.inf, power)         # powsafe folded
    pos = jt * SW + jax.lax.broadcasted_iota(jnp.int32, (1, SW), 1)
    valid = pos < out_len
    a_ref[...] = jnp.where(valid, a, 0.0).reshape(1, 1, SW)
    p_ref[...] = jnp.where(valid, power, 1.0).reshape(1, 1, SW)


def fwd_prep_supported(nc, n_c, blk, stf=None):
    """True when fwd_prep_fold can run this geometry within VMEM."""
    stf = PREP_STF if stf is None else stf
    b = int(blk).bit_length() - 1
    if (1 << b) != blk or (1 << (b // 2)) != 128:
        return False
    pad0 = (-(n_c - 1)) % 128
    W = blk - (n_c - 1 + pad0)
    if W < 128 or W % 128:
        return False
    if n_c > W:     # stats window must be frame-local
        return False
    # VMEM bound (f32 elements x4B): double-buffered input blocks + the
    # tile + framed rows + the deeper of the CT-chain and stats live sets
    # (~6 blk-wide rows per framed row each; they don't overlap) + triL.
    # 13 MB keeps clear of the ~16 MB VMEM and of Mosaic's runaway-compile
    # regime (PERF.md round 3c).
    Lt = (stf + 1) * W
    R = nc * stf
    est = (2 * (stf + 1) * nc * W + nc * Lt + 6 * R * blk +
           (blk // 128) ** 2) * 4
    return est <= 13 * 1024 * 1024


@partial(jax.jit, static_argnames=("nc", "n_c", "blk", "stf", "out_len",
                                   "interpret", "ablate"))
def fwd_prep_fold(xq, nc, n_c, blk, stf, out_len, interpret=None,
                  ablate=""):
    """Fused overlap-save forward prep: demuxed standardized chunks
    xq [B, nc, Lp] (pad0 left zeros, zeros past the data) ->
    (Fr, Fi [B*nc, m'*Rp], a, power [B, m'*W]) where m' = ceil(m/stf)*stf
    padded frames (garbage DS positions there are >= out_len and the
    spec_ds kernel masks everything >= nv). a/power arrive PRE-PADDED
    (a=0, power=1 past out_len) and power-safe'd (0 -> inf), so
    os_scan_batch_fused skips its pad/powsafe pass.

    Lp must equal (m'+1) * W (callers pad; the +1 covers the last
    frame's D0-sample overlap read)."""
    interpret = _auto_interpret(interpret)
    from detex_tpu.ops import dft as _dft
    n1, n2 = _dft._split(blk)
    assert n1 == 128, "fused prep requires n1 == 128"
    n1h = n1 // 2 + 1
    Rp = n1h * n2
    pad0 = (-(n_c - 1)) % 128
    D0 = n_c - 1 + pad0
    W = blk - D0
    B, nc_, Lp = xq.shape
    assert nc_ == nc
    SW = stf * W
    assert (Lp - W) % SW == 0, (Lp, W, stf)
    mt = (Lp - W) // SW
    (w2r, w2i), (twr, twi), (w1hr, w1hi) = _dft._ct_mats_half(blk, False)
    prec = _dft._precision_mosaic()
    w2p = np.concatenate([w2r, w2i], axis=1)
    w1pr = np.concatenate([w1hr.T, -w1hi.T], axis=0)
    w1pi = np.concatenate([w1hi.T, w1hr.T], axis=0)
    tri = np.triu(np.ones((128, 128), np.float32))
    triL = np.triu(np.ones((blk // 128, blk // 128), np.float32))
    ab = frozenset(v for v in ablate.split(",") if v)
    _check_ablate(ab, _FWD_PREP_ABLATIONS)
    kern = partial(_fwd_prep_fold_kernel, nc=nc, stf=stf, n1=n1, n2=n2,
                   W=W, D0=D0, pad0=pad0, n_win=n_c * nc,
                   out_len=out_len, prec=prec, ablate=ab)

    def xmap(q):
        return lambda b, jt: (b, 0, jt * stf + q)

    const = lambda b, jt: (0, 0)                          # noqa: E731
    in_specs = ([pl.BlockSpec((1, nc, W), xmap(q), memory_space=_VMEM)
                 for q in range(stf + 1)] +
                [pl.BlockSpec(w2p.shape, const, memory_space=_VMEM),
                 pl.BlockSpec(twr.shape, const, memory_space=_VMEM),
                 pl.BlockSpec(twi.shape, const, memory_space=_VMEM),
                 pl.BlockSpec(w1pr.shape, const, memory_space=_VMEM),
                 pl.BlockSpec(w1pi.shape, const, memory_space=_VMEM),
                 pl.BlockSpec(tri.shape, const, memory_space=_VMEM),
                 pl.BlockSpec(triL.shape, const, memory_space=_VMEM)])
    fr, fi, a, power = pl.pallas_call(
        kern,
        grid=(B, mt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, nc, stf * Rp), lambda b, jt: (b, 0, jt),
                         memory_space=_VMEM),
            pl.BlockSpec((1, nc, stf * Rp), lambda b, jt: (b, 0, jt),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, SW), lambda b, jt: (b, 0, jt),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, SW), lambda b, jt: (b, 0, jt),
                         memory_space=_VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nc, mt * stf * Rp), jnp.float32),
            jax.ShapeDtypeStruct((B, nc, mt * stf * Rp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, mt * SW), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, mt * SW), jnp.float32),
        ],
        interpret=interpret,
    )(*([xq] * (stf + 1)),
      jnp.asarray(np.ascontiguousarray(w2p)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(np.ascontiguousarray(w1pr)),
      jnp.asarray(np.ascontiguousarray(w1pi)), jnp.asarray(tri),
      jnp.asarray(triL))
    return (fr.reshape(B * nc, mt * stf * Rp),
            fi.reshape(B * nc, mt * stf * Rp),
            a.reshape(B, mt * SW), power.reshape(B, mt * SW))
