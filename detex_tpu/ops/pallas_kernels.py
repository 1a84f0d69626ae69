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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces; fall back gracefully off-TPU
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

LANE = 128
DEFAULT_TILE = 8 * 1024


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
def ds_finalize(cc, a, power, sum_u, tile=DEFAULT_TILE, interpret=False):
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


def _finalize_os_kernel(cb_ref, a_ref, power_ref, sum_u_ref, out_ref, *,
                        n_c, D):
    cb = cb_ref[...]                    # [sd, 1, blk] one OS block
    x = cb[:, 0, n_c - 1:]              # valid part [sd, V]
    a = a_ref[...]                      # [1, V]
    power = power_ref[...]              # [1, V]
    su = sum_u_ref[...]                 # [sd, 1]
    y = x - su * a
    S = out_ref.shape[0]
    y2 = (y * y).reshape(S, D, x.shape[1]).sum(axis=1)
    out_ref[...] = y2 / power


@partial(jax.jit, static_argnames=("n_c", "D", "interpret"))
def ds_finalize_os(cb, a, power, sum_u, n_c, D, interpret=False):
    """
    Fused DS finalize over RAW overlap-save irfft blocks.

    Instead of materializing the trimmed/reshaped correlation array
    (``cb[..., n_c-1:].reshape(S, D, m*V)`` — an HBM-scale copy at large
    template counts), each grid step loads one OS block straight from the
    irfft output, discards its circularly-contaminated head in VMEM, and
    writes the DS tile.

    Parameters
    ----------
    cb : [S*D, m, blk] irfft of the per-block cross-spectra (untrimmed)
    a : [m*V] rolling mean, zero-padded past the valid output length
    power : [m*V] rolling power, padded with 1.0
    sum_u : [S*D] basis-vector sums
    n_c, D : per-channel template length, basis dimension

    Returns
    -------
    ds [S, m*V]; the caller slices to the true output length.
    """
    SD, m, blk = cb.shape
    S = SD // D
    V = blk - n_c + 1
    assert a.shape[0] == m * V and power.shape[0] == m * V
    # S-axis tiling keeping each cb tile a few MB of VMEM
    budget = 2 * 1024 * 1024 // 4
    st = max(1, min(S, budget // max(D * blk, 1)))
    while S % st:
        st -= 1
    grid = (m, S // st)
    kern = partial(_finalize_os_kernel, n_c=n_c, D=D)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((st * D, 1, blk), lambda i, j: (j, i, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, V), lambda i, j: (0, i), memory_space=_VMEM),
            pl.BlockSpec((1, V), lambda i, j: (0, i), memory_space=_VMEM),
            pl.BlockSpec((st * D, 1), lambda i, j: (j, 0),
                         memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((st, V), lambda i, j: (j, i),
                               memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((S, m * V), cb.dtype),
        interpret=interpret,
    )(cb, a[None, :], power[None, :], sum_u.reshape(SD, 1))
    return out
