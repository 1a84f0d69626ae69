"""
Matmul (MXU) DFTs for the block-transform hot path.

This environment's XLA-TPU FFT executes batched transforms with a large
per-FFT fixed overhead (~0.27 ms measured on v5 lite): the overlap-save
bank path needs tens of thousands of 16k-point inverse FFTs per hour-chunk
at 1000 templates, i.e. multiple SECONDS of pure FFT-call overhead. On the
MXU the same transforms are two 128x128 matmul stages (Cooley-Tukey
radix-sqrt(n) decomposition) — ~34 MFLOP per 16k FFT, which a TPU chews
through at tens of TFLOP/s.

``irfft_ct(spec, n)`` == ``jnp.fft.irfft(spec, n, axis=-1)`` and
``rfft_ct(x, n)`` == ``jnp.fft.rfft(x, n, axis=-1)`` for power-of-two n
(up to matmul rounding; dot precision HIGHEST by default, override with
DETEX_TPU_DFT_PRECISION=default|high|highest).

Decomposition (n = n1*n2, k = k1 + n1*k2, t = n2*t1 + t2):
    X[t] = sum_k Z[k] W^(kt)
         = sum_k1 Wn1^(k1*t1) * W^(k1*t2) * [sum_k2 Z[k1+n1*k2] Wn2^(k2*t2)]
inner sum = [n1, n2] @ [n2, n2] matmul, twiddle = elementwise [n1, n2],
outer sum = [n1, n1] @ [n1, n2] matmul; all batched over leading dims.
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _precision():
    # HIGH (3-pass bf16) is the default: DS parity vs the float64 oracle
    # is 8.4e-7 on device (HIGHEST: 6.2e-9, 2x the matmul cost; DEFAULT
    # bf16 is NOT accurate enough for the 1e-5 parity gates)
    p = os.environ.get("DETEX_TPU_DFT_PRECISION", "high").lower()
    table = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}
    if p not in table:
        raise ValueError(
            "DETEX_TPU_DFT_PRECISION=%r not one of %s" %
            (p, sorted(table)))
    return table[p]


def _precision_mosaic():
    """Dot strategy for Pallas (Mosaic) kernels. Mosaic's dot lowering
    supports only DEFAULT and HIGHEST — requesting HIGH raises
    NotImplementedError at lowering time on real TPU. The package
    default HIGH therefore maps to "bf16x3" (manual 3-pass bf16
    emulation of HIGH inside the kernel, pallas_kernels._kdot; override
    with DETEX_TPU_MOSAIC_DOT=highest for 6-pass HIGHEST dots)."""
    p = _precision()
    if p == jax.lax.Precision.HIGH:
        mode = os.environ.get("DETEX_TPU_MOSAIC_DOT", "bf16x3")
        if mode == "highest":
            return jax.lax.Precision.HIGHEST
        if mode != "bf16x3":
            raise ValueError(
                "DETEX_TPU_MOSAIC_DOT=%r not one of ['bf16x3', "
                "'highest']" % mode)
        return "bf16x3"
    return p


def use_matmul_fft():
    """Matmul DFT on real TPU backends (override DETEX_TPU_MATMUL_FFT)."""
    env = os.environ.get("DETEX_TPU_MATMUL_FFT")
    if env is not None:
        return env != "0"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _split(n):
    """n = n1 * n2 with both powers of two, n1 <= n2."""
    b = int(n).bit_length() - 1
    assert (1 << b) == n, "matmul DFT requires power-of-two n"
    n1 = 1 << (b // 2)
    return n1, n // n1


@lru_cache(maxsize=None)
def _ct_mats(n, inverse):
    """Constant CT matrices for size n (host-built float64 -> float32):
    (Wn2 [n2, n2], twiddle [n1, n2], Wn1 [n1, n1]) as (real, imag) pairs.
    ``inverse`` uses W = exp(+2i pi / n) (scaling applied by the caller)."""
    n1, n2 = _split(n)
    sgn = 1.0 if inverse else -1.0
    k2 = np.arange(n2)
    wn2 = np.exp(sgn * 2j * np.pi * np.outer(k2, k2) / n2)
    k1 = np.arange(n1)
    t2 = np.arange(n2)
    tw = np.exp(sgn * 2j * np.pi * np.outer(k1, t2) / n)
    t1 = np.arange(n1)
    wn1 = np.exp(sgn * 2j * np.pi * np.outer(t1, k1) / n1)
    # host numpy: traced as embedded constants (device-array constants
    # would force a d2h transfer through the axon tunnel at lowering)
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    return ((f32(wn2.real), f32(wn2.imag)),
            (f32(tw.real), f32(tw.imag)),
            (f32(wn1.real), f32(wn1.imag)))


@lru_cache(maxsize=None)
def _ct_mats_half(n, inverse):
    """CT matrices for HALF-SPECTRUM transforms (validated vs np.fft to
    1e-14; /tmp-style derivation in ops/pallas_kernels spec_ds docs).

    inverse=True (irfft from the n//2+1 half spectrum, no hermitian
    extension): X[t] = (1/n)*Re(sum_{k<=n/2} c_k Z[k] W^{+kt}) with
    c_0 = c_{n/2} = 1, else 2. With k = k1 + n1*k2 the k < n/2 rectangle
    is k2 in [0, n2/2); stage 1 contracts it with W2h [n2/2, n2]; the
    k = n/2 term contributes Re(Z[n/2])*(-1)^t, added separately.
    Returns ((w2h_r, w2h_i) [n2h, n2], (twr, twi) [n1, n2],
             (w1r, w1i) [n1, n1]).

    inverse=False (rfft emitting only k <= n/2): output index
    k = n2*t1 + t2; keeping t1 <= n1/2 covers k < n/2*... every k <= n/2
    plus mirror bins up to (n1/2)*n2 + n2 - 1 (callers slice [:n//2+1]).
    Returns ((w2r, w2i) [n2, n2], (twr, twi) [n1, n2],
             (w1h_r, w1h_i) [n1h, n1]) with n1h = n1//2 + 1.
    """
    n1, n2 = _split(n)
    sgn = 1.0 if inverse else -1.0
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    t2 = np.arange(n2)
    tw = np.exp(sgn * 2j * np.pi * np.outer(np.arange(n1), t2) / n)
    if inverse:
        k2 = np.arange(n2 // 2)
        w2h = np.exp(sgn * 2j * np.pi * np.outer(k2, t2) / n2)
        w1 = np.exp(sgn * 2j * np.pi *
                    np.outer(np.arange(n1), np.arange(n1)) / n1)
        return ((f32(w2h.real), f32(w2h.imag)),
                (f32(tw.real), f32(tw.imag)),
                (f32(w1.real), f32(w1.imag)))
    k2 = np.arange(n2)
    w2 = np.exp(sgn * 2j * np.pi * np.outer(k2, t2) / n2)
    t1 = np.arange(n1 // 2 + 1)
    w1h = np.exp(sgn * 2j * np.pi * np.outer(t1, np.arange(n1)) / n1)
    return ((f32(w2.real), f32(w2.imag)),
            (f32(tw.real), f32(tw.imag)),
            (f32(w1h.real), f32(w1h.imag)))


def half_rp(n):
    """Padded spectrum width for the half-spectrum kernels: the forward
    kernel naturally emits (n1//2+1)*n2 bins (rfft order; bins past
    n//2 are mirror-frequency values), which is also lane-aligned."""
    n1, n2 = _split(n)
    return (n1 // 2 + 1) * n2


def _cmatmul(ar, ai, br, bi, prec):
    """(ar + i*ai) @ (br + i*bi) as real dots."""
    rr = jnp.matmul(ar, br, precision=prec) - \
        jnp.matmul(ai, bi, precision=prec)
    ri = jnp.matmul(ar, bi, precision=prec) + \
        jnp.matmul(ai, br, precision=prec)
    return rr, ri


def _ct_core(zr, zi, n, inverse):
    """Batched complex DFT of Z [..., n] given as (real, imag).
    Returns (real, imag) [..., n]; NO 1/n scaling.

    Every matmul is flattened to a single 2-D [B*128, 128] @ [128, 128] —
    this backend pays a visible per-call overhead on *batched* matmuls
    (like it does on batched FFTs), so batch dims are folded into M."""
    n1, n2 = _split(n)
    (w2r, w2i), (twr, twi), (w1r, w1i) = _ct_mats(n, inverse)
    prec = _precision()
    lead = zr.shape[:-1]
    B = int(np.prod(lead)) if lead else 1

    def m2(ar, ai, br, bi, rows):
        """[(B*rows_pre), k] @ [k, cols] as flat 2-D complex matmul."""
        return _cmatmul(ar.reshape(-1, rows), ai.reshape(-1, rows),
                        br, bi, prec)

    # Z[k1 + n1 k2] -> [..., k2, k1] -> [..., k1, k2]
    zr = jnp.swapaxes(zr.reshape(lead + (n2, n1)), -1, -2)
    zi = jnp.swapaxes(zi.reshape(lead + (n2, n1)), -1, -2)
    # inner: A[k1, t2] = sum_k2 Z[k1, k2] Wn2[k2, t2]  (contract last dim)
    ar, ai = m2(zr, zi, w2r, w2i, n2)                  # [B*n1, n2]
    ar = ar.reshape(lead + (n1, n2))
    ai = ai.reshape(lead + (n1, n2))
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # outer: X2[t1, t2] = sum_k1 Wn1[t1, k1] B[k1, t2]
    #      = (B^T [t2, k1] @ Wn1^T [k1, t1])^T — contract the last dim
    br = jnp.swapaxes(br, -1, -2)                      # [..., t2, k1]
    bi = jnp.swapaxes(bi, -1, -2)
    xr, xi = m2(br, bi, w1r.T, w1i.T, n1)              # [B*n2, n1]
    xr = jnp.swapaxes(xr.reshape(lead + (n2, n1)), -1, -2)
    xi = jnp.swapaxes(xi.reshape(lead + (n2, n1)), -1, -2)
    return xr.reshape(lead + (n,)), xi.reshape(lead + (n,))


def _use_pallas_dft():
    """Pallas CT kernels on real TPU backends (DETEX_TPU_PALLAS_DFT=0/1
    overrides; follows DETEX_TPU_PALLAS otherwise)."""
    env = os.environ.get("DETEX_TPU_PALLAS_DFT")
    if env is not None:
        return env != "0"
    from detex_tpu.ops.ds import _use_pallas
    return _use_pallas()


@partial(jax.jit, static_argnames=("n",))
def irfft_ct(spec, n):
    """== jnp.fft.irfft(spec, n, axis=-1) for power-of-two n via two MXU
    matmul stages. spec [..., n//2 + 1] complex.

    On TPU the two stages run inside ONE Pallas kernel with VMEM-resident
    intermediates (the XLA formulation materializes the hermitian
    extension, two transposes and four matmul results in HBM per stage —
    measured as the dominant HBM traffic of the overlap-save bank scan).
    """
    R = n // 2 + 1
    assert spec.shape[-1] == R
    sr = jnp.real(spec)
    si = jnp.imag(spec)
    # hermitian extension: Z[n-k] = conj(Z[k]), k = 1..n/2-1. The
    # optimization_barrier keeps XLA from fusing the reverse into the
    # concat's pad form — the TPU fusion emitter aborts on a reversed
    # input whose pad_low is the concat offset (fusion_emitter.cc
    # "Check failed: window.pad_low[i] == 0 (R vs. 0)", reproduced at
    # blk_fft=16384 geometries; /tmp/repro_fold.py round 5)
    mr, mi = jax.lax.optimization_barrier(
        (sr[..., -2:0:-1], si[..., -2:0:-1]))
    zr = jnp.concatenate([sr, mr], axis=-1)
    zi = jnp.concatenate([si, -mi], axis=-1)
    n1, n2 = _split(n)
    if n1 == 128 and n <= 32768 and _use_pallas_dft():
        lead = zr.shape[:-1]
        N = int(np.prod(lead)) if lead else 1
        from detex_tpu.ops.pallas_kernels import irfft_ct_fused
        out = irfft_ct_fused(zr.reshape(N, n), zi.reshape(N, n), n)
        return out.reshape(lead + (n,))
    xr, _ = _ct_core(zr, zi, n, inverse=True)
    return xr * (1.0 / n)


@partial(jax.jit, static_argnames=("n",))
def rfft_ct(x, n):
    """== jnp.fft.rfft(x, n, axis=-1) for power-of-two n (input is
    zero-padded/truncated to length n like jnp.fft.rfft). On TPU the two
    matmul stages run fused in one Pallas kernel (see irfft_ct)."""
    L = x.shape[-1]
    if L < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - L)])
    elif L > n:
        x = x[..., :n]
    n1, n2 = _split(n)
    if n1 == 128 and n <= 32768 and _use_pallas_dft():
        lead = x.shape[:-1]
        N = int(np.prod(lead)) if lead else 1
        from detex_tpu.ops.pallas_kernels import rfft_ct_fused
        fr, fi = rfft_ct_fused(x.reshape(N, n), n)
        R = n // 2 + 1
        return jax.lax.complex(fr[:, :R], fi[:, :R]).reshape(lead + (R,))
    xr, xi = _ct_core(x, jnp.zeros_like(x), n, inverse=False)
    return jax.lax.complex(xr[..., :n // 2 + 1], xi[..., :n // 2 + 1])


@partial(jax.jit, static_argnames=("n", "rp"))
def rfft_pair(x, n, rp):
    """Forward transform of real x [N, n] as a float32 (real, imag) pair
    [N, rp] — no complex arrays (the fused spec->DS kernel consumes the
    pair directly, and complex transfers are broken on this backend).

    Bins in (n//2, rp) are either mirror-frequency spectrum values (the
    Pallas/matmul paths' natural full-width layout) or zeros (backend-FFT
    fallback) — consumers must treat them as inert (the spec_ds kernel
    only reads bins [0, n//2]; template spectra are zero-padded there)."""
    R = n // 2 + 1
    assert R <= rp <= n
    n1, _ = _split(n)
    if n1 == 128 and n <= 32768 and _use_pallas_dft():
        if rp == half_rp(n):
            # half-spectrum forward: half the stage-2 dots and writes
            from detex_tpu.ops.pallas_kernels import rfft_ct_half
            return rfft_ct_half(x, n)
        from detex_tpu.ops.pallas_kernels import rfft_ct_fused
        fr, fi = rfft_ct_fused(x, n)
        return fr[:, :rp], fi[:, :rp]
    if use_matmul_fft():
        xr, xi = _ct_core(x, jnp.zeros_like(x), n, inverse=False)
        return xr[:, :rp], xi[:, :rp]
    f = jnp.fft.rfft(x, n, axis=-1)
    fr = jnp.pad(jnp.real(f), ((0, 0), (0, rp - R)))
    fi = jnp.pad(jnp.imag(f), ((0, 0), (0, rp - R)))
    return fr, fi
