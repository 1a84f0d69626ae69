"""
Stage-split profiler for the fused scan on the REAL TPU (round-4 VERDICT
next #1: before touching the kernel, find out where the 112 ms/chunk
actually goes — round 3 never separated the fused kernel from the trigger
pass and the forward prep).

Probes (each timed with the honest scalar-transfer sync, distinct
chained inputs, consume-via-max — see PERF.md):

  null    trivial program: per-launch RTT floor
  full    scan_chunks, round-3 headline config (device triggers on)
  notrig  scan_chunks calc_triggers=False (engine summary-only scan;
          fused kernel runs with the VMEM-scratch accumulator)
  prep    os_prep_batch_pair alone (stats + framing + forward transforms)
  kern    os_scan_batch_fused alone from precomputed spectra, emit_ds=True
  kerns   same, emit_ds=False (no HBM DS write)

Prep sub-stages (round 4: prep measured 0.639 of full's 0.785
ms/chunk-hour — find out which of its four pieces dominates):

  std     per-chunk standardization + the [B, L_c, nc]->[B, nc, L_c]
          demux relayout
  stats   window_stats_rows from xc (batched cumsum rolling stats)
  frame   overlapping-block framing from xc (the [B, nc, m, blk] xb)
  fft     rfft_ct_half from a precomputed xb

Usage:  python -u scripts/profile_stages.py [subspace|network]
Env:    PB (batch), PH (chunk hours), PROBES (comma list to run)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np                                    # noqa: E402
import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from detex_tpu.ops import ds as dsops                 # noqa: E402
from detex_tpu.parallel import scan as pscan          # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "subspace"
PROBES = os.environ.get(
    "PROBES", "null,full,notrig,prep,kern,kerns,std,stats,frame,fft"
).split(",")

nc, sr = 3, 100.0
n = 9000
rng = np.random.default_rng(0)
if MODE == "network":
    S, hours = 1000, 1.0
    B = int(os.environ.get("PB", "8"))
    T = rng.standard_normal((S, n))
    U_list = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
              for t in T]
    iters = 4
else:
    S, hours = 1, float(os.environ.get("PH", "2"))
    B = int(os.environ.get("PB", "128"))
    A = rng.standard_normal((4, n))
    q, _ = np.linalg.qr(A.T)
    U_list = [np.ascontiguousarray(q[:, :4].T)]
    iters = 4
Lc = int(3600 * hours * sr * nc)
bank = dsops.build_bank(U_list, nc, Lc, prefer_os=True)
th = np.full(S, 0.99, np.float32)
buff = int(20 * sr)
st = pscan._bank_statics(bank, nc)
n_c, blk = st["n_c"], st["nfft"]
L_c = Lc // nc
chunk_hours = B * hours

print("mode=%s S=%d B=%d hours=%g blk=%d  (%.1f chunk-hours/launch)"
      % (MODE, S, B, hours, blk, chunk_hours), flush=True)

n_data = 2
Xs = [jax.random.normal(jax.random.PRNGKey(i), (B, Lc), jnp.float32)
      for i in range(n_data)]


def timeit(name, fn):
    """fn(X, acc) -> scalar; chained, unique inputs, best-of-2."""
    t0 = time.perf_counter()
    out = fn(Xs[0], jnp.float32(0.125))
    float(out)
    print("  %-7s warm+compile %.1f s" % (name, time.perf_counter() - t0),
          flush=True)
    best = np.inf
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(rep + 1)
        for i in range(iters):
            acc = fn(Xs[i % n_data], acc)
        float(acc)
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print("%-8s %8.1f ms/launch  %7.3f ms/chunk-hour"
          % (name, 1e3 * per, 1e3 * per / chunk_hours), flush=True)
    return per


def tag_of(acc, i=0):
    return (acc * 1e-20).reshape(1, 1)


# ---- probe bodies ----------------------------------------------------------

def p_null(X, acc):
    return (X.ravel()[0] * 1e-20 + acc * 0.5)


def _scan(X, acc, calc_triggers):
    X = jax.lax.dynamic_update_slice(X, tag_of(acc), (0, 0))
    hist, maxds, tidx, tval, tcnt = pscan.scan_chunks(
        X, bank, th, nc, buff, max_trig=16, calc_triggers=calc_triggers)
    return (maxds.ravel()[0] * 1e-10 + hist.sum().astype(jnp.float32)
            * 1e-20 + tcnt.sum().astype(jnp.float32) * 1e-20 + acc * 1e-10)


def p_full(X, acc):
    return _scan(X, acc, True)


def p_notrig(X, acc):
    return _scan(X, acc, False)


from functools import partial                          # noqa: E402


@partial(jax.jit, static_argnames=())
def _prep_jit(X, tag):
    X = jax.lax.dynamic_update_slice(X, tag, (0, 0))
    Fr, Fi, a, power = dsops.os_prep_batch_pair(X, n_c, nc, blk)
    return (Fr.max() * 1e-10 + Fi.max() * 1e-10 + a.max() * 1e-10 +
            power.max() * 1e-10)


def p_prep(X, acc):
    return _prep_jit(X, tag_of(acc)) + acc * 1e-10


@partial(jax.jit, static_argnames=())
def _prepf_jit(X, tag):
    X = jax.lax.dynamic_update_slice(X, tag, (0, 0))
    Fr, Fi, a, power = dsops.os_prep_batch_fused(X, n_c, nc, blk)
    return (Fr.max() * 1e-10 + Fi.max() * 1e-10 + a.max() * 1e-10 +
            power.min() * 1e-10)


def p_prepf(X, acc):
    return _prepf_jit(X, tag_of(acc)) + acc * 1e-10


# precomputed spectra for the kernel-only probes (built lazily)
_spec_cache = {}


def _spectra(X):
    key = id(X)
    if key not in _spec_cache:
        Fr, Fi, a, power = jax.jit(
            lambda x: dsops.os_prep_batch_pair(x, n_c, nc, blk))(X)
        NV = jnp.full((B,), (Lc - bank["n"]) // nc + 1, jnp.int32)
        _spec_cache[key] = (Fr, Fi, a, power, NV)
    return _spec_cache[key]


def _kern_probe(emit_ds):
    blocked = S > pscan.TEMPLATE_BLOCK
    if blocked:
        arrs = pscan._specds_arrs(bank, True)
        mode = "net"
    else:
        arrs = pscan._specds_arrs(bank, False)
        mode = dsops.spec_ds_mode(B, S, int(bank["Dmax"]), n_c, nc, blk)
        assert mode, "fused kernel unsupported for this config"

    @jax.jit
    def go(Fr, Fi, a, power, NV, tag):
        Frt = jax.lax.dynamic_update_slice(Fr, tag, (0, 0))
        if blocked:
            def one_block(ab):
                ur, ui, su, dm = ab
                ds, pyr, hist = dsops.os_scan_batch_fused(
                    Frt, Fi, a, power, ur, ui, su, dm, "net", n_c, nc,
                    blk, L_c, NV, nbin=400, emit_ds=emit_ds)
                return pyr.max(), hist.max()
            pm, hm = jax.lax.map(one_block, arrs)
            return pm.max() * 1e-10 + hm.max() * 1e-20
        ds, pyr, hist = dsops.os_scan_batch_fused(
            Frt, Fi, a, power, arrs[0], arrs[1], arrs[2], arrs[3],
            mode, n_c, nc, blk, L_c, NV, nbin=400, emit_ds=emit_ds)
        return pyr.max() * 1e-10 + hist.max() * 1e-20

    def p(X, acc):
        Fr, Fi, a, power, NV = _spectra(X)
        return go(Fr, Fi, a, power, NV, tag_of(acc)) + acc * 1e-10

    return p


# ---- prep sub-stage probes (each consumes via max) -------------------------

_geo = dsops._os_geometry(L_c, n_c, blk)
_out_len, _pad0, _D0, _W, _m = _geo
_n = n_c * nc


def _std_body(X):
    mu = jnp.mean(X, axis=1, keepdims=True)
    sd = jnp.std(X, axis=1, keepdims=True)
    xs = (X - mu) / jnp.where(sd == 0, 1.0, sd)
    return xs.reshape(X.shape[0], L_c, nc).transpose(0, 2, 1)


@jax.jit
def _std_jit(X, tag):
    X = jax.lax.dynamic_update_slice(X, tag, (0, 0))
    return _std_body(X).max() * 1e-10


def p_std(X, acc):
    return _std_jit(X, tag_of(acc)) + acc * 1e-10


_xc_cache = {}


def _xc(X):
    if id(X) not in _xc_cache:
        _xc_cache[id(X)] = jax.jit(_std_body)(X)
    return _xc_cache[id(X)]


@jax.jit
def _stats_jit(xc, tag):
    xc = jax.lax.dynamic_update_slice(xc, tag.reshape(1, 1, 1), (0, 0, 0))
    a, power = dsops.window_stats_rows(xc, n_c, _n)
    return a.max() * 1e-10 + power.max() * 1e-10


def p_stats(X, acc):
    return _stats_jit(_xc(X), tag_of(acc)) + acc * 1e-10


def _frame_body(xc):
    Bq = xc.shape[0]
    k = -(-blk // _W) + 1
    xp = jnp.pad(xc, ((0, 0), (0, 0),
                      (_pad0, (_m + k - 1) * _W - L_c - _pad0)))
    rows = [xp[:, :, j * _W:(_m + j) * _W].reshape(Bq, nc, _m, _W)
            for j in range(k)]
    return jnp.concatenate(rows, axis=3)[:, :, :, :blk]


@jax.jit
def _frame_jit(xc, tag):
    xc = jax.lax.dynamic_update_slice(xc, tag.reshape(1, 1, 1), (0, 0, 0))
    return _frame_body(xc).max() * 1e-10


def p_frame(X, acc):
    return _frame_jit(_xc(X), tag_of(acc)) + acc * 1e-10


_xb_cache = {}


def _xb(X):
    if id(X) not in _xb_cache:
        _xb_cache[id(X)] = jax.jit(_frame_body)(_xc(X))
    return _xb_cache[id(X)]


@jax.jit
def _fft_jit(xb, tag):
    xb = jax.lax.dynamic_update_slice(
        xb, tag.reshape(1, 1, 1, 1), (0, 0, 0, 0))
    from detex_tpu.ops import dft as _dft
    Rp = _dft.half_rp(blk)
    Bq = xb.shape[0]
    fr, fi = _dft.rfft_pair(xb.reshape(Bq * nc * _m, blk), blk, Rp)
    return fr.max() * 1e-10 + fi.max() * 1e-10


def p_fft(X, acc):
    return _fft_jit(_xb(X), tag_of(acc)) + acc * 1e-10


PROBE_FNS = dict(null=p_null, full=p_full, notrig=p_notrig, prep=p_prep,
                 prepf=p_prepf, std=p_std, stats=p_stats, frame=p_frame,
                 fft=p_fft)

results = {}
for name in PROBES:
    if name == "kern":
        fn = _kern_probe(True)
    elif name == "kerns":
        fn = _kern_probe(False)
    else:
        fn = PROBE_FNS[name]
    try:
        results[name] = timeit(name, fn)
    except Exception as e:
        print("%-8s FAILED: %r" % (name, e), flush=True)

print("\nsummary (ms/chunk-hour):", flush=True)
for k, v in results.items():
    print("  %-7s %7.3f" % (k, 1e3 * v / chunk_hours), flush=True)
if "full" in results and "notrig" in results:
    print("  trigger-pass share: %.3f ms/chunk-hour"
          % (1e3 * (results["full"] - results["notrig"]) / chunk_hours),
          flush=True)
