"""
Per-grid-cell cost bisection for the two hot Pallas kernels on the REAL
TPU (round-4 follow-up to VERDICT #1: the fused scan is per-cell-latency
bound at ~4-5% MFU; find out WHICH ops inside the cell carry the fixed
cost before restructuring anything).

Each variant re-times the whole launch with ONE op structurally ablated
(shape-identical cheap fabrication, producers kept live — see the
``ablate`` docstrings in ops/pallas_kernels.py). base - variant = that
op's share of the launch. Values are WRONG under ablation; this script
never feeds production paths.

Timing follows PERF.md law: honest scalar-transfer sync, distinct
chained inputs, consume via max.

Usage:  python -u scripts/probe_kernel_anatomy.py [subspace|network]
Env:    PB (batch), PH (chunk hours), PK_KERN / PK_PREP (comma lists)
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

if os.environ.get("PK_CPU") == "1":   # smoke-test off-device (interpret)
    jax.config.update("jax_platforms", "cpu")
    # the platform gates default False on CPU; force both kernels so the
    # smoke path exercises prep AND kern (round-4 ADVICE)
    os.environ.setdefault("DETEX_TPU_PALLAS", "1")
    os.environ.setdefault("DETEX_TPU_MATMUL_FFT", "1")

import jax.numpy as jnp                               # noqa: E402

from detex_tpu.ops import ds as dsops                 # noqa: E402
from detex_tpu.ops import pallas_kernels as pk        # noqa: E402
from detex_tpu.parallel import scan as pscan          # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "subspace"
KERN_VARIANTS = [v for v in os.environ.get(
    "PK_KERN", "base,noswap1,nodot1,noswapbb,tail2,fma1,nohist"
).split(",") if v]
PREP_VARIANTS = [v for v in os.environ.get(
    "PK_PREP", "base,pnoswapin,pnodot1,pnoswapbb,ptail2,pnostats"
).split(",") if v]

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
    B = int(os.environ.get("PB", "256"))
    A = rng.standard_normal((4, n))
    q, _ = np.linalg.qr(A.T)
    U_list = [np.ascontiguousarray(q[:, :4].T)]
    iters = 4
Lc = int(3600 * hours * sr * nc)
bank = dsops.build_bank(U_list, nc, Lc, prefer_os=True)
st = pscan._bank_statics(bank, nc)
n_c, blk = st["n_c"], st["nfft"]
L_c = Lc // nc
chunk_hours = B * hours
print("mode=%s S=%d B=%d hours=%g blk=%d (%.1f chunk-hours/launch)"
      % (MODE, S, B, hours, blk, chunk_hours), flush=True)

n_data = 2
Xs = [jax.random.normal(jax.random.PRNGKey(i), (B, Lc), jnp.float32)
      for i in range(n_data)]


def timeit(name, fn, base=None):
    t0 = time.perf_counter()
    float(fn(Xs[0], jnp.float32(0.125)))
    print("  %-10s warm+compile %.1f s"
          % (name, time.perf_counter() - t0), flush=True)
    best = np.inf
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(rep + 1)
        for i in range(iters):
            acc = fn(Xs[i % n_data], acc)
        float(acc)
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    note = ""
    if base is not None:
        note = "  (op share %6.1f ms = %4.1f%%)" % (
            1e3 * (base - per), 100.0 * (base - per) / base)
    print("%-11s %8.1f ms/launch  %6.3f ms/chunk-hour%s"
          % (name, 1e3 * per, 1e3 * per / chunk_hours, note), flush=True)
    return per


def tag_of(acc):
    return (acc * 1e-20).reshape(1, 1)


# ---- prep variants ---------------------------------------------------------
from functools import partial                         # noqa: E402

stf = pk.PREP_STF
out_len, pad0, D0, W, m = dsops._os_geometry(L_c, n_c, blk)


def make_prep(ab):
    @jax.jit
    def go(X, tag):
        X = jax.lax.dynamic_update_slice(X, tag, (0, 0))
        # inline of os_prep_batch_fused with the ablate hook threaded
        mt = -(-m // stf)
        Lp = (mt * stf + 1) * W
        mu = jnp.mean(X, axis=1, keepdims=True)
        sd = jnp.std(X, axis=1, keepdims=True)
        xs = (X - mu) / jnp.where(sd == 0, 1.0, sd)
        xc = xs.reshape(B, L_c, nc).transpose(0, 2, 1)
        xq = jnp.pad(xc, ((0, 0), (0, 0), (pad0, Lp - L_c - pad0)))
        Fr, Fi, a, power = pk.fwd_prep_fold(
            xq, nc, n_c, blk, stf, out_len, ablate=ab)
        return (Fr.max() * 1e-10 + Fi.max() * 1e-10 + a.max() * 1e-10 +
                power.min() * 1e-10)

    def p(X, acc):
        return go(X, tag_of(acc)) + acc * 1e-10
    return p


# ---- kernel variants (precomputed spectra, emit_ds=False) ------------------
_spec_cache = {}


def _spectra(X):
    key = id(X)
    if key not in _spec_cache:
        Fr, Fi, a, power = jax.jit(
            lambda x: dsops.os_prep_batch_pair(x, n_c, nc, blk))(X)
        NV = jnp.full((B,), (Lc - bank["n"]) // nc + 1, jnp.int32)
        _spec_cache[key] = (Fr, Fi, a, power, NV)
    return _spec_cache[key]


def make_kern(ab):
    blocked = S > pscan.TEMPLATE_BLOCK
    if blocked:
        arrs = pscan._specds_arrs(bank, True)
        mode = "net"
    else:
        arrs = pscan._specds_arrs(bank, False)
        mode = dsops.spec_ds_mode(B, S, int(bank["Dmax"]), n_c, nc, blk)
        assert mode, "fused kernel unsupported for this config"
    Dmax = int(bank["Dmax"])

    @jax.jit
    def go(Fr, Fi, a, power, NV, tag):
        Frt = jax.lax.dynamic_update_slice(Fr, tag, (0, 0))
        powsafe = jnp.where(power == 0, jnp.inf, power)
        pad_w = m * W - out_len
        ap = jnp.pad(a, ((0, 0), (0, pad_w)))
        pp = jnp.pad(powsafe, ((0, 0), (0, pad_w)), constant_values=1.0)
        if blocked:
            def one_block(abk):
                ur, ui, su, dm = abk
                su_t = jnp.where(dm, su, 0.0).T
                u2r = ur.reshape(Dmax, ur.shape[1], -1)
                u2i = ui.reshape(Dmax, ur.shape[1], -1)
                _, pyr, hist = pk.spec_ds_fold(
                    u2r, u2i, Frt, Fi, ap, pp, su_t, NV, "net", nc,
                    Dmax, W, D0, blk, nbin=400, emit_ds=False, ablate=ab)
                return pyr.max(), hist.max()
            pm, hm = jax.lax.map(one_block, arrs)
            return pm.max() * 1e-10 + hm.max() * 1e-20
        ur, ui, sumu, dm = arrs[0], arrs[1], arrs[2], arrs[3]
        su_t = jnp.where(dm, sumu, 0.0).T
        u2r = ur.reshape(Dmax, S, -1)
        u2i = ui.reshape(Dmax, S, -1)
        _, pyr, hist = pk.spec_ds_fold(
            u2r, u2i, Frt, Fi, ap, pp, su_t, NV, mode, nc, Dmax, W, D0,
            blk, nbin=400, emit_ds=False, ablate=ab)
        return pyr.max() * 1e-10 + hist.max() * 1e-20

    def p(X, acc):
        Fr, Fi, a, power, NV = _spectra(X)
        return go(Fr, Fi, a, power, NV, tag_of(acc)) + acc * 1e-10
    return p


def _variant_ok(v):
    """Skip geometry-incompatible ablations with a notice instead of
    tripping the kernel's assert mid-sweep (round-4 ADVICE: noswapbb /
    pnoswapbb require n1 == n2, which blk=32768 violates)."""
    from detex_tpu.ops import dft as _dft
    n1_, n2_ = _dft._split(blk)
    if v in ("noswapbb", "pnoswapbb") and n1_ != n2_:
        print("  %-10s SKIPPED (requires n1 == n2; blk=%d has %dx%d)"
              % (v, blk, n1_, n2_), flush=True)
        return False
    return True


if __name__ == "__main__":
    results = {}
    if PREP_VARIANTS:
        print("== fwd_prep_fold ==", flush=True)
        base = None
        for v in PREP_VARIANTS:
            if not _variant_ok(v):
                continue
            ab = "" if v == "base" else v
            per = timeit(v, make_prep(ab), base)
            if v == "base":
                base = per
            results["prep." + v] = per
    if KERN_VARIANTS:
        print("== spec_ds_fold (emit_ds=False) ==", flush=True)
        # build spectra once (its own big compile) before timing
        _spectra(Xs[0]); _spectra(Xs[1])
        base = None
        for v in KERN_VARIANTS:
            if not _variant_ok(v):
                continue
            ab = "" if v == "base" else v
            per = timeit(v, make_kern(ab), base)
            if v == "base":
                base = per
            results["kern." + v] = per
    print({k: round(1e3 * t, 2) for k, t in results.items()}, flush=True)
