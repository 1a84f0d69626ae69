"""
Decompose window_stats_rows' cost on the REAL TPU (round 4: the prep
sub-stage profile showed stats = 109 ms/launch = 0.43 of the 0.79
ms/chunk-hour subspace scan — more than the fused spec->DS kernel itself).

window_stats_rows(xc [B, nc, L_c]) =
    both   = concat([flat, flat^2])                  [2*B*nc, L_c]
    intra  = (both tiled [R*nt, T]) @ tri[T, T]      the MXU prefix sum
    carry  = cumsum of per-tile totals + broadcast   C [R, L]
    body   = C[:, n:] - C[:, :L-n] (+ head concat)   window sums
    final  = channel sum + var/power                 [B, M]

Probes (honest scalar sync, consume via max, distinct chained inputs):
  sq      both = concat([flat, flat*flat]) alone
  tri     intra matmul alone (package precision, default HIGH=bf16x3)
  trid    intra matmul at DEFAULT (1-pass bf16) — isolates precision cost
  trif32  intra via 3x f32... HIGHEST (6-pass) for the ladder
  carry   carry + C assembly from a precomputed intra
  body    body-slice subtraction + head concat from a precomputed C
  whole   window_stats_rows end to end
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

from detex_tpu.ops import rolling as roll             # noqa: E402
from detex_tpu.ops import dft as _dft                 # noqa: E402

B, nc = int(os.environ.get("PB", "128")), 3
hours = float(os.environ.get("PH", "2"))
L_c = int(3600 * hours * 100)
n_c = 3000
n = n_c * nc
R = 2 * B * nc
T = 128
nt = -(-L_c // T)
PROBES = os.environ.get(
    "PROBES", "sq,tri,trid,carry,body,whole").split(",")

print("B=%d L_c=%d R=%d nt=%d" % (B, L_c, R, nt), flush=True)

rng = np.random.default_rng(0)
Xs = [jnp.asarray(rng.standard_normal((B * nc, L_c)).astype(np.float32))
      for _ in range(2)]


def tag(acc):
    return (acc * 1e-20).reshape(1, 1)


def timeit(name, fn, iters=4):
    t0 = time.perf_counter()
    float(fn(Xs[0], jnp.float32(0.125)))
    print("  %-6s warm+compile %.1f s"
          % (name, time.perf_counter() - t0), flush=True)
    best = np.inf
    for rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(rep + 1)
        for i in range(iters):
            acc = fn(Xs[i % 2], acc)
        float(acc)
        best = min(best, time.perf_counter() - t0)
    print("%-7s %8.1f ms/launch" % (name, 1e3 * best / iters), flush=True)
    return best / iters


def _both(flat):
    return jnp.concatenate([flat, flat * flat], axis=0)


@jax.jit
def j_sq(flat, tg):
    flat = jax.lax.dynamic_update_slice(flat, tg, (0, 0))
    return _both(flat).max() * 1e-10


def _intra(both, prec):
    xp = both.reshape(R * nt, T)
    return jnp.matmul(xp, roll._tri(T), precision=prec)


def mk_tri(prec):
    @jax.jit
    def j_tri(flat, tg):
        flat = jax.lax.dynamic_update_slice(flat, tg, (0, 0))
        return _intra(_both(flat), prec).max() * 1e-10
    return j_tri


_cache = {}


def intra_of(flat):
    if id(flat) not in _cache:
        _cache[id(flat)] = jax.jit(
            lambda f: _intra(_both(f), _dft._precision())
            .reshape(R, nt, T))(flat)
    return _cache[id(flat)]


def _carry(intra):
    tsum = intra[:, :, -1]
    off = jnp.cumsum(tsum, axis=1) - tsum
    return (intra + off[:, :, None]).reshape(R, nt * T)[:, :L_c]


@jax.jit
def j_carry(intra, tg):
    intra = jax.lax.dynamic_update_slice(intra, tg.reshape(1, 1, 1),
                                         (0, 0, 0))
    return _carry(intra).max() * 1e-10


_ccache = {}


def c_of(flat):
    if id(flat) not in _ccache:
        _ccache[id(flat)] = jax.jit(_carry)(intra_of(flat))
    return _ccache[id(flat)]


@jax.jit
def j_body(C, tg):
    C = jax.lax.dynamic_update_slice(C, tg, (0, 0))
    head = C[:, n_c - 1:n_c]
    body = C[:, n_c:] - C[:, :L_c - n_c]
    s = jnp.concatenate([head, body], axis=1)
    return s.max() * 1e-10


@jax.jit
def j_whole(flat, tg):
    flat = jax.lax.dynamic_update_slice(flat, tg, (0, 0))
    a, power = roll.window_stats_rows(flat.reshape(B, nc, L_c), n_c, n)
    return a.max() * 1e-10 + power.max() * 1e-10


FNS = dict(
    sq=lambda X, acc: j_sq(X, tag(acc)) + acc * 1e-10,
    tri=lambda X, acc: mk_tri(_dft._precision())(X, tag(acc)) + acc * 1e-10,
    trid=lambda X, acc: (mk_tri(jax.lax.Precision.DEFAULT)(X, tag(acc))
                         + acc * 1e-10),
    trif32=lambda X, acc: (mk_tri(jax.lax.Precision.HIGHEST)(X, tag(acc))
                           + acc * 1e-10),
    carry=lambda X, acc: j_carry(intra_of(X), tag(acc)) + acc * 1e-10,
    body=lambda X, acc: j_body(c_of(X), tag(acc)) + acc * 1e-10,
    whole=lambda X, acc: j_whole(X, tag(acc)) + acc * 1e-10,
)

res = {}
for p in PROBES:
    try:
        res[p] = timeit(p, FNS[p])
    except Exception as e:
        print("%-7s FAILED: %r" % (p, e), flush=True)
print("\nsummary (ms/launch):", flush=True)
for k, v in res.items():
    print("  %-6s %8.1f" % (k, 1e3 * v), flush=True)
