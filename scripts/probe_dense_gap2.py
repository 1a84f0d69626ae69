"""
Dense-gap attribution, scan-free variant: probe_dense_gap.py's bank /
trig / host phases without compiling the B=256 fused scan program (the
planted trigger indices are known, so the scan is not needed to exercise
the materialize path; the quiet scan's cost per step is already measured
by bench.py subspace). Use when the full probe's scan compile is the
bottleneck.

Run on the TPU:  python -u scripts/probe_dense_gap2.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from detex_tpu.detect import _SSDetex, MAX_TRIGGERS
    from detex_tpu.ops import ds as dsops
    from detex_tpu.ops import triggers as trg

    print("backend:", jax.default_backend(), flush=True)
    nc, sr = 3, 100.0
    hours = float(os.environ.get("PH", "2"))
    B = int(os.environ.get("PB", "256"))
    n = int(30.0 * sr * nc)
    Lc = int(3600 * hours * sr * nc)
    rng = np.random.default_rng(0)
    D = 4
    A = rng.standard_normal((D, n))
    q, _ = np.linalg.qr(A.T)
    U = np.ascontiguousarray(q[:, :D].T)
    bank = dsops.build_bank([U], nc, Lc, prefer_os=True)
    th = 0.3
    k = max(1, int(round(0.03 * B)))
    c = float(np.sqrt(n * 0.6 / 0.4))
    n_data = 2
    Xh, trig_of = [], []
    for i in range(n_data):
        Xi = rng.standard_normal((B, Lc)).astype(np.float32)
        tb = sorted(int(b) for b in rng.choice(B, size=k, replace=False))
        for bi in tb:
            w0 = int(rng.integers(1, Lc // nc - n // nc - 1)) * nc
            Xi[bi, w0:w0 + n] += (c * U[0]).astype(np.float32)
        Xh.append(Xi)
        trig_of.append(tb)
    Xs = [jnp.asarray(x) for x in Xh]
    buff = int(20 * sr)

    # old-vs-new host mags path is selected by the live detect.py code;
    # PK_UTU=1 rebuilds the [n, n] UtU product locally to time the
    # pre-round-5 host path for the attribution table
    eng = object.__new__(_SSDetex)
    eng.trigCon = 0
    eng.fillZeros = False
    eng.estimateMags = True
    eng.dtype = "single"
    eng.issubspace = True
    eng.triggerLTATime = 5
    eng.triggerSTATime = 0
    WFs = np.stack([c * U[0] + 0.3 * rng.standard_normal(n)
                    for _ in range(4)]).astype(np.float64)
    det = {"SS0": dict(U=U, WFs=WFs, n=n,
                       mags=np.array([1.0, 1.2, 0.9, 1.1]),
                       events=["e%d" % i for i in range(4)],
                       offsets=np.zeros(4), WFU=(WFs @ U.T) @ U)}
    old_utu = os.environ.get("PK_UTU") == "1"
    if old_utu:
        UtU = U.T @ U

        def est_old(trigIndex, MPcon):
            ConDat = MPcon[trigIndex * nc: trigIndex * nc + n]
            ssCon = UtU @ ConDat
            return float(np.var(ssCon))

    sta_n, lta_n = 1, int(5 * sr)
    Lv = (Lc - n) // nc + 1
    cap = min(64, MAX_TRIGGERS)

    phases = {"rtt": [], "bank": [], "trig": [], "host": []}
    reps = int(os.environ.get("PREPS", "4"))
    for rep in range(reps + 1):
        ih = rep % n_data
        X = jax.lax.dynamic_update_slice(
            Xs[ih], jnp.float32(rep).reshape(1, 1), (0, 0))
        trig_b = trig_of[ih]

        t0 = time.perf_counter()
        float(X[1, 1])
        t_rtt = time.perf_counter() - t0

        t0 = time.perf_counter()
        sel = jnp.take(X, jnp.asarray(trig_b, jnp.int32), axis=0)
        Bp = 1 << max(len(trig_b) - 1, 0).bit_length()
        pad_sel = list(range(len(trig_b))) + [0] * (Bp - len(trig_b))
        Xd = jnp.take(sel, jnp.asarray(pad_sel, jnp.int32), axis=0)
        lens = [Lc] * len(trig_b) + [0] * (Bp - len(trig_b))
        out, _ = dsops._bank_batch_program(Xd, lens, bank, nc)
        float(out.max())
        t_bank = time.perf_counter() - t0

        t0 = time.perf_counter()
        R = len(trig_b)
        Rp = 1 << (R - 1).bit_length()
        cis = jnp.asarray(list(range(R)) + [0] * (Rp - R), jnp.int32)
        sis = jnp.zeros(Rp, jnp.int32)
        thr = jnp.full(Rp, th, jnp.float32)
        rows_dev = out[cis, sis]
        idx_d, cnt_d, dsv_d, slv_d = trg.trigger_rows_device(
            rows_dev, thr, Lv, sta_n, lta_n, buff, MAX_TRIGGERS, True)
        packed = np.asarray(trg.pack_trigger_outputs(
            idx_d, cnt_d, dsv_d, slv_d, cap))
        t_trig = time.perf_counter() - t0

        t0 = time.perf_counter()
        nrows = 0
        for z, bi in enumerate(trig_b):
            cnt = int(packed[z, 0])
            idx = packed[z, 1:1 + cnt].astype(np.int64)
            dsv = packed[z, 1 + cap:1 + cap + cnt].astype(np.float32)
            slv = packed[z, 1 + 2 * cap:1 + 2 * cap + cnt]
            if old_utu:
                for t in idx:
                    est_old(int(t), Xh[ih][bi])
            Sar = eng._coeffRows(idx, dsv, slv, "SS0", "TA.SYN", det,
                                 Xh[ih][bi], nc, sr, 0.0)
            nrows += len(Sar)
        t_host = time.perf_counter() - t0

        if rep == 0:
            print("warm done; %d triggered, %d det rows (old_utu=%s)"
                  % (len(trig_b), nrows, old_utu), flush=True)
            continue
        for nm, t in (("rtt", t_rtt), ("bank", t_bank), ("trig", t_trig),
                      ("host", t_host)):
            phases[nm].append(t)
        print("rep %d: rtt %.3f bank %.3f trig %.3f host %.3f"
              % (rep, t_rtt, t_bank, t_trig, t_host), flush=True)

    med = {kk: float(np.median(v)) for kk, v in phases.items()}
    print("== medians (s; bank/trig each include ~1 sync RTT) ==",
          flush=True)
    for kk, v in med.items():
        print("  %-5s %.3f" % (kk, v), flush=True)
    extra = med["bank"] + med["trig"] + med["host"] - 2 * med["rtt"]
    print("dense extra per materialize step = %.3f s (old_utu=%s)"
          % (extra, old_utu), flush=True)


if __name__ == "__main__":
    main()
