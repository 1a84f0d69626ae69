"""
Dense-gap attribution probe (VERDICT round-4 #5): the dense engine path
runs at ~25% of the quiet scan rate (26.8 vs 109.7 st-d/s). This measures
WHERE the extra ~0.6 s/step goes, with an explicit scalar-transfer sync
after each phase (PERF.md timing law: distinct chained inputs, consume
via max, scalar sync). Phases per materialize step, at the bench dense
geometry (B=256 x 2 h chunks, 3% triggered -> 8 triggered chunks):

  rtt    null dependent-scalar round trip (the per-sync floor)
  scan   summary-only fused scan + packed summary transfer (the quiet path)
  bank   jnp.take gather of the 8 triggered chunks from the scan's device
         batch + the full bank re-verify program (DS rows stay on device)
  trig   trigger_rows_device (inf-zero + STA/LTA + while-loop extraction)
         + pack_trigger_outputs + the ONE packed transfer
  host   _coeffRows magnitude/row assembly on the transferred triggers

Each phase time INCLUDES one sync RTT; subtract ``rtt`` for device time.

Run on the TPU:  python -u scripts/probe_dense_gap.py
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
    from detex_tpu.parallel import scan as pscan

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
    thresholds = np.full(1, th, np.float32)
    k = max(1, int(round(0.03 * B)))
    c = float(np.sqrt(n * 0.6 / 0.4))
    n_data = 2
    Xh = []
    for i in range(n_data):
        Xi = rng.standard_normal((B, Lc)).astype(np.float32)
        for bi in rng.choice(B, size=k, replace=False):
            w0 = int(rng.integers(1, Lc // nc - n // nc - 1)) * nc
            Xi[bi, w0:w0 + n] += (c * U[0]).astype(np.float32)
        Xh.append(Xi)
    Xs = [jnp.asarray(x) for x in Xh]
    buff = int(20 * sr)

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

    def scan_step(X):
        return pscan.scan_chunks(X, bank, thresholds, nc, buff, max_trig=1,
                                 calc_triggers=False)

    sta_n, lta_n = 1, int(5 * sr)
    Lv = (Lc - n) // nc + 1
    cap = min(64, MAX_TRIGGERS)

    phases = {"rtt": [], "scan": [], "bank": [], "trig": [], "host": []}
    reps = int(os.environ.get("PREPS", "4"))
    for rep in range(reps + 1):  # rep 0 = warm/compile, discarded
        X = jax.lax.dynamic_update_slice(
            Xs[rep % n_data], jnp.float32(rep).reshape(1, 1), (0, 0))

        t0 = time.perf_counter()
        float(X[0, 0])
        t_rtt = time.perf_counter() - t0

        t0 = time.perf_counter()
        hist, maxds, *_ = scan_step(X)
        m = np.asarray(maxds)
        t_scan = time.perf_counter() - t0

        trig_b = [bi for bi in range(B) if m[bi, 0] > th - 2e-5]
        assert len(trig_b) == k, (len(trig_b), k)

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
            Sar = eng._coeffRows(idx, dsv, slv, "SS0", "TA.SYN", det,
                                 Xh[rep % n_data][bi], nc, sr, 0.0)
            nrows += len(Sar)
        t_host = time.perf_counter() - t0

        if rep == 0:
            print("warm done; %d triggered, %d det rows" % (len(trig_b),
                                                            nrows),
                  flush=True)
            continue
        for name, t in (("rtt", t_rtt), ("scan", t_scan), ("bank", t_bank),
                        ("trig", t_trig), ("host", t_host)):
            phases[name].append(t)
        print("rep %d: rtt %.3f scan %.3f bank %.3f trig %.3f host %.3f"
              % (rep, t_rtt, t_scan, t_bank, t_trig, t_host), flush=True)

    print("== medians over %d reps (s; each phase includes ~1 sync RTT) =="
          % reps, flush=True)
    med = {kk: float(np.median(v)) for kk, v in phases.items()}
    for kk, v in med.items():
        print("  %-5s %.3f" % (kk, v), flush=True)
    extra = med["bank"] + med["trig"] + med["host"] - 2 * med["rtt"]
    print("dense extra per step (bank+trig+host - 2*rtt) = %.3f s"
          % extra, flush=True)
    print("quiet step = %.3f s -> implied dense/quiet = %.2f"
          % (med["scan"], med["scan"] / (med["scan"] + extra)), flush=True)


if __name__ == "__main__":
    main()
