"""
Real-TPU numeric gate: the fused Pallas DS finalize must agree with the
pure-XLA path AND the float64 oracle on the actual device — CI runs the
Pallas kernel only in interpret mode on CPU, so this is the one check that
exercises the compiled TPU kernel's values (not just its timing).

Run on the TPU (no platform forcing):  python -u scripts/verify_tpu_numerics.py
Expected final line:                   TPU-NUMERICS: OK
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    from detex_tpu.ops import ds as dsops

    backend = jax.default_backend()
    print("backend:", backend, jax.devices()[0])
    if backend == "cpu":
        raise SystemExit("this gate must run on the TPU, not CPU")

    nc, n = 3, 2046
    Lc = 3 * (1 << 16)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, n))
    q, _ = np.linalg.qr(A.T)
    U = np.ascontiguousarray(q[:, :4].T)
    bank = dsops.build_bank([U], nc, Lc)
    assert bank.get("demux") and not bank.get("os")
    x = rng.standard_normal(Lc)

    # the pallas-vs-XLA choice happens at trace time, so clear the jit
    # cache between flag flips to force both compilations
    outs = {}
    for flag in ("1", "0"):
        os.environ["DETEX_TPU_PALLAS"] = flag
        dsops.ds_bank_demux.clear_cache()
        outs[flag] = np.asarray(dsops.run_bank(x, bank, nc)[0])
    os.environ.pop("DETEX_TPU_PALLAS", None)

    oracle = dsops.ds_numpy(x, U, nc)
    d_pallas = float(np.abs(outs["1"] - outs["0"]).max())
    d_oracle = float(np.abs(outs["1"] - oracle).max())
    print("pallas-vs-xla  max|diff| = %.3g" % d_pallas)
    print("pallas-vs-f64  max|diff| = %.3g" % d_oracle)
    assert d_pallas < 1e-5, "compiled Pallas finalize drifted from XLA"
    assert d_oracle < 2e-5, "device DS drifted from the float64 oracle"

    # overlap-save fused finalize (the large-bank path) on device
    bank_os = dsops.build_bank([U], nc, Lc, block_fft=4096)
    assert bank_os.get("os")
    outs_os = {}
    for flag in ("1", "0"):
        os.environ["DETEX_TPU_PALLAS"] = flag
        dsops.ds_bank_demux_os.clear_cache()
        outs_os[flag] = np.asarray(dsops.run_bank(x, bank_os, nc)[0])
    os.environ.pop("DETEX_TPU_PALLAS", None)
    d_os = float(np.abs(outs_os["1"] - outs_os["0"]).max())
    d_os_or = float(np.abs(outs_os["1"] - oracle).max())
    print("os-pallas-vs-xla max|diff| = %.3g" % d_os)
    print("os-pallas-vs-f64 max|diff| = %.3g" % d_os_or)
    assert d_os < 1e-5, "compiled OS Pallas finalize drifted from XLA"
    # the TPU's block FFTs round differently from the CPU's (measured
    # ~5e-5 vs the f64 oracle; the full-length path is ~1e-8) — gate at
    # 2e-4, well inside every threshold margin in the engine
    assert d_os_or < 2e-4, "OS-path DS drifted from the float64 oracle"

    # MXU counting histogram vs the sort path, compiled on device
    import jax.numpy as jnp
    from detex_tpu.ops.pallas_kernels import hist_uniform
    from detex_tpu.parallel.scan import DEFAULT_BINS, _hist_counts
    ds_rows = np.clip(
        rng.uniform(-0.05, 1.05, size=(16, 50000)), -1.0, 2.0
    ).astype(np.float32)
    got = np.asarray(hist_uniform(jnp.asarray(ds_rows))).astype(np.int64)
    bins = jnp.asarray(DEFAULT_BINS, jnp.float32)
    want = np.stack([np.asarray(_hist_counts(jnp.asarray(r), bins))
                     for r in ds_rows]).astype(np.int64)
    # the fused OS scan path (ds + nv mask + pyramid + triggers) on
    # device: pallas vs XLA fallback must agree on maxima and triggers
    from detex_tpu.parallel import scan as pscan
    th = np.full(1, 0.2, np.float32)   # one detector (D=4 basis dims)
    X2 = np.stack([np.asarray(x, np.float32),
                   np.asarray(x[::-1], np.float32)])
    outs_scan = {}
    for flag in ("1", "0"):
        os.environ["DETEX_TPU_PALLAS"] = flag
        dsops.ds_bank_demux_os_scan.clear_cache()
        pscan._scan_chunks_jit.clear_cache()
        h, mx, ti, tv, tc = pscan.scan_chunks(
            X2, bank_os, th, nc, 200, max_trig=8,
            valid_lens=[len(x), len(x) - 5000])
        outs_scan[flag] = (np.asarray(h), np.asarray(mx), np.asarray(ti),
                          np.asarray(tc))
    os.environ.pop("DETEX_TPU_PALLAS", None)
    h1, mx1, ti1, tc1 = outs_scan["1"]
    h0, mx0, ti0, tc0 = outs_scan["0"]
    d_mx = float(np.abs(mx1 - mx0).max())
    print("os-scan pallas-vs-xla maxds|diff| = %.3g, trig equal = %s, "
          "hist cells diff = %d"
          % (d_mx, bool((ti1 == ti0).all() and (tc1 == tc0).all()),
             int((h1 != h0).sum())))
    assert d_mx < 1e-5, "fused OS scan maxds drifted"
    assert (tc1 == tc0).all() and (ti1 == ti0).all(), \
        "fused OS scan triggers drifted"
    # fused-finalize histogram (fold path) vs the sort path: totals exact,
    # cells only differ within edge-ULP reassignment
    assert (h1.sum(axis=1) == h0.sum(axis=1)).all(), \
        "fused scan histogram lost/added samples"
    assert int((h1 != h0).sum()) <= 16, \
        "fused scan histogram drifted beyond edge-ULP cells"

    # blocked (network-path) scan with the in-finalize histogram: a bank
    # larger than TEMPLATE_BLOCK exercises lax.map over template blocks +
    # ds_finalize_os_scan(nbin=400)
    SBIG = pscan.TEMPLATE_BLOCK + 8
    rngb = np.random.default_rng(5)
    Tb = rngb.standard_normal((SBIG, 3 * 1500))
    Ub = [np.ascontiguousarray((t / np.linalg.norm(t))[None, :])
          for t in Tb]
    bank_big = dsops.build_bank(Ub, nc, Lc, block_fft=4096)
    assert bank_big.get("os")
    thb = np.full(SBIG, 0.2, np.float32)
    outs_big = {}
    for flag in ("1", "0"):
        os.environ["DETEX_TPU_PALLAS"] = flag
        pscan._scan_chunks_jit.clear_cache()
        # B=2: exercises the grouped-stats (per-chunk) fold layout, which
        # has different tile legality than the B=1 case
        h, mx, ti, tv, tc = pscan.scan_chunks(
            X2, bank_big, thb, nc, 200, max_trig=4,
            valid_lens=[Lc, Lc - 5000])
        outs_big[flag] = (np.asarray(h), np.asarray(mx), np.asarray(ti),
                         np.asarray(tc))
    os.environ.pop("DETEX_TPU_PALLAS", None)
    hb1, mb1, tib1, tcb1 = outs_big["1"]
    hb0, mb0, tib0, tcb0 = outs_big["0"]
    print("blocked-scan pallas-vs-xla maxds|diff| = %.3g, hist cells "
          "diff = %d" % (float(np.abs(mb1 - mb0).max()),
                         int((hb1 != hb0).sum())))
    assert float(np.abs(mb1 - mb0).max()) < 1e-5
    assert (tib1 == tib0).all() and (tcb1 == tcb0).all()
    assert (hb1.sum(axis=1) == hb0.sum(axis=1)).all(), \
        "blocked-scan fused histogram lost/added samples"
    assert int((hb1 != hb0).sum()) <= SBIG, \
        "blocked-scan fused histogram drifted beyond edge-ULP cells"

    # fused spec->DS kernel (FMA + half-spectrum CT inverse + finalize in
    # one Pallas pass) vs the unfused fold pipeline, compiled on device.
    # Needs blk_fft >= 16384 (n1 == 128).
    LcS = 3 * 35000
    rngs = np.random.default_rng(11)
    Us = []
    for s in range(3):
        d = 4 if s % 2 == 0 else 3
        As = rngs.standard_normal((d, 1680))
        qs, _ = np.linalg.qr(As.T)
        Us.append(np.ascontiguousarray(qs[:, :d].T))
    bank_sd = dsops.build_bank(Us, nc, LcS, prefer_os=True,
                               block_fft=16384)
    XS = rngs.standard_normal((8, LcS)).astype(np.float32)
    XS[1, 5001:5001 + 1680] += 150.0 * np.asarray(Us[0][0])
    ths = np.full(3, 0.6, np.float32)
    mode = dsops.spec_ds_mode(8, 3, bank_sd["Dmax"], bank_sd["n_c"], nc,
                              16384)
    assert mode == "sub", "spec_ds routing broken on device: %r" % mode
    outs_sd = {}
    for flag in ("1", "0"):
        os.environ["DETEX_TPU_SPECDS"] = flag
        pscan._scan_chunks_fold_jit.clear_cache()
        h, mx, ti, tv, tc = pscan.scan_chunks(
            XS, dict(bank_sd), ths, nc, 250, max_trig=8)
        outs_sd[flag] = (np.asarray(h), np.asarray(mx), np.asarray(ti),
                         np.asarray(tc))
    os.environ.pop("DETEX_TPU_SPECDS", None)
    hs1, ms1, tis1, tcs1 = outs_sd["1"]
    hs0, ms0, tis0, tcs0 = outs_sd["0"]
    print("spec-ds fused-vs-unfused maxds|diff| = %.3g, trig equal = %s, "
          "hist cells diff = %d"
          % (float(np.abs(ms1 - ms0).max()),
             bool((tis1 == tis0).all() and (tcs1 == tcs0).all()),
             int((hs1 != hs0).sum())))
    assert float(np.abs(ms1 - ms0).max()) < 2e-5, "spec-ds maxds drifted"
    assert (tis1 == tis0).all() and (tcs1 == tcs0).all(), \
        "spec-ds triggers drifted"
    assert (hs1.sum(axis=1) == hs0.sum(axis=1)).all()
    assert int((hs1 != hs0).sum()) <= 16
    assert int(tcs1[1, 0]) >= 1, "planted event lost by spec-ds path"
    ds64 = dsops.ds_numpy(np.asarray(XS[1], np.float64), Us[0], nc)
    assert abs(float(ds64.max()) - float(ms1[1, 0])) < 2e-5, \
        "spec-ds drifted from the float64 oracle"

    # ---- round-4 kernels (VERDICT round-4 #4) ----------------------------
    # fwd_prep_fold (fused framing + forward CT + window stats) vs the XLA
    # prep, on the SAME fused spec->DS scan: interpret mode accepts Mosaic
    # formulations real TPU rejects (PERF.md round 4), so this must gate
    # the compiled kernel's values
    assert dsops.fwd_prep_ok(bank_sd["n_c"], nc, 16384), \
        "fused prep unsupported on device for the gate config"
    outs_fp = {}
    for flag in ("1", "0"):
        os.environ["DETEX_TPU_FUSED_PREP"] = flag
        pscan._scan_chunks_fold_jit.clear_cache()
        h, mx, ti, tv, tc = pscan.scan_chunks(
            XS, dict(bank_sd), ths, nc, 250, max_trig=8)
        outs_fp[flag] = (np.asarray(h), np.asarray(mx), np.asarray(ti),
                         np.asarray(tc))
    os.environ.pop("DETEX_TPU_FUSED_PREP", None)
    hf1, mf1, tif1, tcf1 = outs_fp["1"]
    hf0, mf0, tif0, tcf0 = outs_fp["0"]
    print("fwd-prep fused-vs-xla maxds|diff| = %.3g, trig equal = %s, "
          "hist cells diff = %d"
          % (float(np.abs(mf1 - mf0).max()),
             bool((tif1 == tif0).all() and (tcf1 == tcf0).all()),
             int((hf1 != hf0).sum())))
    assert float(np.abs(mf1 - mf0).max()) < 2e-5, "fwd_prep_fold drifted"
    assert (tif1 == tif0).all() and (tcf1 == tcf0).all()
    assert (hf1.sum(axis=1) == hf0.sum(axis=1)).all()
    assert int((hf1 != hf0).sum()) <= 16
    assert abs(float(ds64.max()) - float(mf1[1, 0])) < 2e-5, \
        "fused-prep DS drifted from the float64 oracle"

    # U-spectra storage variants (bf16 / bf16x2) vs f32, compiled on
    # device: bf16x2 must stay inside the engine's f32 gate margin
    # (~1e-4); bf16 is the documented ~3e-3 relative-error variant
    for udt, tol in (("bf16x2", 1e-4), ("bf16", 1e-2)):
        os.environ["DETEX_TPU_SPEC_UDTYPE"] = udt
        pscan._scan_chunks_fold_jit.clear_cache()
        h, mx, ti, tv, tc = pscan.scan_chunks(
            XS, dict(bank_sd), ths, nc, 250, max_trig=8)
        os.environ.pop("DETEX_TPU_SPEC_UDTYPE", None)
        d_u = float(np.abs(np.asarray(mx) - ms1).max())
        print("spec-udtype %s vs f32 maxds|diff| = %.3g" % (udt, d_u))
        assert d_u < tol, "%s spectra drifted beyond %g" % (udt, tol)
        assert int(np.asarray(tc)[1, 0]) >= 1, \
            "planted event lost by %s spectra" % udt

    # device-windowed trigger extraction (trigger_rows_device via
    # run_bank_triggers_batch) vs the exact host chain, on device rows
    from detex_tpu.ops import stalta as _stalta
    from detex_tpu.ops import triggers as _trig
    sr_g = 25.0
    rows_list = [[0, 1], [2]]
    thr_list = [[0.25, 0.3], [0.3]]
    chunks_g = [np.asarray(XS[1][: LcS - 3 * 7], np.float32),
                np.asarray(XS[2], np.float32)]
    got_tr = dsops.run_bank_triggers_batch(
        chunks_g, bank_sd, nc, rows_list, thr_list, [sr_g, sr_g],
        10.0, 0.5, True, max_triggers=64)
    rows_ref = dsops.run_bank_rows_batch(chunks_g, bank_sd, nc, rows_list)
    n_trig_checked = 0
    for ci, (rws, thrs) in enumerate(zip(rows_list, thr_list)):
        for si, thr in zip(rws, thrs):
            dsvec = rows_ref[ci][si]
            if dsvec.max() > 1.1:
                dsvec = np.where(np.isfinite(dsvec), dsvec, 0.0)
            sl = np.asarray(_stalta.ds_stalta(
                dsvec, 10.0 * sr_g, max(int(0.5 * sr_g), 1)))
            idx_h, cnt_h = _trig.extract_triggers(
                dsvec, float(thr), int(20 * sr_g), max_triggers=64)
            idx_h = np.asarray(idx_h)[: int(cnt_h)]
            idx_d, ds_d, sl_d = got_tr[ci][si]
            assert len(idx_d) == len(idx_h), (ci, si)
            np.testing.assert_array_equal(idx_d, idx_h)
            np.testing.assert_array_equal(ds_d, dsvec[idx_h])
            np.testing.assert_allclose(sl_d, sl[idx_h], rtol=1e-6)
            n_trig_checked += len(idx_d)
    print("device-trigger chain rows checked: %d triggers (incl. planted)"
          % n_trig_checked)
    assert n_trig_checked >= 1, "no triggers exercised the device chain"

    nbad = int((got != want).sum())
    print("hist mismatch cells: %d / %d" % (nbad, got.size))
    # row totals must match exactly; individual cells may differ for
    # values within an ULP of a float32 bin edge (documented floor-vs-
    # searchsorted deviation) — a handful per million samples
    assert (got.sum(axis=1) == want.sum(axis=1)).all(), \
        "counting histogram lost/added samples"
    assert nbad <= 16, "counting histogram drifted beyond edge-ULP cells"
    print("TPU-NUMERICS: OK")


if __name__ == "__main__":
    main()
