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
    print("TPU-NUMERICS: OK")


if __name__ == "__main__":
    main()
