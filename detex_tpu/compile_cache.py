"""
Persistent XLA compile-cache enablement + compile-time attribution.

jax 0.9 does NOT read the ``JAX_COMPILATION_CACHE_DIR`` /
``JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS`` environment variables: the
config entries carry no env-var default, so every ``os.environ.setdefault``
in this repo's scripts was a silent no-op — ``config.compilation_cache_dir``
stayed ``None`` and ``jax._src.compilation_cache._initialize_cache``
returned without building a cache. No reads AND no writes, on every
platform. (This is the round-3 "persistent cache measured not working"
finding; re-measured round 5 with a debug-logged probe: the read path logs
"get_executable_and_time: cache is disabled/not initialized" while the env
var is set.) The fix is ``jax.config.update`` — done here, once, at
detex_tpu import.

On this environment's tunneled TPU a fresh program shape costs tens of
seconds to minutes of remote compile, and the detection pipeline's wall
time was compile-dominated end to end (CONFIG5_r04: 0.006 st-d/s); a
working persistent cache makes every shape a one-time cost per machine
instead of per process.

``enable()`` is idempotent and respects an explicit user config. Disable
with ``DETEX_TPU_COMPILE_CACHE=0``.
"""
from __future__ import annotations

import os
import time
from collections import defaultdict

DEFAULT_CACHE_DIR = "/tmp/jaxcache"

#: module-name -> [count, total_seconds] of real backend compiles observed
#: by track_compiles() in this process (cache hits do NOT appear here).
COMPILES = defaultdict(lambda: [0, 0.0])

#: persistent-cache hits observed by track_compiles():
#: {"hits": n, "saved_s": compile seconds avoided, "retrieval_s": time
#: spent deserializing cached executables}
CACHE_HITS = {"hits": 0, "saved_s": 0.0, "retrieval_s": 0.0}

_enabled = False
_tracking = False


def enable(path=None, min_compile_secs=None):
    """Point jax's persistent compilation cache at ``path`` (default: the
    JAX_COMPILATION_CACHE_DIR env var, else /tmp/jaxcache) via
    ``jax.config.update`` — the only mechanism jax 0.9 honors. Returns the
    effective cache dir or None when disabled. Never overrides a cache dir
    the user already configured through jax.config."""
    global _enabled
    if os.environ.get("DETEX_TPU_COMPILE_CACHE", "1") == "0":
        return None
    import jax
    from jax._src import config as _jcfg
    cur = _jcfg.compilation_cache_dir.value
    if cur:
        _enabled = True
        return cur
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or DEFAULT_CACHE_DIR
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        if min_compile_secs is None:
            env = os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
            min_compile_secs = float(env) if env else 2.0
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # pragma: no cover - never break import on a config
        return None
    _enabled = True
    return path


def track_compiles():
    """Instrument jax so every REAL backend compile (not cache hits) is
    timed into :data:`COMPILES` keyed by module name, and persistent-cache
    hits are counted into :data:`CACHE_HITS`. Idempotent. This is the
    measurement tool behind the CONFIG5 attribution table (PERF.md round
    5): compile wall vs execution wall, per program."""
    global _tracking
    if _tracking:
        return
    _tracking = True
    from jax._src import compiler as _jcompiler

    orig = _jcompiler.backend_compile_and_load

    def timed(backend, module, *args, **kwargs):
        name = "?"
        try:
            from jax._src.lib.mlir import ir
            name = ir.StringAttr(
                module.operation.attributes["sym_name"]).value
        except Exception:
            pass
        t0 = time.perf_counter()
        try:
            return orig(backend, module, *args, **kwargs)
        finally:
            dt = time.perf_counter() - t0
            COMPILES[name][0] += 1
            COMPILES[name][1] += dt

    _jcompiler.backend_compile_and_load = timed

    try:
        from jax._src import monitoring as _mon

        def _listener(event, dur, **kw):
            if event == "/jax/compilation_cache/compile_time_saved_sec":
                CACHE_HITS["hits"] += 1
                CACHE_HITS["saved_s"] += float(dur)
            elif event == "/jax/compilation_cache/cache_retrieval_time_sec":
                CACHE_HITS["retrieval_s"] += float(dur)

        _mon.register_event_duration_secs_listener(_listener)
    except Exception:  # pragma: no cover
        pass


def compile_report():
    """(total_compiles, total_seconds, rows) where rows are
    (module_name, count, seconds) sorted by cost."""
    rows = sorted(((k, v[0], round(v[1], 2)) for k, v in COMPILES.items()),
                  key=lambda r: -r[2])
    total_n = sum(v[0] for v in COMPILES.values())
    total_s = sum(v[1] for v in COMPILES.values())
    return total_n, round(total_s, 2), rows
