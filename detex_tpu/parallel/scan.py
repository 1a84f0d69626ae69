"""
Sharded continuous-data scan: the multi-chip performance path.

Chunks of multiplexed continuous data are sharded across the mesh's
``chunks`` axis with ``shard_map``; each device runs the fused DS bank
kernel over its chunks, bins its DS values, and extracts fixed-capacity
trigger lists. Only a ``psum`` of the histograms crosses the ICI; trigger
lists stay chunk-sharded and are gathered by the host at the end
(SURVEY.md section 2: the DS computation itself needs no cross-chip
communication).
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from detex_tpu.ops import ds as _ds
from detex_tpu.ops import triggers as _triggers

DEFAULT_BINS = np.linspace(0, 1, 401)

# ---------------------------------------------------------------------------
# Kernel-route observability: every scan entry point records which kernel
# route it dispatched (fused-net / fused-sub / fold / blocked-fold /
# blocked-fused-net / plain, plus sharded/devicePrep markers) in this public
# counter and logs each NEW route once. Tests and __graft_entry__ read the
# counter instead of lru_cache archaeology (VERDICT round-3 weak #4).
# ---------------------------------------------------------------------------
from collections import Counter

ROUTE_COUNTS = Counter()
_ROUTES_LOGGED = set()


def route_name(route, mode):
    """Human-readable kernel route from _os_fold_route's (route, mode)."""
    fp = "+fusedprep" if (mode or "").endswith("+fp") else ""
    mode = (mode or "")[:3] or None
    if route == "fold":
        return {"net": "fused-net", "sub": "fused-sub"}.get(mode,
                                                            "fold") + fp
    if route == "blocked":
        return ("blocked-fused-net" if mode == "net"
                else "blocked-fold") + fp
    return "plain"


def _note_route(name, sharded=False, device_prep=False):
    """Count + log (once per unique route string) the kernel route an
    engine scan dispatched."""
    if sharded:
        name += "+sharded"
    if device_prep:
        name += "+devicePrep"
    ROUTE_COUNTS[name] += 1
    if name not in _ROUTES_LOGGED:
        _ROUTES_LOGGED.add(name)
        import detex_tpu
        detex_tpu.log(__name__, "scan kernel route: %s" % name, pri=True)
    return name


def engine_mesh():
    """
    The mesh the production detection engine shards its chunk batches over:
    a 1-D mesh across all local devices when more than one is present
    (disable with ``DETEX_TPU_MESH=0``), else None (single-device path).
    """
    if os.environ.get("DETEX_TPU_MESH", "1") == "0":
        return None
    devs = jax.devices()
    if len(devs) < 2:
        return None
    from detex_tpu.parallel.mesh import make_mesh
    return make_mesh()


def _pad_batch(n_dev, X, nv):
    """Round the chunk batch up to a multiple of the mesh size with
    zero-length (fully masked) chunks; returns (Xp, nvp, B_orig)."""
    B = X.shape[0]
    Bp = -(-B // n_dev) * n_dev
    if Bp == B:
        return X, nv, B
    Xp = np.zeros((Bp,) + X.shape[1:], X.dtype)
    Xp[:B] = X
    nvp = np.zeros(Bp, nv.dtype)
    nvp[:B] = nv
    return Xp, nvp, B


def _require_host_array(X, fn_name):
    """Refuse device-resident chunk batches on the sharded entry points:
    they are padded/resharded on host here, and a device array would be
    silently pulled back through the (slow) device->host tunnel — the same
    contract scan_chunks documents for the single-device path."""
    if isinstance(X, jax.Array) and not isinstance(X, np.ndarray):
        if any(d.platform != "cpu" for d in X.devices()):
            raise TypeError(
                "%s requires host (numpy) chunk arrays: a device-resident "
                "batch would be transferred device->host here (25 MB/s "
                "through the TPU tunnel). Pass the numpy source array "
                "instead." % fn_name)


def _hist_counts(ds, bins):
    """np.histogram-compatible device binning via sort + edge search
    (compiles and runs far better on TPU than scatter-add)."""
    s = jnp.sort(ds)
    lo = jnp.searchsorted(s, bins[:-1], side="left")
    hi_last = jnp.searchsorted(s, bins[-1], side="right")
    pos = jnp.concatenate([lo, hi_last[None]])
    return jnp.diff(pos).astype(jnp.int32)


def _uniform_nbin(bins):
    """nbin if ``bins`` are the uniform [0, 1] edges the pallas counting
    histogram supports (perfect-square bin count), else 0."""
    b = np.asarray(bins)
    n = len(b) - 1
    g = int(round(n ** 0.5))
    if g * g != n:
        return 0
    if not np.allclose(b, np.linspace(0.0, 1.0, n + 1), atol=1e-9):
        return 0
    return n


def _hist_rows(ds, bins, uniform_nbin):
    """Per-row histogram of ds [s, L]: the MXU counting kernel on TPU for
    uniform bins (the row sort dominates scan cost at large banks), else
    the sort+searchsorted path."""
    if uniform_nbin and _ds._use_pallas():
        from detex_tpu.ops.pallas_kernels import hist_uniform
        return hist_uniform(ds, nbin=uniform_nbin).astype(jnp.int32)
    return jax.vmap(lambda v: _hist_counts(v, bins))(ds)


def _bank_arrays(bank):
    """The device arrays of a bank (leading pytree args for jit), with the
    template axis pre-blocked (host-side, cached on the bank dict) when the
    bank exceeds TEMPLATE_BLOCK detectors — in-jit padding would copy the
    whole spectra bank per chunk call."""
    raw = (bank["Ufd2"], bank["sum_u"], bank["d_mask"]) \
        if bank.get("demux") else \
        (bank["Ufd"], bank["sum_u"], bank["d_mask"])
    S = raw[0].shape[0]
    if S <= TEMPLATE_BLOCK:
        return raw
    if "_blocked_arrs" not in bank:
        SB = TEMPLATE_BLOCK
        Sp = -(-S // SB) * SB
        bank["_blocked_arrs"] = tuple(
            jnp.pad(a, [(0, Sp - S)] + [(0, 0)] * (a.ndim - 1))
            .reshape((Sp // SB, SB) + a.shape[1:]) for a in raw)
    return bank["_blocked_arrs"]


def _specds_arrs(bank, blocked):
    """(ur, ui, sum_u, d_mask) device arrays for the fused spec->DS
    kernel (ops/ds.py bank_spec_pair; ur/ui are basis-dim-major
    [Dmax, S, nc, Rp]); ``blocked`` pads/reshapes the template axis to
    [nB, ..., TEMPLATE_BLOCK, ...] (cached on the bank) — the template
    axis is axis 1 for ur/ui, axis 0 for sum_u/d_mask."""
    from detex_tpu.ops.pallas_kernels import spec_udtype
    udt = spec_udtype()
    ur, ui = _ds.bank_spec_pair(bank, udt)
    raw = (ur, ui, bank["sum_u"], bank["d_mask"])
    if not blocked:
        return raw
    bkey = ("_specds_blocked" if udt == "f32"
            else "_specds_blocked_" + udt)
    if bkey not in bank:
        SB = TEMPLATE_BLOCK
        S = raw[2].shape[0]
        Sp = -(-S // SB) * SB

        def blk(a, axis):
            pad = [(0, 0)] * a.ndim
            pad[axis] = (0, Sp - S)
            a = jnp.pad(a, pad)
            a = jnp.moveaxis(a, axis, 0)
            a = a.reshape((Sp // SB, SB) + a.shape[1:])
            # restore the block-local layout: [nB, ...axis-at-original...]
            return jnp.moveaxis(a, 1, axis + 1)

        bank[bkey] = (blk(ur, 1), blk(ui, 1),
                      blk(raw[2], 0), blk(raw[3], 0))
    return bank[bkey]


def _blocked_thresholds(bank, thresholds):
    """Thresholds shaped to match _bank_arrays' blocking ([nB, SB] with the
    pad slots at +inf, or flat [S])."""
    thresholds = np.asarray(thresholds, np.float32)
    S = len(thresholds)
    if S <= TEMPLATE_BLOCK:
        return jnp.asarray(thresholds)
    SB = TEMPLATE_BLOCK
    Sp = -(-S // SB) * SB
    th = np.full(Sp, np.inf, np.float32)
    th[:S] = thresholds
    return jnp.asarray(th.reshape(Sp // SB, SB))


def _bank_statics(bank, nc):
    if bank.get("os"):
        return dict(demux="os", n_c=bank["n_c"], nc=int(nc),
                    nfft=bank["blk_fft"],
                    S=int(bank["sum_u"].shape[0]))
    if bank.get("demux"):
        return dict(demux=True, n_c=bank["n_c"], nc=int(nc),
                    nfft=bank["nfft2"], S=int(bank["sum_u"].shape[0]))
    return dict(demux=False, n_c=bank["n"], nc=int(nc), nfft=bank["nfft"],
                S=int(bank["sum_u"].shape[0]))


def _ds_of(x, arrs, demux, n_c, nc, nfft):
    if demux == "os":
        return _ds.ds_bank_demux_os(x, arrs[0], arrs[1], arrs[2], n_c, nc,
                                    nfft)
    if demux:
        return _ds.ds_bank_demux(x, arrs[0], arrs[1], arrs[2], n_c, nc,
                                 nfft)
    return _ds.ds_bank(x, arrs[0], arrs[1], arrs[2], n_c, nc, nfft)


# S-axis block bounding the per-chunk HBM footprint (env-overridable for
# perf sweeps; every block iteration costs ~25 fixed-overhead op
# executions on this backend, so fewer/bigger blocks can win when HBM
# allows)
TEMPLATE_BLOCK = int(os.environ.get("DETEX_TPU_TEMPLATE_BLOCK", "128"))

# above this DS length the trigger extractor switches to the block-max
# pyramid (same outputs; the flat scan's [S, L] carry dominates HBM traffic
# at large template counts)
PYRAMID_MIN_LEN = 4096


def _extract(v, t, buff_samps, max_trig):
    if v.shape[0] >= PYRAMID_MIN_LEN:
        return _triggers.extract_triggers_pyramid(v, t, buff_samps,
                                                  max_triggers=max_trig)
    return _triggers.extract_triggers_topk(v, t, buff_samps,
                                           max_triggers=max_trig)


def _chunk_fn(x, nv, arrs, thresholds, bins, demux, n_c, nc, nfft,
              buff_samps, max_trig, S, calc_hist=True, uniform_nbin=0,
              calc_triggers=True):
    """Process one chunk: DS for the whole bank + hist + triggers.
    ``nv`` is the number of valid DS samples (windows fully inside real
    data — ragged chunks are zero-padded to the bank's pad_len and the pad
    windows are masked out here).

    ``arrs`` is either a flat bank (small S) or pre-blocked
    [nB, TEMPLATE_BLOCK, ...] arrays from _bank_arrays (large
    matched-filter banks): blocks are processed with lax.map so complex
    spectra / irFFT intermediates stay bounded — a 1000-template bank
    would otherwise exhaust HBM on a single chip. ``S`` is the true
    (unpadded) detector count."""

    def _hist_of(ds):
        if calc_hist:
            return _hist_rows(ds, bins, uniform_nbin)
        return jnp.zeros((ds.shape[0], bins.shape[0] - 1), jnp.int32)

    def finish(ds, th):
        pos = jnp.arange(ds.shape[-1])
        ds = jnp.where(pos[None, :] < nv, ds, -jnp.inf)
        hist = _hist_of(ds)
        maxds = jnp.max(ds, axis=-1)                           # [s]
        if not calc_triggers:
            s = ds.shape[0]
            nt = _no_trig(1, s)
            return hist, maxds, nt[0][0], nt[1][0], nt[2][0]

        def trig_one(v, t):
            idx, cnt = _extract(v, t, buff_samps, max_trig)
            vals = jnp.where(idx >= 0, v[jnp.clip(idx, 0, v.shape[0] - 1)],
                             jnp.nan)
            return idx, vals, cnt

        tidx, tval, tcnt = jax.vmap(trig_one)(ds, th)
        return hist, maxds, tidx, tval, tcnt

    def finish_os(ds, pyr, th, fused_hist=None):
        """OS path: mask + pyramid + global max come fused from the DS
        kernel (ds is full block width, pad positions already -inf);
        ``fused_hist`` carries the histogram when the finalize kernel
        accumulated it in-pass (no separate counting sweep)."""
        if fused_hist is not None and calc_hist:
            hist = fused_hist.astype(jnp.int32)
        else:
            hist = _hist_of(ds)
        maxds = jnp.max(pyr, axis=-1)
        if not calc_triggers:
            s = ds.shape[0]
            nt = _no_trig(1, s)
            return hist, maxds, nt[0][0], nt[1][0], nt[2][0]

        def trig_one(v, pm, t):
            idx, cnt = _triggers.extract_triggers_pyramid_pm(
                v, pm, t, buff_samps, max_triggers=max_trig)
            vals = jnp.where(idx >= 0, v[jnp.clip(idx, 0, v.shape[0] - 1)],
                             jnp.nan)
            return idx, vals, cnt

        tidx, tval, tcnt = jax.vmap(trig_one)(ds, pyr, th)
        return hist, maxds, tidx, tval, tcnt

    if demux == "os":
        # chunk-shared prep (stats + windows + forward transform) hoisted
        # out of the template-block loop: XLA does not hoist it out of
        # the lax.map below, and at 8 blocks that is 8x the shared work
        osF, os_a, os_pw = _ds.os_prep(x, n_c, nc, nfft)
        os_Lc = x.shape[0] // nc

    def run_one(blk_arrs, th):
        if demux == "os":
            nbin = uniform_nbin if calc_hist else 0
            ds, pyr, fh = _ds.os_block_scan(
                osF, os_a, os_pw, blk_arrs[0], blk_arrs[1], blk_arrs[2],
                n_c, nc, nfft, os_Lc, nv, nbin=nbin)
            return finish_os(ds, pyr, th, fused_hist=fh)
        return finish(_ds_of(x, blk_arrs, demux, n_c, nc, nfft), th)

    blocked = arrs[2].ndim == 3  # d_mask [nB, SB, Dmax] when pre-blocked
    if not blocked:
        return run_one(arrs, thresholds)

    def one_block(args):
        return run_one(args[:-1], args[-1])

    hist, maxds, tidx, tval, tcnt = jax.lax.map(
        one_block, arrs + (thresholds,))
    cat = lambda a: a.reshape((-1,) + a.shape[2:])[:S]          # noqa
    return cat(hist), cat(maxds), cat(tidx), cat(tval), cat(tcnt)


def _fold_scan_ok(bank, st, X, calc_hist, bins_uniform_nbin):
    """Route to the fold-batch scan when the bank is overlap-save,
    unblocked, the fused Pallas finalize supports the config, and the
    histogram (if requested) is uniform-bin (fused into the finalize)."""
    if st["demux"] != "os" or st["S"] > TEMPLATE_BLOCK:
        return False
    if not bins_uniform_nbin:   # hist width comes from the uniform bins
        return False
    B = int(X.shape[0])
    Dmax = int(bank["Dmax"])
    L_c = int(X.shape[1]) // st["nc"]
    _, _, _, W, m = _ds._os_geometry(L_c, st["n_c"], st["nfft"])
    if _ds.spec_ds_mode(B, st["S"], Dmax, st["n_c"], st["nc"],
                        st["nfft"]):
        # fused spec->DS kernel: no cb/spectra intermediates — only the
        # DS output itself needs to fit (plus inputs; ~6 GB ceiling on a
        # 16 GB chip)
        return B * st["S"] * m * W * 4 <= (6 << 30)
    # HBM guard: the folded irfft intermediate is [B, S, Dmax, m, blk]
    # f32 (plus a complex spectra array twice that size)
    if B * st["S"] * Dmax * m * st["nfft"] * 4 > (2 << 30):
        return False
    return _ds.fold_scan_supported(B, st["S"], Dmax, st["n_c"], st["nfft"])


def _no_trig(B, S):
    """Zero-capacity trigger outputs for calc_triggers=False (the engine
    gates on maxima and re-verifies host-side; it never reads these)."""
    return (jnp.zeros((B, S, 0), jnp.int32), jnp.zeros((B, S, 0)),
            jnp.zeros((B, S), jnp.int32))


def _fold_chunks_fn(X, NV, arrs, thresholds, n_c, nc, blk_fft, buff_samps,
                    max_trig, S, calc_hist, uniform_nbin, specds_mode=None,
                    calc_triggers=True):
    """Fold-batch OS scan body: every op instance covers the whole chunk
    batch (no lax.map) — see ops/ds.py os_prep_batch. Outputs match
    _chunk_fn's contract: (hist [S, nbins] summed over chunks,
    maxds [B, S], tidx [B, S, K], tval, tcnt).

    With ``specds_mode`` ("net"/"sub") the whole spec->DS pipeline runs in
    the single fused Pallas kernel (ops/pallas_kernels.spec_ds_fold);
    ``arrs`` is then (ur, ui, sum_u, d_mask) from _specds_arrs. In "sub"
    mode the kernel's rows are (template, chunk)-ordered — only the small
    summary arrays are transposed back, never the DS array itself.

    ``calc_triggers=False`` (the production engine's summary-only scan)
    skips the per-row trigger extraction entirely AND — on the fused
    path — runs the kernel with a VMEM-scratch accumulator so the
    [B*S, m*W] DS array never reaches HBM; trigger outputs come back with
    zero capacity."""
    B = X.shape[0]
    L_c = X.shape[1] // nc
    nbin = uniform_nbin if calc_hist else 0

    def trig_one(v, pm, t):
        idx, cnt = _triggers.extract_triggers_pyramid_pm(
            v, pm, t, buff_samps, max_triggers=max_trig)
        vals = jnp.where(idx >= 0, v[jnp.clip(idx, 0, v.shape[0] - 1)],
                         jnp.nan)
        return idx, vals, cnt

    if specds_mode:
        fp = specds_mode.endswith("+fp")
        mode = specds_mode[:3]
        prep = _ds.os_prep_batch_fused if fp else _ds.os_prep_batch_pair
        Fr, Fi, a, power = prep(X, n_c, nc, blk_fft)
        dsf, pyrf, hist = _ds.os_scan_batch_fused(
            Fr, Fi, a, power, arrs[0], arrs[1], arrs[2], arrs[3],
            mode, n_c, nc, blk_fft, L_c, NV, nbin=nbin,
            emit_ds=calc_triggers)
        sub = mode == "sub"
        if sub:   # rows (s, b): transpose only the summaries
            thf = jnp.broadcast_to(thresholds[:, None], (S, B)).reshape(-1)
            tr = lambda x: jnp.swapaxes(                       # noqa: E731
                x.reshape((S, B) + x.shape[1:]), 0, 1)
        else:     # rows (b, s)
            thf = jnp.broadcast_to(thresholds[None, :], (B, S)).reshape(-1)
            tr = lambda x: x.reshape((B, S) + x.shape[1:])     # noqa: E731
        maxds = tr(pyrf.max(axis=-1))
        if calc_hist:
            hist_tot = (hist.reshape(S, B, nbin).sum(axis=1) if sub else
                        hist.reshape(B, S, nbin).sum(axis=0))
            hist_tot = hist_tot.astype(jnp.int32)
        else:
            hist_tot = jnp.zeros((S, uniform_nbin), jnp.int32)
        if not calc_triggers:
            return (hist_tot, maxds) + _no_trig(B, S)
        tidx, tval, tcnt = jax.vmap(trig_one)(dsf, pyrf, thf)
        return hist_tot, maxds, tr(tidx), tr(tval), tr(tcnt)

    F, a, power = _ds.os_prep_batch(X, n_c, nc, blk_fft)
    ds, pyr, hist = _ds.os_block_scan_batch(
        F, a, power, arrs[0], arrs[1], arrs[2], n_c, nc, blk_fft, L_c, NV,
        nbin=nbin)
    maxds = pyr.max(axis=-1)                            # [B, S]
    if calc_hist:
        hist_tot = hist.sum(axis=0).astype(jnp.int32)   # [S, nbin]
    else:
        hist_tot = jnp.zeros((S, uniform_nbin), jnp.int32)
    if not calc_triggers:
        return (hist_tot, maxds) + _no_trig(B, S)
    dsf = ds.reshape(B * S, -1)
    pyrf = pyr.reshape(B * S, -1)
    thf = jnp.broadcast_to(thresholds[None, :], (B, S)).reshape(B * S)
    tidx, tval, tcnt = jax.vmap(trig_one)(dsf, pyrf, thf)
    K = tidx.shape[-1]
    return (hist_tot, maxds, tidx.reshape(B, S, K), tval.reshape(B, S, K),
            tcnt.reshape(B, S))


@partial(jax.jit, static_argnames=("n_c", "nc", "blk_fft", "buff_samps",
                                   "max_trig", "S", "calc_hist",
                                   "uniform_nbin", "specds_mode",
                                   "calc_triggers"))
def _scan_chunks_fold_jit(X, NV, arrs, thresholds, n_c, nc, blk_fft,
                          buff_samps, max_trig, S, calc_hist=True,
                          uniform_nbin=0, specds_mode=None,
                          calc_triggers=True):
    return _fold_chunks_fn(X, NV, arrs, thresholds, n_c, nc, blk_fft,
                           buff_samps, max_trig, S, calc_hist, uniform_nbin,
                           specds_mode, calc_triggers)


def _fold_scan_blocked_ok(bank, st, X, bins_uniform_nbin):
    """Route large (template-blocked) banks to the fold-batch path when
    the per-template-block fold is supported: the chunk batch folds into
    each op while lax.map runs over template blocks only."""
    if st["demux"] != "os" or st["S"] <= TEMPLATE_BLOCK:
        return False
    if not bins_uniform_nbin:
        return False
    B = int(X.shape[0])
    Dmax = int(bank["Dmax"])
    L_c = int(X.shape[1]) // st["nc"]
    _, _, _, W, m = _ds._os_geometry(L_c, st["n_c"], st["nfft"])
    if _ds.spec_ds_mode(B, TEMPLATE_BLOCK, Dmax, st["n_c"], st["nc"],
                        st["nfft"]) == "net":
        # fused kernel: only the per-block DS output must fit
        return B * TEMPLATE_BLOCK * m * W * 4 <= (6 << 30)
    if B * TEMPLATE_BLOCK * Dmax * m * st["nfft"] * 4 > (2 << 30):
        return False
    return _ds.fold_scan_supported(B, TEMPLATE_BLOCK, Dmax, st["n_c"],
                                   st["nfft"])


def _fold_chunks_blocked_fn(X, NV, arrs, thresholds, n_c, nc, blk_fft,
                            buff_samps, max_trig, S, calc_hist,
                            uniform_nbin, specds_mode=None,
                            calc_triggers=True):
    """Fold-batch scan for template-blocked banks: the chunk-shared prep
    runs once for the whole batch, then lax.map over template blocks,
    each block processing ALL chunks with folded ops (per-chunk grouped
    stats in the Pallas finalize — no lax.map over chunks at all).

    With ``specds_mode`` == "net" each block runs the fully fused
    spec->DS kernel; ``arrs`` is then the blocked
    (ur, ui, sum_u, d_mask) tuple from _specds_arrs.
    ``calc_triggers=False``: summary-only (see _fold_chunks_fn) — on the
    fused path the per-block [B*SB, m*W] DS never reaches HBM."""
    B = X.shape[0]
    L_c = X.shape[1] // nc
    nbin = uniform_nbin if calc_hist else 0
    if specds_mode:
        prep = (_ds.os_prep_batch_fused if specds_mode.endswith("+fp")
                else _ds.os_prep_batch_pair)
        Fr, Fi, a, power = prep(X, n_c, nc, blk_fft)
        SB = arrs[3].shape[1]
    else:
        F, a, power = _ds.os_prep_batch(X, n_c, nc, blk_fft)
        SB = arrs[2].shape[1]

    def one_block(args):
        if specds_mode:
            ur, ui, su, dm, th = args
            ds, pyr, hist = _ds.os_scan_batch_fused(
                Fr, Fi, a, power, ur, ui, su, dm, "net", n_c, nc,
                blk_fft, L_c, NV, nbin=nbin, emit_ds=calc_triggers)
            # flat rows (b, s) — reshape-only back to [B, SB, ...]
            if ds is not None:
                ds = ds.reshape(B, SB, -1)
            pyr = pyr.reshape(B, SB, -1)
            if hist is not None:
                hist = hist.reshape(B, SB, nbin)
        else:
            Ufd2, su, dm, th = args
            ds, pyr, hist = _ds.os_block_scan_batch(
                F, a, power, Ufd2, su, dm, n_c, nc, blk_fft, L_c, NV,
                nbin=nbin)
        maxds = pyr.max(axis=-1)                      # [B, SB]
        if calc_hist:
            h = hist.sum(axis=0).astype(jnp.int32)    # [SB, nbin]
        else:
            h = jnp.zeros((SB, uniform_nbin), jnp.int32)
        if not calc_triggers:
            return (h, maxds) + _no_trig(B, SB)
        dsf = ds.reshape(B * SB, -1)
        pyrf = pyr.reshape(B * SB, -1)
        thf = jnp.broadcast_to(th[None, :], (B, SB)).reshape(B * SB)

        def trig_one(v, pm, t):
            idx, cnt = _triggers.extract_triggers_pyramid_pm(
                v, pm, t, buff_samps, max_triggers=max_trig)
            vals = jnp.where(idx >= 0, v[jnp.clip(idx, 0, v.shape[0] - 1)],
                             jnp.nan)
            return idx, vals, cnt

        tidx, tval, tcnt = jax.vmap(trig_one)(dsf, pyrf, thf)
        K = tidx.shape[-1]
        return (h, maxds, tidx.reshape(B, SB, K), tval.reshape(B, SB, K),
                tcnt.reshape(B, SB))

    hist, maxds, tidx, tval, tcnt = jax.lax.map(
        one_block, arrs + (thresholds,))
    hist = hist.reshape(-1, hist.shape[-1])[:S]       # [S, nbin]

    def catb(x):
        # [nB, B, SB, ...] -> [B, nB*SB, ...][:, :S]  (explicit sizes: a
        # -1 here divides by zero on the zero-capacity trigger arrays)
        x = jnp.moveaxis(x, 0, 1)
        x = x.reshape((x.shape[0], x.shape[1] * x.shape[2]) + x.shape[3:])
        return x[:, :S]

    return hist, catb(maxds), catb(tidx), catb(tval), catb(tcnt)


@partial(jax.jit, static_argnames=("n_c", "nc", "blk_fft", "buff_samps",
                                   "max_trig", "S", "calc_hist",
                                   "uniform_nbin", "specds_mode",
                                   "calc_triggers"))
def _scan_chunks_fold_blocked_jit(X, NV, arrs, thresholds, n_c, nc,
                                  blk_fft, buff_samps, max_trig, S,
                                  calc_hist=True, uniform_nbin=0,
                                  specds_mode=None, calc_triggers=True):
    return _fold_chunks_blocked_fn(X, NV, arrs, thresholds, n_c, nc,
                                   blk_fft, buff_samps, max_trig, S,
                                   calc_hist, uniform_nbin, specds_mode,
                                   calc_triggers)


@partial(jax.jit, static_argnames=("demux", "n_c", "nc", "nfft",
                                   "buff_samps", "max_trig", "S",
                                   "calc_hist", "uniform_nbin",
                                   "calc_triggers"))
def _scan_chunks_jit(X, NV, arrs, thresholds, bins, demux, n_c, nc, nfft,
                     buff_samps, max_trig, S, calc_hist=True,
                     uniform_nbin=0, calc_triggers=True):
    f = lambda xn: _chunk_fn(xn[0], xn[1], arrs, thresholds, bins,  # noqa
                             demux, n_c, nc, nfft, buff_samps, max_trig, S,
                             calc_hist, uniform_nbin, calc_triggers)
    # lax.map (not vmap): compiles the chunk body once — these are
    # million-sample chunks, so batching buys no fusion but multiplies the
    # program size (and remote compile time) by B
    hist, maxds, tidx, tval, tcnt = jax.lax.map(f, (X, NV))
    return hist.sum(axis=0), maxds, tidx, tval, tcnt


def _valid_lens(bank, nc, X, valid_lens):
    """Per-chunk count of valid DS samples (windows fully inside real
    data). Must never exceed the true output length — the OS scan path
    carries full block-grid width and masks on this."""
    n = bank["n"]
    if valid_lens is None:
        valid_lens = [X.shape[1]] * X.shape[0]
    return np.asarray([(int(v) - n) // nc + 1 for v in valid_lens],
                      np.int32)


def _os_fold_route(bank, st, B, Lc_mux, calc_hist, unb, thresholds):
    """Shared kernel routing for overlap-save banks (single source of
    truth for scan_chunks, scan_chunks_sharded and the sharded devicePrep
    path — the same config must pick the same kernel everywhere the
    parity tests cover).

    Returns (route, specds_mode, arrs, thresholds_dev):
      route "fold"    — unblocked fold-batch scan (_fold_chunks_fn)
      route "blocked" — template-blocked fold (_fold_chunks_blocked_fn)
      route None      — per-chunk lax.map path (_chunk_fn)

    Non-overlap-save banks fall straight through to the None route (the
    fold predicates gate on demux == "os"), so callers need no guard.
    """
    Xp = np.broadcast_to(np.float32(0), (B, Lc_mux))   # shape probe only

    def fp(mode):
        # fused-prep routing rides the static mode string ("net+fp") so
        # the decision stays OUTSIDE jit (an env read inside the traced
        # body would be baked into the first trace and poison the cache)
        if mode and _ds.fwd_prep_ok(st["n_c"], st["nc"], st["nfft"]):
            return mode + "+fp"
        return mode

    if _fold_scan_ok(bank, st, Xp, calc_hist, unb):
        mode = _ds.spec_ds_mode(B, st["S"], int(bank["Dmax"]),
                                st["n_c"], st["nc"], st["nfft"])
        arrs = _specds_arrs(bank, False) if mode else _bank_arrays(bank)
        return "fold", fp(mode), arrs, jnp.asarray(thresholds, jnp.float32)
    if _fold_scan_blocked_ok(bank, st, Xp, unb):
        mode = _ds.spec_ds_mode(B, TEMPLATE_BLOCK, int(bank["Dmax"]),
                                st["n_c"], st["nc"], st["nfft"])
        mode = mode if mode == "net" else None  # blocked rows are (b, s)
        arrs = _specds_arrs(bank, True) if mode else _bank_arrays(bank)
        return ("blocked", fp(mode), arrs,
                _blocked_thresholds(bank, thresholds))
    return (None, None, _bank_arrays(bank),
            _blocked_thresholds(bank, thresholds))


def scan_chunks(X, bank, thresholds, nc, buff_samps, bins=None, max_trig=64,
                valid_lens=None, mesh=None, calc_hist=True,
                calc_triggers=True, _device_prep=False):
    """Batched scan: X [B, Lc] -> (hist, maxds, trig...).
    ``valid_lens`` (optional, [B]) gives each chunk's true multiplexed
    sample count when rows are zero-padded. With ``mesh`` the batch is
    chunk-sharded across the mesh (padded to a multiple of its size).
    ``calc_hist=False`` skips the per-detector DS histogram (its row sort
    is a large share of scan cost at big banks); hist returns zeros.
    ``calc_triggers=False`` (the production engine's mode — it gates on
    maxima and re-verifies triggered chunks host-side) skips the device
    trigger extraction; trigger outputs come back zero-capacity
    ([B, S, 0] / zero counts), and on the fused spec->DS path the DS
    array itself never reaches HBM (summary-only kernel).

    Histogram backend note: uniform [0, 1] bins on TPU use the floor-rule
    Pallas counting kernel, CPU/non-uniform bins use sort+searchsorted;
    counts can differ by +/-1 at bin edges — canonical statement in
    PARITY.md ("uniform-bin DS histograms on TPU")."""
    if mesh is not None and mesh.size > 1:
        return scan_chunks_sharded(mesh, X, bank, thresholds, nc, buff_samps,
                                   bins=bins, max_trig=max_trig,
                                   valid_lens=valid_lens,
                                   calc_hist=calc_hist,
                                   calc_triggers=calc_triggers)
    if bins is None:
        bins = DEFAULT_BINS
    st = _bank_statics(bank, nc)
    # NOTE: X may be a device array — never np.asarray it here (a full
    # device->host transfer through the TPU tunnel); only shapes are needed
    nv = _valid_lens(bank, nc, X, valid_lens)
    unb = _uniform_nbin(bins)
    route, mode, arrs, th = _os_fold_route(
        bank, st, int(X.shape[0]), int(X.shape[1]), calc_hist, unb,
        thresholds)
    _note_route(route_name(route, mode), device_prep=_device_prep)
    if route == "fold":
        return _scan_chunks_fold_jit(
            jnp.asarray(X, jnp.float32), jnp.asarray(nv), arrs, th,
            st["n_c"], st["nc"], st["nfft"], int(buff_samps),
            int(max_trig), st["S"], bool(calc_hist), unb,
            specds_mode=mode, calc_triggers=bool(calc_triggers))
    if route == "blocked":
        return _scan_chunks_fold_blocked_jit(
            jnp.asarray(X, jnp.float32), jnp.asarray(nv), arrs, th,
            st["n_c"], st["nc"], st["nfft"], int(buff_samps),
            int(max_trig), st["S"], bool(calc_hist), unb,
            specds_mode=mode, calc_triggers=bool(calc_triggers))
    return _scan_chunks_jit(jnp.asarray(X, jnp.float32), jnp.asarray(nv),
                            arrs, th,
                            jnp.asarray(bins, jnp.float32), st["demux"],
                            st["n_c"], st["nc"], st["nfft"],
                            int(buff_samps), int(max_trig), st["S"],
                            bool(calc_hist), unb, bool(calc_triggers))


def _chunk_fn_raw(xc, Lv, H, arrs, thresholds, bins, n_c, nc, nfft,
                  buff_samps, max_trig, dec=1, calc_hist=True,
                  uniform_nbin=0, calc_triggers=True):
    """Raw-channel variant of _chunk_fn with fused device preprocessing."""
    from detex_tpu.ops.prep import ds_bank_demux_raw
    ds = ds_bank_demux_raw(xc, Lv, H, arrs[0], arrs[1], arrs[2], n_c, nc,
                           nfft, dec)
    nv = (Lv // dec) - n_c + 1
    pos = jnp.arange(ds.shape[-1])
    ds = jnp.where(pos[None, :] < nv, ds, -jnp.inf)
    if calc_hist:
        hist = _hist_rows(ds, bins, uniform_nbin)
    else:
        hist = jnp.zeros((ds.shape[0], bins.shape[0] - 1), jnp.int32)
    maxds = jnp.max(ds, axis=-1)
    if not calc_triggers:
        s = ds.shape[0]
        nt = _no_trig(1, s)
        return hist, maxds, nt[0][0], nt[1][0], nt[2][0]

    def trig_one(v, th):
        idx, cnt = _extract(v, th, buff_samps, max_trig)
        vals = jnp.where(idx >= 0, v[jnp.clip(idx, 0, v.shape[0] - 1)],
                         jnp.nan)
        return idx, vals, cnt

    tidx, tval, tcnt = jax.vmap(trig_one)(ds, thresholds)
    return hist, maxds, tidx, tval, tcnt


@partial(jax.jit, static_argnames=("n_c", "nc", "nfft", "buff_samps",
                                   "max_trig", "dec", "calc_hist",
                                   "uniform_nbin", "calc_triggers"))
def _scan_chunks_raw_jit(Xc, LV, H, arrs, thresholds, bins, n_c, nc, nfft,
                         buff_samps, max_trig, dec, calc_hist=True,
                         uniform_nbin=0, calc_triggers=True):
    f = lambda xn: _chunk_fn_raw(xn[0], xn[1], H, arrs, thresholds,  # noqa
                                 bins, n_c, nc, nfft, buff_samps, max_trig,
                                 dec, calc_hist, uniform_nbin,
                                 calc_triggers)
    hist, maxds, tidx, tval, tcnt = jax.lax.map(f, (Xc, LV))
    return hist.sum(axis=0), maxds, tidx, tval, tcnt


def scan_chunks_raw(Xc, lens, H, bank, thresholds, nc, buff_samps,
                    bins=None, max_trig=64, dec=1, mesh=None,
                    calc_hist=True, calc_triggers=True):
    """
    Batched scan from RAW channels with fused device preprocessing
    (detrend + spectral bandpass + optional spectral decimation):
    Xc [B, nc, L_raw] zero-padded channels, lens [B] true per-channel RAW
    sample counts. With ``mesh`` the batch is chunk-sharded across it.
    """
    if mesh is not None and mesh.size > 1:
        return scan_chunks_raw_sharded(mesh, Xc, lens, H, bank, thresholds,
                                       nc, buff_samps, bins=bins,
                                       max_trig=max_trig, dec=dec,
                                       calc_hist=calc_hist,
                                       calc_triggers=calc_triggers)
    if bank.get("os"):
        # overlap-save bank: run the batched device prep (detrend +
        # spectral bandpass + decimation) as its own jit producing
        # multiplexed chunks, then the fold-batch / fused spec->DS scan —
        # the monolithic per-chunk raw kernel below needs full-length
        # spectra and would forfeit the fold path's wins (PERF.md).
        from detex_tpu.ops import prep as _prep
        nfftp = (int(H.shape[0]) - 1) * 2 // int(dec)
        X, _ = _prep.prep_multiplex_batch(
            jnp.asarray(Xc, jnp.float32),
            jnp.asarray(lens, jnp.int32), H, nfftp, int(dec), int(nc))
        lens_mux = [(int(v) // int(dec)) * int(nc) for v in lens]
        return scan_chunks(X, bank, thresholds, nc, buff_samps, bins=bins,
                           max_trig=max_trig, valid_lens=lens_mux,
                           calc_hist=calc_hist, calc_triggers=calc_triggers,
                           _device_prep=True)
    if bins is None:
        bins = DEFAULT_BINS
    if not bank.get("demux"):
        raise ValueError("scan_chunks_raw requires a demuxed bank")
    _note_route("raw-demux", device_prep=True)
    arrs = (bank["Ufd2"], bank["sum_u"], bank["d_mask"])
    return _scan_chunks_raw_jit(
        jnp.asarray(Xc, jnp.float32), jnp.asarray(lens, jnp.int32), H,
        arrs, jnp.asarray(thresholds, jnp.float32),
        jnp.asarray(bins, jnp.float32), bank["n_c"], int(nc),
        bank["nfft2"], int(buff_samps), int(max_trig), int(dec),
        bool(calc_hist), _uniform_nbin(bins), bool(calc_triggers))


@lru_cache(maxsize=None)
def _sharded_scan_fn(mesh, demux, n_c, nc, nfft, buff_samps, max_trig, axis,
                     S, calc_hist=True, uniform_nbin=0, calc_triggers=True):
    """Build (once per static config) the jitted shard_map scan: chunks
    sharded over ``axis``, DS histogram merged with one psum."""

    def shard_body(Xs, NV, arrs, thresholds, bins):
        f = lambda xn: _chunk_fn(xn[0], xn[1], arrs, thresholds,    # noqa
                                 bins, demux, n_c, nc, nfft,
                                 buff_samps, max_trig, S, calc_hist,
                                 uniform_nbin, calc_triggers)
        hist, maxds, tidx, tval, tcnt = jax.lax.map(f, (Xs, NV))
        hist = jax.lax.psum(hist.sum(axis=0), axis)
        return hist, maxds, tidx, tval, tcnt

    fn = shard_map(shard_body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P(), P()),
                   out_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
                   check_vma=False)
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _sharded_scan_fold_fn(mesh, n_c, nc, blk_fft, buff_samps, max_trig,
                          axis, S, calc_hist=True, uniform_nbin=0,
                          specds_mode=None, route="fold",
                          calc_triggers=True):
    """Sharded fold-batch scan: each device folds ITS chunk shard into
    single op instances (route "fold"; route "blocked" runs the
    template-blocked fold — lax.map over template blocks only, the same
    kernels the single-device path picks for S > TEMPLATE_BLOCK);
    histograms merge with one psum."""
    body = (_fold_chunks_blocked_fn if route == "blocked"
            else _fold_chunks_fn)

    def shard_body(Xs, NV, arrs, thresholds):
        hist, maxds, tidx, tval, tcnt = body(
            Xs, NV, arrs, thresholds, n_c, nc, blk_fft, buff_samps,
            max_trig, S, calc_hist, uniform_nbin, specds_mode,
            calc_triggers)
        hist = jax.lax.psum(hist, axis)
        return hist, maxds, tidx, tval, tcnt

    fn = shard_map(shard_body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P()),
                   out_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
                   check_vma=False)
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _sharded_scan_raw_fn(mesh, n_c, nc, nfft, buff_samps, max_trig, dec,
                         axis, calc_hist=True, uniform_nbin=0,
                         calc_triggers=True):
    """Sharded variant of the raw-channel (fused devicePrep) scan."""

    def shard_body(Xs, LV, H, arrs, thresholds, bins):
        f = lambda xn: _chunk_fn_raw(xn[0], xn[1], H, arrs,         # noqa
                                     thresholds, bins, n_c, nc, nfft,
                                     buff_samps, max_trig, dec, calc_hist,
                                     uniform_nbin, calc_triggers)
        hist, maxds, tidx, tval, tcnt = jax.lax.map(f, (Xs, LV))
        hist = jax.lax.psum(hist.sum(axis=0), axis)
        return hist, maxds, tidx, tval, tcnt

    fn = shard_map(shard_body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P(), P(), P()),
                   out_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
                   check_vma=False)
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _sharded_scan_raw_os_fn(mesh, n_c, nc, blk_fft, buff_samps, max_trig,
                            dec, nfftp, n_tpl, axis, S, calc_hist,
                            uniform_nbin, specds_mode, route,
                            calc_triggers=True):
    """Sharded devicePrep scan for OVERLAP-SAVE banks: each device runs
    the batched device prep (detrend + spectral bandpass + decimation,
    ops/prep.prep_multiplex_batch) on ITS raw-channel shard, then the
    scan route the single-device path would pick ("fold", "blocked", or
    None = per-chunk OS lax.map; _os_fold_route). Histograms merge with
    one psum. This is what lets devicePrep keep the overlap-save fold
    wins on a multi-device mesh instead of regressing to full-length
    spectra banks (round-3 leftover; PERF.md)."""
    from detex_tpu.ops import prep as _prep

    def shard_body(Xc, LV, H, arrs, thresholds, bins):
        X, lens_mux = _prep.prep_multiplex_batch(Xc, LV, H, nfftp, dec, nc)
        # valid DS samples per chunk; padded (LV=0) rows clamp to 0 ==
        # fully masked, matching _pad_batch's zero-length chunk contract
        NV = jnp.maximum((lens_mux - n_tpl) // nc + 1, 0).astype(jnp.int32)
        if route:
            body = (_fold_chunks_blocked_fn if route == "blocked"
                    else _fold_chunks_fn)
            hist, maxds, tidx, tval, tcnt = body(
                X, NV, arrs, thresholds, n_c, nc, blk_fft, buff_samps,
                max_trig, S, calc_hist, uniform_nbin, specds_mode,
                calc_triggers)
        else:
            f = lambda xn: _chunk_fn(xn[0], xn[1], arrs,        # noqa
                                     thresholds, bins, "os", n_c, nc,
                                     blk_fft, buff_samps, max_trig, S,
                                     calc_hist, uniform_nbin,
                                     calc_triggers)
            hist, maxds, tidx, tval, tcnt = jax.lax.map(f, (X, NV))
            hist = hist.sum(axis=0)
        hist = jax.lax.psum(hist, axis)
        return hist, maxds, tidx, tval, tcnt

    fn = shard_map(shard_body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P(), P(), P()),
                   out_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
                   check_vma=False)
    return jax.jit(fn)


def scan_chunks_sharded(mesh, X, bank, thresholds, nc, buff_samps,
                        bins=None, max_trig=64, axis="chunks",
                        valid_lens=None, calc_hist=True,
                        calc_triggers=True):
    """
    Multi-chip scan of chunk batch X [B, Lc]; B is padded up to a multiple
    of the mesh size with fully-masked chunks and the outputs sliced back.

    Returns (hist [S, nbins] merged via psum, maxds [B, S],
    trig_idx [B, S, K], trig_val [B, S, K], trig_count [B, S]).
    """
    if bins is None:
        bins = DEFAULT_BINS
    st = _bank_statics(bank, nc)
    _require_host_array(X, "scan_chunks_sharded")
    X = np.asarray(X, np.float32)
    nv = _valid_lens(bank, nc, X, valid_lens)
    X, nv, B = _pad_batch(mesh.size, X, nv)
    unb = _uniform_nbin(bins)
    # kernel routing decided on the PER-SHARD batch size
    route, mode, arrs, th = _os_fold_route(
        bank, st, int(X.shape[0]) // mesh.size, int(X.shape[1]),
        calc_hist, unb, thresholds)
    _note_route(route_name(route, mode), sharded=True)
    if route:
        fn = _sharded_scan_fold_fn(mesh, st["n_c"], int(nc), st["nfft"],
                                   int(buff_samps), int(max_trig), axis,
                                   st["S"], bool(calc_hist), unb,
                                   specds_mode=mode, route=route,
                                   calc_triggers=bool(calc_triggers))
        hist, maxds, tidx, tval, tcnt = fn(
            jnp.asarray(X), jnp.asarray(nv), arrs, th)
        return hist, maxds[:B], tidx[:B], tval[:B], tcnt[:B]
    fn = _sharded_scan_fn(mesh, st["demux"], st["n_c"], int(nc), st["nfft"],
                          int(buff_samps), int(max_trig), axis, st["S"],
                          bool(calc_hist), unb, bool(calc_triggers))
    hist, maxds, tidx, tval, tcnt = fn(
        jnp.asarray(X), jnp.asarray(nv), arrs, th,
        jnp.asarray(bins, jnp.float32))
    return hist, maxds[:B], tidx[:B], tval[:B], tcnt[:B]


def scan_chunks_raw_sharded(mesh, Xc, lens, H, bank, thresholds, nc,
                            buff_samps, bins=None, max_trig=64, dec=1,
                            axis="chunks", calc_hist=True,
                            calc_triggers=True):
    """Multi-chip raw-channel scan (fused devicePrep); B padded to a
    multiple of the mesh size like scan_chunks_sharded. Overlap-save
    banks run prep + the fold-batch / fused spec->DS scan inside the
    shard body (one program per device, no host round trip)."""
    if bins is None:
        bins = DEFAULT_BINS
    if not bank.get("demux"):
        raise ValueError("scan_chunks_raw_sharded requires a demuxed bank")
    _require_host_array(Xc, "scan_chunks_raw_sharded")
    Xc = np.asarray(Xc, np.float32)
    lens = np.asarray(lens, np.int32)
    Xc, lens, B = _pad_batch(mesh.size, Xc, lens)
    if bank.get("os"):
        st = _bank_statics(bank, nc)
        nfftp = (int(H.shape[0]) - 1) * 2 // int(dec)
        Bs = Xc.shape[0] // mesh.size
        L_mux = (int(Xc.shape[2]) // int(dec)) * int(nc)
        unb = _uniform_nbin(bins)
        # routing decided on the PER-SHARD batch (shape probe only)
        route, mode, arrs, th = _os_fold_route(
            bank, st, Bs, L_mux, calc_hist, unb, thresholds)
        _note_route(route_name(route, mode), sharded=True, device_prep=True)
        fn = _sharded_scan_raw_os_fn(
            mesh, st["n_c"], int(nc), st["nfft"], int(buff_samps),
            int(max_trig), int(dec), nfftp, int(bank["n"]), axis, st["S"],
            bool(calc_hist), unb, mode, route, bool(calc_triggers))
        hist, maxds, tidx, tval, tcnt = fn(
            jnp.asarray(Xc), jnp.asarray(lens), H, arrs, th,
            jnp.asarray(bins, jnp.float32))
        return hist, maxds[:B], tidx[:B], tval[:B], tcnt[:B]
    _note_route("raw-demux", sharded=True, device_prep=True)
    fn = _sharded_scan_raw_fn(mesh, bank["n_c"], int(nc), bank["nfft2"],
                              int(buff_samps), int(max_trig), int(dec), axis,
                              bool(calc_hist), _uniform_nbin(bins),
                              bool(calc_triggers))
    hist, maxds, tidx, tval, tcnt = fn(
        jnp.asarray(Xc), jnp.asarray(lens), H,
        (bank["Ufd2"], bank["sum_u"], bank["d_mask"]),
        jnp.asarray(thresholds, jnp.float32), jnp.asarray(bins, jnp.float32))
    return hist, maxds[:B], tidx[:B], tval[:B], tcnt[:B]
