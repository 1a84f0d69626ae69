"""Trigger extraction + STA/LTA kernels vs reference-semantics oracles."""
import numpy as np
import pandas as pd

from detex_tpu.ops import stalta, triggers


def trigger_oracle(C, threshold, sr, buff=20, dpv=0):
    """Python transliteration of the reference's argmax-while loop
    (detect.py:410-444, 545-557) used as the behavioral oracle."""
    C = np.asarray(C, dtype=np.float64).copy()
    out = []
    while C.max() >= threshold and len(out) < 4000:
        index = int(C.argmax())
        out.append(index)
        bs = buff * sr
        if index < bs + 1:
            C[0:int(index + bs)] = dpv
        elif index > len(C) - bs:
            C[int(index - bs):] = dpv
        else:
            C[int(index - bs):int(bs + index)] = dpv
    return out


def test_triggers_match_oracle(rng):
    sr = 25
    C = np.abs(rng.standard_normal(20000)) * 0.05
    for pos, amp in [(500, .9), (5000, .7), (5100, .95), (19990, .8)]:
        C[pos] = amp
    idx, count = triggers.extract_triggers(C, 0.5, int(20 * sr))
    got = np.asarray(idx)[: int(count)].tolist()
    want = trigger_oracle(C, 0.5, sr)
    assert got == want


def test_triggers_none_found(rng):
    C = np.abs(rng.standard_normal(1000)) * 0.01
    idx, count = triggers.extract_triggers(C, 0.5, 100)
    assert int(count) == 0


def test_triggers_suppression_window(rng):
    C = np.zeros(10000)
    C[4000] = 1.0
    C[4100] = 0.9   # inside suppression window (buff=500)
    C[6000] = 0.8   # outside
    idx, count = triggers.extract_triggers(C, 0.5, 500)
    got = sorted(np.asarray(idx)[: int(count)].tolist())
    assert got == [4000, 6000]


def test_triggers_topk_matches_while(rng):
    C = np.abs(rng.standard_normal(20000)) * 0.05
    for pos, amp in [(500, .9), (5000, .7), (5100, .95), (19990, .8)]:
        C[pos] = amp
    i1, c1 = triggers.extract_triggers(C, 0.5, 500, max_triggers=16)
    i2, c2 = triggers.extract_triggers_topk(C, 0.5, 500, max_triggers=16)
    assert int(c1) == int(c2)
    assert np.asarray(i1)[:int(c1)].tolist() == \
        np.asarray(i2)[:int(c2)].tolist()


def _planted(rng, L, npk, tails=0):
    C = np.abs(rng.standard_normal(L)).astype(np.float32) * 0.05
    pos = rng.choice(L - tails, size=npk, replace=False)
    C[pos] = rng.uniform(0.4, 1.0, size=npk)
    if tails:
        C[-tails:] = -np.inf  # masked pad windows, as the scan path emits
    return C


def test_triggers_pyramid_matches_topk(rng):
    for L, buff, tails in [(20000, 500, 0), (20000, 500, 3000),
                           (8191, 300, 100), (4096, 4096, 0),
                           (50001, 37, 0), (6000, 1, 0)]:
        C = _planted(rng, L, 12, tails)
        i1, c1 = triggers.extract_triggers_topk(C, 0.5, buff,
                                                max_triggers=16)
        i2, c2 = triggers.extract_triggers_pyramid(C, 0.5, buff,
                                                   max_triggers=16)
        assert int(c1) == int(c2), (L, buff, tails)
        assert np.asarray(i1).tolist() == np.asarray(i2).tolist(), \
            (L, buff, tails)


def test_triggers_pyramid_ties_and_quantized(rng):
    # heavy ties: quantized values exercise first-occurrence argmax parity
    C = np.round(np.abs(rng.standard_normal(30000)) * 4) / 4
    C = C.astype(np.float32)
    i1, c1 = triggers.extract_triggers_topk(C, 0.75, 200, max_triggers=32)
    i2, c2 = triggers.extract_triggers_pyramid(C, 0.75, 200,
                                               max_triggers=32)
    assert int(c1) == int(c2)
    assert np.asarray(i1).tolist() == np.asarray(i2).tolist()


def test_triggers_pyramid_dense_overflow(rng):
    # more peaks than capacity; suppression windows overlap heavily
    C = np.zeros(40000, np.float32)
    C[::97] = np.linspace(0.5, 1.0, len(C[::97])).astype(np.float32)
    for buff in (50, 1000, 39999):
        i1, c1 = triggers.extract_triggers_topk(C, 0.5, buff,
                                                max_triggers=8)
        i2, c2 = triggers.extract_triggers_pyramid(C, 0.5, buff,
                                                   max_triggers=8)
        assert int(c1) == int(c2)
        assert np.asarray(i1).tolist() == np.asarray(i2).tolist()


def test_triggers_pyramid_vmap(rng):
    import jax
    C = np.stack([_planted(rng, 16384, 8) for _ in range(5)])
    th = np.full(5, 0.5, np.float32)
    f = jax.vmap(lambda v, t: triggers.extract_triggers_pyramid(
        v, t, 400, max_triggers=8))
    g = jax.vmap(lambda v, t: triggers.extract_triggers_topk(
        v, t, 400, max_triggers=8))
    i1, c1 = f(C, th)
    i2, c2 = g(C, th)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def stalta_oracle(C, LTA, STA):
    """Reference _getStaLtaArray with pandas (detect.py:501-524)."""
    C = np.asarray(C, dtype=np.float64)
    if STA == 0:
        STArr = np.abs(C)
    else:
        STArr = pd.Series(np.abs(C)).rolling(int(STA),
                                             center=True).mean().values
        STArr = _replace(STArr)
    LTArr = pd.Series(np.abs(C)).rolling(int(LTA),
                                         center=True).mean().values
    LTArr = _replace(LTArr)
    return STArr / LTArr


def _replace(arg):
    arg = np.array(arg, dtype=np.float64)
    ind = np.where(~np.isnan(arg))[0]
    first, last = ind[0], ind[-1]
    arg[:first] = arg[first + 1]
    arg[last + 1:] = arg[last]
    return arg


def test_ds_stalta_matches_oracle(rng):
    C = np.abs(rng.standard_normal(5000)) * .1
    C[2500:2520] += 2.0
    got = np.asarray(stalta.ds_stalta(C, 125, 10))
    want = stalta_oracle(C, 125, 10)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ds_stalta_zero_sta(rng):
    C = np.abs(rng.standard_normal(1000))
    got = np.asarray(stalta.ds_stalta(C, 100, 0))
    want = stalta_oracle(C, 100, 0)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5)


def test_classic_sta_lta_detects_transient(rng):
    x = rng.standard_normal(5000) * 0.1
    x[3000:3200] += np.sin(np.arange(200)) * 5
    cft = stalta.classic_sta_lta(x, 20, 500)
    assert cft[:500].max() == 0
    assert cft.argmax() >= 3000
    assert cft.max() > 5


def test_triggers_pyramid_pm_matches_topk(rng):
    """Precomputed-pyramid extractor == flat topk on the same ceval."""
    import jax.numpy as jnp

    from detex_tpu.ops import triggers as trg

    block = 128
    for L, buff, tails in [(128 * 160, 500, 0), (128 * 160, 500, 3000),
                           (128 * 40, 37, 700), (128 * 8, 4096, 0)]:
        C = _planted(rng, L, 10, tails)
        pyr = np.asarray(jnp.asarray(C).reshape(-1, block).max(axis=-1))
        i1, c1 = trg.extract_triggers_topk(C, 0.5, buff, max_triggers=16)
        i2, c2 = trg.extract_triggers_pyramid_pm(C, pyr, 0.5, buff,
                                                 max_triggers=16)
        assert int(c1) == int(c2), (L, buff, tails)
        assert np.asarray(i1).tolist() == np.asarray(i2).tolist(), \
            (L, buff, tails)
