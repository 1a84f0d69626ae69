"""
Trigger extraction: iterative argmax-above-threshold with suppression.

The reference mutates the DS array in a Python while loop
(_CreateCoeffArray detect.py:390-445 + _downPlayArrayAroundMax :545-557).
Here the same ordering/suppression semantics run inside one
``lax.while_loop`` on device, emitting a fixed-size padded trigger list.
Suppression exactly mirrors the reference's three-case zeroing:

    index <  buff*sr + 1        -> zero [0, index + buff*sr)
    index >  len - buff*sr      -> zero [index - buff*sr, end)
    otherwise                   -> zero [index - buff*sr, index + buff*sr)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MAX_TRIGGERS = 512


def extract_triggers_np(ceval, threshold, buff_samps,
                        max_triggers=DEFAULT_MAX_TRIGGERS):
    """
    Host float64 twin of extract_triggers, used by the dtype='double'
    exact path: identical argmax/suppression semantics without the device
    f32 cast. Returns int64 indices in emission order.
    """
    c = np.array(ceval, dtype=np.float64, copy=True)
    L = len(c)
    out = []
    while len(out) < max_triggers and L and np.max(c) >= threshold:
        i = int(np.argmax(c))
        out.append(i)
        if i < buff_samps + 1:
            lo, hi = 0, i + buff_samps
        elif i > L - buff_samps:
            lo, hi = i - buff_samps, L
        else:
            lo, hi = i - buff_samps, i + buff_samps
        c[lo:hi] = 0.0
    return np.asarray(out, np.int64)


@partial(jax.jit, static_argnames=("buff_samps", "max_triggers"))
def extract_triggers(ceval, threshold, buff_samps,
                     max_triggers=DEFAULT_MAX_TRIGGERS):
    """
    Parameters
    ----------
    ceval : [L] detection statistic (or its STA/LTA) to trigger on
    threshold : scalar trigger threshold (trigger when value >= threshold)
    buff_samps : int, suppression half-width in samples (buff seconds * sr)
    max_triggers : int, trigger list capacity (reference errors out at 4000
        triggers in one block; capacity plays that role here)

    Returns
    -------
    (indices [max_triggers] int32, count int32): indices of triggers in the
    order the reference would emit them (descending DS with suppression);
    entries >= count are -1.
    """
    L = ceval.shape[0]
    idx_range = jnp.arange(L)

    def cond(state):
        c, out, k = state
        return (jnp.max(c) >= threshold) & (k < max_triggers)

    def body(state):
        c, out, k = state
        i = jnp.argmax(c)
        out = out.at[k].set(i.astype(jnp.int32))
        lo = jnp.where(i < buff_samps + 1, 0, i - buff_samps)
        hi = jnp.where(i < buff_samps + 1, i + buff_samps,
                       jnp.where(i > L - buff_samps, L, i + buff_samps))
        c = jnp.where((idx_range >= lo) & (idx_range < hi), 0.0, c)
        return c, out, k + 1

    # derive initial carries from the input so they inherit any varying
    # manual axes when this runs inside shard_map
    zero = (ceval[0] * 0).astype(jnp.int32)
    out0 = jnp.full((max_triggers,), -1, dtype=jnp.int32) + zero
    _, out, count = jax.lax.while_loop(cond, body,
                                       (ceval.astype(jnp.float32), out0,
                                        zero))
    return out, count


@partial(jax.jit, static_argnames=("buff_samps", "max_triggers"))
def extract_triggers_topk(ceval, threshold, buff_samps, max_triggers=64):
    """
    Fixed-iteration variant of extract_triggers: a ``lax.scan`` of exactly
    ``max_triggers`` argmax+suppress steps (masked once the threshold is no
    longer met). Identical outputs for up to ``max_triggers`` triggers, but
    static-shape control flow that compiles and vmaps far better — used on
    the batched/sharded scan path.
    """
    L = ceval.shape[0]
    idx_range = jnp.arange(L)

    def body(c, _):
        i = jnp.argmax(c)
        valid = c[i] >= threshold
        lo = jnp.where(i < buff_samps + 1, 0, i - buff_samps)
        hi = jnp.where(i < buff_samps + 1, i + buff_samps,
                       jnp.where(i > L - buff_samps, L, i + buff_samps))
        suppress = valid & (idx_range >= lo) & (idx_range < hi)
        c = jnp.where(suppress, 0.0, c)
        return c, jnp.where(valid, i.astype(jnp.int32), jnp.int32(-1))

    _, out = jax.lax.scan(body, ceval.astype(jnp.float32), None,
                          length=max_triggers)
    count = jnp.sum((out >= 0).astype(jnp.int32))
    return out, count
