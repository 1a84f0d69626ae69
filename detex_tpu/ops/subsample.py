"""
Cosine-fit sub-sample lag interpolation (Céspedes et al. 1995), the device
analog of reference construct.py:397-422 (_subSamp).
"""
from __future__ import annotations

import jax.numpy as jnp


def subsample_shift(ceval, ind):
    """
    Sub-sample shift of the peak at integer index ``ind`` of correlation
    curve ``ceval``. Returns tau in (-0.5, 0.5).

    Deviations from the reference (documented): where the reference would
    *warn and return the integer index* when |tau| > .5 (a bug — see
    construct.py:418-421), we return 0.0; where the arccos argument falls
    outside [-1, 1] (flat/degenerate peak) we also return 0.0.
    """
    ceval = jnp.asarray(ceval)
    L = ceval.shape[0]
    ind = jnp.asarray(ind)
    interior = (ind > 0) & (ind < L - 1)
    i = jnp.clip(ind, 1, L - 2)
    cb4 = ceval[i - 1]
    caf = ceval[i + 1]
    cn = ceval[i]
    arg = (cb4 + caf) / (2.0 * cn)
    ok = interior & (jnp.abs(arg) < 1.0) & (cn != 0.0)
    argc = jnp.clip(arg, -1.0 + 1e-7, 1.0 - 1e-7)
    alpha = jnp.arccos(argc)
    alsi = jnp.sin(alpha)
    denom = 2.0 * cn * alsi
    tau = -(jnp.arctan((cb4 - caf) / jnp.where(denom == 0, 1.0, denom))
            / jnp.where(alpha == 0, 1.0, alpha))
    tau = jnp.where(ok & (jnp.abs(tau) <= 0.5), tau, 0.0)
    return tau
