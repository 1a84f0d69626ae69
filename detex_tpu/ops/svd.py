"""
On-device SVD and fractional-energy-capture helpers
(reference subspace.py:786-1013).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def svd_basis(aligned, normalize=False):
    """
    SVD of aligned, demeaned event waveforms.

    Parameters
    ----------
    aligned : [N_events, n] array (each row one aligned waveform; rows are
        demeaned by the caller, reference _trimGroups subspace.py:921-943).
    normalize : bool — normalize each row to unit energy first
        (reference SVD() normalize flag).

    Returns
    -------
    (U [n, k], s [k]) with k = min(N, n): left singular vectors (columns)
    and singular values, descending. Matches scipy.linalg.svd(tparr,
    full_matrices=False) at subspace.py:890.
    """
    arr = jnp.asarray(aligned, jnp.float32)
    if normalize:
        arr = arr / jnp.linalg.norm(arr, axis=1, keepdims=True)
    tparr = arr.T  # [n, N]
    U, s, _ = jnp.linalg.svd(tparr, full_matrices=False)
    return np.asarray(U, np.float64), np.asarray(s, np.float64)


def frac_energy(U, aligned):
    """
    Cumulative fractional energy captured per dimension of representation
    for each training waveform (reference _getFracEnergy
    subspace.py:968-997).

    Parameters
    ----------
    U : [n, k] left singular vectors
    aligned : [N, n] aligned (trimmed, NOT demeaned — the reference passes
        the raw aligned waveform here) training waveforms

    Returns
    -------
    cum : [N, k+1] cumulative energy capture (leading 0 for dim 0)
    """
    U = jnp.asarray(U, jnp.float32)
    A = jnp.asarray(aligned, jnp.float32)
    proj = (U.T @ A.T).T                                  # [N, k]
    norm = jnp.linalg.norm(A, axis=1, keepdims=True)
    rep = (proj / norm) ** 2
    cum = jnp.concatenate([jnp.zeros((A.shape[0], 1)),
                           jnp.cumsum(rep, axis=1)], axis=1)
    return np.asarray(cum, np.float64)
