"""
Device-mesh helpers.

The reference has no distributed runtime (SURVEY.md section 2 checklist);
detex_tpu's scale-out layer shards the embarrassingly-parallel
(station x detector x chunk) scan grid over a 1-D JAX mesh, with psum only
for the global DS histograms and gathers for trigger lists.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="chunks"):
    """A 1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_chunks(mesh, axis="chunks"):
    """NamedSharding that splits the leading (chunk) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())
