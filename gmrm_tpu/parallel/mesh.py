"""Device mesh and marker-axis sharding.

The reference's only distributed axis is markers over MPI ranks with a
static block partition, remainder to low ranks (``src/bayes.cpp:903-925``).
Here that maps to a 1-D ``jax.sharding.Mesh`` named "m"; each device's
shard is padded to a common per-device length (the reference's Mm idle-step
scheme) so the SPMD program is uniform.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

MARKER_AXIS = "m"


def make_marker_mesh(n_devices: int = 0, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (MARKER_AXIS,))


def marker_blocks(m_total: int, n_shards: int) -> List[Tuple[int, int]]:
    """(start, length) per shard: block partition, remainder to low shards
    (reference set_block_of_markers, bayes.cpp:903-925)."""
    size = m_total // n_shards
    modu = m_total % n_shards
    out = []
    cum = 0
    for i in range(n_shards):
        ln = size + 1 if i < modu else size
        out.append((cum, ln))
        cum += ln
    assert cum == m_total
    return out


def shard_markers(arr: np.ndarray, n_shards: int, m_pad_shard: int, fill):
    """Split a (M_total, ...) host array into (n_shards, m_pad_shard, ...)
    with per-shard padding."""
    blocks = marker_blocks(arr.shape[0], n_shards)
    out = np.full((n_shards, m_pad_shard) + arr.shape[1:], fill,
                  dtype=arr.dtype)
    for i, (s, ln) in enumerate(blocks):
        out[i, :ln] = arr[s:s + ln]
    return out
