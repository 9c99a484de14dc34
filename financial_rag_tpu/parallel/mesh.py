"""Device-mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.5-2.6); this is
new design: one `jax.sharding.Mesh` drives both serving (corpus sharded over
the 'shard' axis, queries replicated) and training (batch over 'data',
tensor parallelism over 'model').
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Sequence[Tuple[str, int]], devices: Optional[list] = None) -> Mesh:
    """axes: ordered (name, size) pairs; sizes must multiply to n_devices.
    Use size -1 for one wildcard axis that absorbs the remainder."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        assert n % known == 0, f"{n} devices not divisible by {known}"
        sizes = [n // known if s == -1 else s for s in sizes]
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(name for name, _ in axes))


def search_mesh(n_shards: int = 0, devices: Optional[list] = None) -> Mesh:
    """1-D corpus-sharding mesh over all (or n_shards) devices."""
    devices = devices if devices is not None else jax.devices()
    if n_shards:
        devices = devices[:n_shards]
    return make_mesh([("shard", len(devices))], devices)


def train_mesh(tp: int = 1, devices: Optional[list] = None) -> Mesh:
    """(data, model) mesh: tensor-parallel size tp, data-parallel remainder."""
    return make_mesh([("data", -1), ("model", tp)], devices)
